"""Temporal joins & sessionization (SURVEY §2 C7, C8, J9).

Not in the reference (batch-only ML library); required by the north-star
events analytics. All formulations are pure window/join compositions — no
UDFs, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_join_range",
    oracle="""
    SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    GROUP BY a.user_id
    """,
    tags=("C7",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — range (theta) join: view→purchase pairs within 10 minutes.

    Equality on user_id makes this an equi-join with a range residual, so
    Catalyst runs sort-merge on user_id and post-filters the time band — it
    never degenerates to a cartesian product. At 100 TB the additional
    defense is bucketing both sides by time bucket and joining on
    (user_id, bucket±1), which bounds each task's pair candidates.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTE")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_asof",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_ts
      FROM events
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_click_ts
    FROM flagged
    WHERE event_type = 'purchase'
    """,
    tags=("C8",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — as-of join: latest prior click before each purchase, per user.

    Spark has no native as-of join; the scalable formulation is a union +
    running ``MAX(CASE WHEN ...)`` window — one shuffle on user_id, no
    self-join, no per-row probe. (A merge-join as-of would need a range
    partitioner; the window form gets the same single-shuffle plan for
    free.)
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return flagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


_SESSION_ORACLE = """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """


@register("q_stream_session", oracle=_SESSION_ORACLE, tags=("J9",))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — gap-based sessionization (30-min inactivity), batch form.

    lag → new-session flag → running sum = session id (E3+E5 composition).
    The streaming twin is ``F.session_window`` (streaming/windows.py); this
    batch form is the oracle-checkable semantics reference.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )

