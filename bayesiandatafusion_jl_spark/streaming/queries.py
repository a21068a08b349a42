"""Batch-form windowed aggregations (J7, J8) with SQL oracles.

Structured Streaming's time-window semantics are deterministic functions of
the event time, so the batch formulation is the correctness reference for
the streaming pipelines in ``streaming.pipelines`` (which reuse the same
``F.window`` calls on a ``readStream`` source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dsum, sql_dsum
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_stream_windows",
    oracle=f"""
    WITH offs AS (SELECT UNNEST([0, 1, 2, 3]) AS o),
    slid AS (
      SELECT (epoch_us(ts) // 1000000 // 21600 - o) * 21600 AS start_s,
             event_type, value
      FROM events CROSS JOIN offs
    )
    SELECT 'tumbling' AS op, CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
           event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP), event_type
    UNION ALL
    SELECT 'sliding' AS op, make_timestamp(start_s * 1000000) AS win_start,
           event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM slid
    GROUP BY make_timestamp(start_s * 1000000), event_type
    """,
    tags=("J7", "J8"),
)
def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7+J8 consolidated (the ``q_set_ops`` pattern): tumbling 1-day and
    sliding (1-day length, 6-h slide) windowed aggregates over events in
    one op-tagged result. Both legs use the identical ``F.window``
    expression the streaming pipelines run on ``readStream``; window
    starts are epoch-aligned, so the oracle reproduces them with
    date_trunc (tumbling) and the div-offset arithmetic (sliding: every
    event lands in exactly 4 windows, starts = (ts_s div 21600 − k)·21600,
    k ∈ 0..3). Each leg is one partial-agg shuffle on (window, type) —
    keys shrink with the window grain, not the data; the UNION ALL is
    shuffle-free. The single-window forms stay as demoted
    ``q_stream_tumbling`` / ``q_stream_sliding``."""
    ev = load_table(spark, sf_dir, "events")

    def leg(op: str, *window_args: str) -> DataFrame:
        return (
            ev.groupBy(F.window("ts", *window_args).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
            .select(
                F.lit(op).alias("op"),
                F.col("w.start").alias("win_start"),
                "event_type",
                "n",
                "sum_value",
            )
        )

    return leg("tumbling", "1 day").unionByName(leg("sliding", "1 day", "6 hours"))


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type
    """,
    tags=("J7",),
    demoted=True,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — tumbling 1-day window per event_type. Uses ``F.window`` (the
    same expression the streaming pipeline uses); window starts for 1-day
    tumbling are epoch-aligned = date_trunc('day')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register("q_stream_ewma", oracle=None, tags=("K", "stateful"), demoted=True)
def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.K — per-user recursive EWMA: the batch form of
    ``streaming.pipelines.ewma_stream``, the ``applyInPandasWithState``
    custom stateful operator. Rows-only by design: an order-dependent
    recursive fold has no tractable SQL oracle (a per-group recursive CTE
    whose closed form is numerically explosive); batch/stream parity —
    including cross-micro-batch state carry and timeout eviction — is
    pytest-gated (tests/test_streaming.py)."""
    from bayesiandatafusion_jl_spark.streaming.pipelines import ewma_scores

    ev = load_table(spark, sf_dir, "events")
    return ewma_scores(ev, alpha=0.2)


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH offs AS (SELECT UNNEST([0, 1, 2, 3]) AS o),
    windows AS (
      SELECT (epoch_us(ts) // 1000000 // 21600 - o) * 21600 AS start_s,
             event_type, value
      FROM events CROSS JOIN offs
    )
    SELECT make_timestamp(start_s * 1000000) AS win_start, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM windows
    GROUP BY make_timestamp(start_s * 1000000), event_type
    """,
    tags=("J8",),
    demoted=True,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — sliding window (1 day length, 6 h slide): every event lands in
    exactly 4 windows. Oracle replicates Spark's epoch-aligned window-start
    arithmetic: starts = (ts_s div 21600 − k)·21600, k ∈ 0..3."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_stream_attribution",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id, c.ts AS click_ts, p.ts AS purchase_ts,
           p.value AS amount
    FROM events c JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
    """,
    tags=("J7", "stream-stream"),
    demoted=True,
)
def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of ``streaming.pipelines.attribution_join`` — the
    stream-stream click→purchase range join, oracle-checked here; the
    streaming semantics (cross-micro-batch matching, watermark-bounded
    state) are pytest-gated in tests/test_streaming.py."""
    from bayesiandatafusion_jl_spark.streaming.pipelines import attribution_join

    ev = load_table(spark, sf_dir, "events")
    return attribution_join(ev)
