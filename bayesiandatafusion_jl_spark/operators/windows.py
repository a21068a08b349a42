"""Window functions (SURVEY §2.E).

E1/E2 are reference capabilities (top-k prediction readout, AUC [api]);
E3–E5 are north-star event analytics. One shuffle per distinct partitioning
— queries below each use a single partitioning so the window adds exactly
one exchange.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dsum, sql_dsum
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import shuffle_partitions


@register(
    "q_win_rank_topk_per_group",
    oracle="""
    SELECT 'topk_group' AS op, c_custkey AS k1, o_orderkey AS k2,
           o_totalprice AS dv1, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    UNION ALL
    SELECT 'global_topk', l_orderkey, CAST(l_linenumber AS BIGINT),
           l_extendedprice, CAST(NULL AS BIGINT)
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 100
    )
    """,
    tags=("E1", "F1", "F2"),
)
def q_win_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+F1+F2 consolidated (r12, the ``q_filter_suite`` pattern),
    op-tagged:

    - ``topk_group``: top-k per group (top-k predictions per entity
      readout [api]) — row_number with an explicit unique tiebreak
      (o_orderkey) so the k rows selected are deterministic across
      engines; one exchange (the window partitioning).
    - ``global_topk``: global multi-column mixed-direction sort + limit
      over lineitem — compiles to TakeOrderedAndProject (per-partition
      local top-k, k·P driver merge, NO global sort materializes), with
      full tiebreak keys for deterministic row selection. Wide single
      forms (q_sort_limit, q_sort_multicol) stay demoted with identical
      local parity gates."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    group_leg = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("topk_group").alias("op"),
            F.col("o_custkey").alias("k1"),
            F.col("o_orderkey").alias("k2"),
            F.col("o_totalprice").alias("dv1"),
            F.col("rn"),
        )
    )
    global_leg = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(100)
        .select(
            F.lit("global_topk").alias("op"),
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").cast("bigint").alias("k2"),
            F.col("l_extendedprice").alias("dv1"),
            F.lit(None).cast("int").alias("rn"),
        )
    )
    return group_leg.unionByName(global_leg)


def auc_components(scored: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Tie-averaged Mann–Whitney AUC with NO single-partition window —
    the one scalable AUC used everywhere (q_win_auc, q_ml_auc, the BPMF
    trainer's class_cut readout).

    Input: ``scored (score: double, label: 0/1)``. Output: one row
    ``(n_pos, n_neg, auc)``.

    AUC = Σ_s n₊(s)·(N₋below(s) + ½·n₋(s)) / (n₊·n₋): every positive beats
    the negatives strictly below its score and half the negatives tied
    with it. Execution shape — deliberately ONE Spark job (the r4 form
    paid three sequential job launches: approxQuantile, a totals collect,
    then the final agg — pure fixed overhead at any scale):

    1. groupBy(score) → (n_pos, n_neg) per distinct score — one shuffle,
       map-side combined; this is the ONLY pass over the full input.
    2. min/max of the distinct scores (broadcast 1-row cross-join, not a
       separate driver action) split the score DOMAIN into equal range
       buckets; floor() of a monotone map ⇒ same score ⇒ same bucket, so
       ties never straddle buckets and the result stays EXACT — bucketing
       only affects load balance (quantile split balanced better under
       extreme score skew, but cost a full extra pass; ties are already
       collapsed per-score here so the skew exposure is bounded by
       distinct-value clustering, not row counts).
    3. per-bucket Σn_neg → exclusive running offset via a window over the
       ≤n_buckets bucket-total rows (bounded, NOT data-scaled — the only
       single-partition window, ≤1024 rows by construction; n_buckets
       defaults to the session's shuffle partitions so the per-bucket
       parallelism tracks the cluster instead of a pinned 32), broadcast
       back onto the buckets; per-bucket exclusive running Σn_neg windows
       stay partitioned BY BUCKET — parallel.
    4. one scalar aggregate; integer-and-half arithmetic < 2^53 keeps the
       sum exact across engines. The 1-row result is materialized eagerly
       so the cache can be released before returning (no persist leak).
    """
    # default bucket count follows the session's shuffle parallelism (the
    # per-bucket windows in step 3 are the parallel part, so parallelism
    # caps at n_buckets — a pinned 32 throttled large clusters), bounded
    # at 1024 to keep the step-3 offset window's single partition tiny.
    # Bucketing NEVER affects the exact result, only load balance.
    if n_buckets is None:
        parts = shuffle_partitions(scored.sparkSession)
        n_buckets = min(1024, max(1, parts))
    # NULL scores are unrankable — exclude them DELIBERATELY (and from the
    # n_pos/n_neg denominators) rather than letting a NULL bucket silently
    # drop them from some joins but not others
    g = scored.filter(F.col("score").isNotNull()).groupBy("score").agg(
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    ).persist()
    mm = g.agg(F.min("score").alias("__lo"), F.max("score").alias("__hi"))
    span = F.col("__hi") - F.col("__lo")
    bucket = F.when(
        span > 0,
        F.least(
            F.floor((F.col("score") - F.col("__lo")) / span * n_buckets),
            F.lit(n_buckets - 1),
        ),
    ).otherwise(F.lit(0))
    g2 = g.crossJoin(F.broadcast(mm)).withColumn("bucket", bucket)
    # exclusive prefix over the ≤n_buckets totals — bounded single-partition
    # window (≤1024 rows), never data-scaled
    wb = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = (
        g2.groupBy("bucket")
        .agg(F.sum("n_neg").alias("__t"))
        .select("bucket", F.coalesce(F.sum("__t").over(wb), F.lit(0)).alias("__off"))
    )
    w = W.partitionBy("bucket").orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    cum = g2.join(F.broadcast(offs), "bucket").select(
        "n_pos",
        "n_neg",
        (F.col("__off") + F.coalesce(F.sum("n_neg").over(w), F.lit(0))).alias(
            "n_neg_below"
        ),
    )
    out = cum.agg(
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.round(
            F.sum(F.col("n_pos").cast("double") * (F.col("n_neg_below") + 0.5 * F.col("n_neg")))
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
    )
    rows = out.collect()
    g.unpersist()
    return scored.sparkSession.createDataFrame(rows, out.schema)


@register(
    "q_win_auc",
    oracle="""
    WITH g AS (
      SELECT value AS score,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS n_neg
      FROM events
      GROUP BY value
    ),
    cum AS (
      SELECT n_pos, n_neg,
             COALESCE(SUM(n_neg) OVER (
               ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_neg_below
      FROM g
    )
    SELECT ROUND(
        SUM(CAST(n_pos AS DOUBLE) * (n_neg_below + 0.5 * n_neg))
        / (SUM(n_pos) * SUM(n_neg)), 6) AS auc
    FROM cum
    """,
    tags=("E2", "I8", "scale"),
)
def q_win_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/I8 — tie-averaged Mann–Whitney AUC (macau reports AUC when
    ``class_cut`` is set [api] [upstream:src/macau.jl — UNVERIFIED]) with
    NO global single-partition window — the scalable ``auc_components``
    formulation IS the default (the naive rank()-over-global-window form
    was retired in r2)."""
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    return auc_components(scored).select("auc")


@register(
    "q_win_suite",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {sql_dsum('o_totalprice')} AS day_total,
             COUNT(*) AS n
      FROM orders
      GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT 'lag_lead' AS op,
           user_id AS k1, event_id AS k2,
           CAST(date_diff('microsecond',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS DOUBLE) AS dval,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS sval
    FROM events
    UNION ALL
    SELECT 'moving_avg7', n, CAST(NULL AS BIGINT),
           CAST(SUM(CAST(day_total AS DECIMAL(38,6))) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
           CAST(day AS VARCHAR)
    FROM daily
    UNION ALL
    SELECT 'cumsum', o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE),
           CAST(NULL AS VARCHAR)
    FROM orders
    """,
    tags=("E3", "E4", "E5"),
)
def q_win_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+E4+E5 consolidated (the ``q_set_ops`` pattern) into the common
    long schema ``(op, k1, k2, dval, sval)``:

    - ``lag_lead``: per-user inter-event gap (µs, exact in double — gaps
      are far below 2^53) + next event type;
    - ``moving_avg7``: 7-row moving average of daily revenue (pre-agg to
      days shrinks the window input ~10³; exact-decimal sum / count);
    - ``cumsum``: per-customer running spend (decimal prefix sums —
      exact and order-stable).

    Each leg keeps its own single window shuffle (keys: user, global-day,
    customer); the UNION ALL is shuffle-free. Wide single forms stay
    demoted with identical local parity gates."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    null_b = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_leg = ev.select(
        F.lit("lag_lead").alias("op"),
        F.col("user_id").alias("k1"),
        F.col("event_id").alias("k2"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(wl).cast("timestamp"))
        )
        .cast("double")
        .alias("dval"),
        F.lead("event_type").over(wl).alias("sval"),
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        dsum("o_totalprice").alias("day_total"), F.count(F.lit(1)).alias("n")
    )
    wm = W.orderBy("day").rowsBetween(-6, 0)
    mov_leg = daily.select(
        F.lit("moving_avg7").alias("op"),
        F.col("n").alias("k1"),
        null_b.alias("k2"),
        (
            F.sum(F.col("day_total").cast("decimal(38,6)")).over(wm).cast("double")
            / F.count(F.lit(1)).over(wm)
        ).alias("dval"),
        F.col("day").cast("string").alias("sval"),
    )
    wc = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum_leg = o.select(
        F.lit("cumsum").alias("op"),
        F.col("o_custkey").alias("k1"),
        F.col("o_orderkey").alias("k2"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(wc)
        .cast("double")
        .alias("dval"),
        null_s.alias("sval"),
    )
    return lag_leg.unionByName(mov_leg).unionByName(cum_leg)


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           date_diff('microsecond',
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
    FROM events
    """,
    tags=("E3",),
    demoted=True,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — lag/lead: inter-event gaps per user (µs, exact integer)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("next_type", F.lead("event_type").over(w))
        .select(
            "user_id",
            "event_id",
            F.when(
                F.col("prev_ts").isNotNull(),
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp")),
            ).alias("gap_us"),
            "next_type",
        )
    )


@register(
    "q_win_moving_frame",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {sql_dsum('o_totalprice')} AS day_total,
             COUNT(*) AS n
      FROM orders
      GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT day, n, day_total,
           CAST(SUM(CAST(day_total AS DECIMAL(38,6))) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS avg7
    FROM daily
    """,
    tags=("E4",),
    demoted=True,
)
def q_win_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — sliding-frame aggregate: 7-row moving average of daily revenue.
    Aggregate to days first (shrinks the window input by ~10³) then one
    ordered window. The moving average is exact-decimal sum / count —
    engines disagree on sliding-window float summation (DuckDB uses a
    segment tree, Spark recomputes the frame), decimal makes both exact."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        dsum("o_totalprice").alias("day_total"), F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "n",
        "day_total",
        (
            F.sum(F.col("day_total").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg7"),
    )


@register(
    "q_win_cumsum",
    oracle="""
    SELECT o_custkey AS c_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_spend
    FROM orders
    """,
    tags=("E5",),
    demoted=True,
)
def q_win_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — cumulative aggregate (the running posterior-mean accumulation
    shape of Gibbs sample averaging [paper:BPMF]). Decimal accumulation →
    every prefix sum is exact and order-stable."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").alias("cum_spend"),
    )
