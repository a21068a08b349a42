"""SQL-expressible ML pipeline queries (SURVEY §2.I — I1, I7, I8).

The randomized Gibbs kernels are rows-only (ml/bpmf.py registers those);
these three are the *deterministic* ML-pipeline stages, formulated so the
DuckDB oracle can replicate them exactly:

- I1: train/test cell split by index arithmetic (not rand() — the
  reference's ``assignToTest!`` holds out cells [api]; a seeded arithmetic
  split is reproducible AND oracle-checkable).
- I7: prediction + RMSE with a fixed (deterministic) model — the
  bias-baseline predictor; the relational shape (join + dot + global agg)
  is identical to factor-model prediction.
- I8: AUC on binarized scores = E2's rank formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

# split arithmetic: cell → pmod(i1*P1 + i2*P2, 10) < 8 ⇒ train.
# Knuth-style odd multipliers keep the assignment well-mixed; everything is
# exact int64 arithmetic so Spark and DuckDB agree bit-for-bit.
_P1, _P2, _MOD, _TRAIN = 2654435761, 40503, 10, 8


@register(
    "q_ml_traintest_split",
    oracle=f"""
    SELECT event_id, user_id, event_type, value,
           CASE WHEN ((event_id * {_P1} + user_id * {_P2}) % {_MOD} + {_MOD}) % {_MOD}
                     < {_TRAIN}
                THEN 'train' ELSE 'test' END AS split
    FROM events
    """,
    tags=("I1",),
)
def q_ml_traintest_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 — deterministic cell split (``assignToTest!`` [api], made
    arithmetic). int64 multiply wraps identically in both engines; pmod
    normalizes sign."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(
        F.col("event_id") * F.lit(_P1).cast("long")
        + F.col("user_id") * F.lit(_P2).cast("long"),
        F.lit(_MOD).cast("long"),
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.when(bucket < _TRAIN, "train").otherwise("test").alias("split"),
    )


@register(
    "q_ml_predict_rmse",
    oracle=f"""
    WITH split AS (
      SELECT *,
             CASE WHEN ((event_id * {_P1} + user_id * {_P2}) % {_MOD} + {_MOD}) % {_MOD}
                       < {_TRAIN}
                  THEN 'train' ELSE 'test' END AS split
      FROM events
    ),
    gmean AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS g
      FROM split WHERE split = 'train'
    ),
    ubias AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS ub
      FROM split WHERE split = 'train' GROUP BY user_id
    ),
    tbias AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS tb
      FROM split WHERE split = 'train' GROUP BY event_type
    )
    SELECT COUNT(*) AS n_test,
           ROUND(SQRT(CAST(SUM(CAST(
               POW(value - (COALESCE(ub, g) + COALESCE(tb, g) - g), 2)
             AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)), 6) AS rmse
    FROM split s
    LEFT JOIN ubias USING (user_id)
    LEFT JOIN tbias USING (event_type)
    CROSS JOIN gmean
    WHERE s.split = 'test'
    """,
    tags=("I7",),
)
def q_ml_predict_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 — prediction + RMSE over held-out cells with the bias-baseline
    model r̂ = b_user + b_type − µ (the same join→predict→agg pipeline the
    factor model uses [paper:BPMF]; factors swap in via the same joins).

    Bias tables are tiny → broadcast; the test scan joins twice map-side
    and reduces to one scalar — zero wide shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(
        F.col("event_id") * F.lit(_P1).cast("long")
        + F.col("user_id") * F.lit(_P2).cast("long"),
        F.lit(_MOD).cast("long"),
    )
    split = ev.withColumn(
        "split", F.when(bucket < _TRAIN, "train").otherwise("test")
    )
    train = split.filter(F.col("split") == "train")
    dec_mean = lambda c: (  # noqa: E731
        F.sum(F.col(c).cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))
    )
    gmean = train.agg(dec_mean("value").alias("g"))
    ubias = train.groupBy("user_id").agg(dec_mean("value").alias("ub"))
    tbias = train.groupBy("event_type").agg(dec_mean("value").alias("tb"))
    test = (
        split.filter(F.col("split") == "test")
        .join(F.broadcast(ubias), "user_id", "left")
        .join(F.broadcast(tbias), "event_type", "left")
        .crossJoin(F.broadcast(gmean))
    )
    err = F.col("value") - (
        F.coalesce("ub", "g") + F.coalesce("tb", "g") - F.col("g")
    )
    return test.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.sqrt(
                F.sum(F.pow(err, 2).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse"),
    )
