"""SQL-expressible ML pipeline queries (SURVEY §2.I — I1, I7, I8, I11).

The randomized Gibbs kernels are rows-only (ml/bpmf.py registers those);
these are the *deterministic* ML-pipeline stages, formulated so the
DuckDB oracle can replicate them exactly:

- I1: train/test cell split by index arithmetic (not rand() — the
  reference's ``assignToTest!`` holds out cells [api]; a seeded arithmetic
  split is reproducible AND oracle-checkable).
- I7: prediction + RMSE with a fixed (deterministic) model — the
  bias-baseline predictor; the relational shape (join + dot + global agg)
  is identical to factor-model prediction.
- I8: AUC on binarized scores = E2's rank formulation.
- I11: per-cell posterior mean/std readout with fixed pseudo-samples.
- C6/I5: cold-start prediction from side info with a fixed link-matrix row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dot, sql_dot
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
    demoted=True,
    # r12: demoted to free a driver slot for q_text_fuzzy_join — I1 stays
    # driver-hash-covered by q_ml_predict_rmse, which performs the same
    # deterministic-hash train/test split inline before training; this
    # standalone form keeps the identical local parity gate
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
    "q_ml_bpmf_events", oracle=None, tags=("I2", "I3", "I4", "I7", "I11"), demoted=True
)
def q_ml_bpmf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BPMF (the reference's flagship ``macau(rd)`` [api]) on the
    driver's events table: factorize the (user_id × event_type, avg value)
    matrix and return posterior mean + std per held-out cell.

    Rows-only check (randomized Gibbs — no SQL oracle by design, SURVEY
    §2.I). Deliberately small config so the driver's per-query budget holds;
    the property tests in tests/test_ml.py are the statistical gate.
    """
    res = _bpmf_events_train(spark, sf_dir)
    return res.pred_mean.select(
        F.col("u").alias("user_id"),
        F.col("t").alias("type_id"),
        F.col("y").alias("actual"),
        "pred",
        "pred_std",
    )


def _bpmf_events_train(spark: SparkSession, sf_dir: str):
    """Shared trainer for q_ml_bpmf_events and the factorization suite —
    returns the full TrainResult (incl. posterior factor samples) so the
    suite can also measure the multi-sample prediction gain without a
    second training."""
    from bayesiandatafusion_jl_spark.ml.bpmf import bpmf
    from bayesiandatafusion_jl_spark.ml.relation import (
        Relation,
        RelationData,
        split_train_test,
    )

    ev = load_table(spark, sf_dir, "events")
    # type ids must be integral for the COO contract
    types = ev.select("event_type").distinct().orderBy("event_type")
    type_ids = {
        r["event_type"]: i for i, r in enumerate(types.collect())
    }
    mapping = F.create_map(
        *[x for k, v in type_ids.items() for x in (F.lit(k), F.lit(v))]
    )
    cells = (
        ev.select(
            F.col("user_id").alias("u"),
            mapping[F.col("event_type")].cast("long").alias("t"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t")
        .agg(F.avg("value").alias("value"))
    )
    cells = split_train_test(cells, ["u", "t"], test_frac=0.2, seed=11)
    rd = RelationData().add_relation(Relation(cells, ["u", "t"], alpha=10.0))
    # psamples=4: the minimum that supports split-chain R-hat (two halves
    # of >= 2 samples) so the suite's diagnostics row needs no extra sweeps
    return bpmf(
        spark, rd, num_latent=4, burnin=3, psamples=4, seed=7,
        n_blocks=8, track_rmse=False,
    )


@register("q_ml_als_mllib", oracle=None, tags=("I3", "mllib", "als"), demoted=True)
def q_ml_als_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib interop for the factorization family (the north-star's
    "MLlib + custom tensor factorization UDFs" framing): stock
    ``pyspark.ml.recommendation.ALS`` on the SAME (user × event_type)
    matrix and split as q_ml_bpmf_events, returning held-out predictions.

    ALS is the MAP/frequentist counterpart of the Gibbs engine — no
    posterior std and no side-information path, but the same
    join/agg/block scale shape — so a deployment can cross-check the
    custom sampler against the stock optimizer on identical data.
    Rows-only check (iterative optimizer, engine-specific)."""
    from pyspark.ml.recommendation import ALS

    from bayesiandatafusion_jl_spark.ml.relation import split_train_test

    ev = load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct().orderBy("event_type")
    type_ids = {r["event_type"]: i for i, r in enumerate(types.collect())}
    mapping = F.create_map(
        *[x for k, v in type_ids.items() for x in (F.lit(k), F.lit(v))]
    )
    cells = (
        ev.select(
            F.col("user_id").alias("u"),
            mapping[F.col("event_type")].cast("long").alias("t"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t")
        .agg(F.avg("value").alias("value"))
    )
    cells = split_train_test(cells, ["u", "t"], test_frac=0.2, seed=11)
    # MLlib ALS indexes users/items as int32 — ids at or beyond 2^31 would
    # silently wrap on the cast and corrupt the user dimension; fail loudly
    # instead (dense re-indexing is the remedy at that scale)
    umax = cells.agg(F.max("u").alias("m")).collect()[0]["m"]
    if umax is not None and umax >= 2**31:
        raise ValueError(
            f"user_id max {umax} exceeds MLlib ALS's int32 index range; "
            "re-index users densely before fitting"
        )
    train = cells.filter(F.col("split") == "train").select(
        F.col("u").cast("int").alias("user"),
        F.col("t").cast("int").alias("item"),
        F.col("value").cast("float").alias("rating"),
    )
    test = cells.filter(F.col("split") == "test")
    als = ALS(
        rank=8, maxIter=10, regParam=0.1, seed=7,
        userCol="user", itemCol="item", ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(train)
    scored = model.transform(
        test.select(
            F.col("u").cast("int").alias("user"),
            F.col("t").cast("int").alias("item"),
            F.col("value").alias("actual"),
        )
    )
    return scored.select(
        F.col("user").cast("long").alias("user_id"),
        F.col("item").cast("long").alias("type_id"),
        "actual",
        F.col("prediction").cast("double").alias("pred"),
    )


@register("q_ml_probit_events", oracle=None, tags=("I3", "probit"), demoted=True)
def q_ml_probit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-relation training end-to-end (``probit=True`` — the
    reference's class_cut training mode [api]): Albert–Chib
    truncated-normal latents on a PLANTED low-rank binary matrix, so the
    row is a statistical gate, not a coin flip. (The events-derived
    matrix binarizes to near-chance signal — its continuous test AUC is
    only ≈0.55 — so a held-out probit AUC there is seed noise. The r2
    verdict prescribed a planted matrix for exactly this reason.)

    Readout: held-out cells' binarized truth + posterior-mean latent
    score (its ranking IS the probability ranking — Φ is monotone).
    Rows-only check; the suite's probit row asserts AUC finite & > 0.5.
    """
    import numpy as np

    from bayesiandatafusion_jl_spark.ml.bpmf import bpmf
    from bayesiandatafusion_jl_spark.ml.relation import Relation, RelationData

    rng = np.random.default_rng(42)
    n, m, k = 150, 60, 4
    u = rng.standard_normal((n, k))
    v = rng.standard_normal((m, k))
    r = u @ v.T  # latent scores; binarize at 0 → balanced classes
    mask = rng.random((n, m)) < 0.35
    test_mask = rng.random((n, m)) < 0.2
    cells = [
        (i, j, 1.0 if r[i, j] > 0 else 0.0, "test" if test_mask[i, j] else "train")
        for i in range(n)
        for j in range(m)
        if mask[i, j]
    ]
    df = spark.createDataFrame(
        cells, schema="row long, col long, value double, split string"
    )
    rd = RelationData().add_relation(
        Relation(df, ["row", "col"], class_cut=0.5, probit=True)
    )
    res = bpmf(
        spark, rd, num_latent=4, burnin=4, psamples=2, seed=7,
        n_blocks=8, track_rmse=False,
    )
    return res.pred_mean.select(
        F.col("row").alias("row_id"),
        F.col("col").alias("col_id"),
        F.col("y").cast("int").alias("label"),
        F.col("pred").alias("score"),
        "pred_std",
    )


_CUT = 35.0  # class_cut near the events.value median → balanced classes


@register(
    "q_ml_auc",
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
    ),
    scored AS (
      SELECT CASE WHEN s.value > {_CUT} THEN 1 ELSE 0 END AS label,
             COALESCE(ub, g) + COALESCE(tb, g) - g AS score
      FROM split s
      LEFT JOIN ubias USING (user_id)
      LEFT JOIN tbias USING (event_type)
      CROSS JOIN gmean
      WHERE s.split = 'test'
    ),
    ranked AS (
      SELECT label,
             RANK() OVER (ORDER BY score)
               + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS avg_rank
      FROM scored
    )
    SELECT COUNT(*) FILTER (label = 1) AS n_pos,
           COUNT(*) FILTER (label = 0) AS n_neg,
           ROUND(
             (SUM(avg_rank) FILTER (label = 1)
                - COUNT(*) FILTER (label = 1)
                  * (COUNT(*) FILTER (label = 1) + 1) / 2.0)
             / (COUNT(*) FILTER (label = 1) * COUNT(*) FILTER (label = 0)),
             6
           ) AS auc
    FROM ranked
    """,
    tags=("I8", "E2"),
    demoted=True,
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I8 — Mann–Whitney AUC of the bias-baseline score against the
    ``class_cut``-binarized label (macau reports AUC when class_cut is set
    [api]). Tie-correct: tied scores share their average rank, computed as
    rank() + (count(same score) − 1)/2 — identical in both engines because
    the scores are bit-identical derived doubles.

    Demoted (r6): the AUC kernel itself — the SAME ``auc_components``
    bucketed formulation — is already driver-hash-checked by ``q_win_auc``
    (E2), and the trained-model AUC leg is asserted in the factorization
    suite; this bias-baseline instantiation stays under the local parity
    gate. Its driver slot went to ``q_graph_components`` (connected
    components — an operator class the surface previously lacked).

    Scale: two broadcast joins, then the bucketed-offset
    ``auc_components`` formulation (operators/windows.py) — groupBy(score)
    + per-bucket windows, no single-partition ORDER BY anywhere.
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
    dmean = lambda c: (  # noqa: E731
        F.sum(F.col(c).cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))
    )
    gmean = train.agg(dmean("value").alias("g"))
    ubias = train.groupBy("user_id").agg(dmean("value").alias("ub"))
    tbias = train.groupBy("event_type").agg(dmean("value").alias("tb"))
    scored = (
        split.filter(F.col("split") == "test")
        .join(F.broadcast(ubias), "user_id", "left")
        .join(F.broadcast(tbias), "event_type", "left")
        .crossJoin(F.broadcast(gmean))
        .select(
            F.when(F.col("value") > _CUT, 1).otherwise(0).alias("label"),
            (
                F.coalesce("ub", "g") + F.coalesce("tb", "g") - F.col("g")
            ).alias("score"),
        )
    )
    from bayesiandatafusion_jl_spark.operators.windows import auc_components

    return auc_components(scored)


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


_N_SAMPLES = 4  # fixed pseudo-sample count for the oracle-checkable I11 readout


@register(
    "q_ml_posterior_stats",
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
    ),
    scored AS (
      SELECT s.event_id, s.user_id, s.event_type,
             COALESCE(ub, g) + COALESCE(tb, g) - g AS score
      FROM split s
      LEFT JOIN ubias USING (user_id)
      LEFT JOIN tbias USING (event_type)
      CROSS JOIN gmean
      WHERE s.split = 'test'
    ),
    samples AS (
      SELECT event_id, user_id, event_type,
             score * (0.925 + smp.s * 0.05) AS pred
      FROM scored
      CROSS JOIN (SELECT unnest(generate_series(0, {_N_SAMPLES - 1})) AS s) smp
    )
    SELECT event_id, user_id, event_type,
           COUNT(*) AS n_samples,
           ROUND(CAST(SUM(CAST(pred AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6)
             AS pred_mean,
           ROUND(SQRT(GREATEST(
             (CAST(SUM(CAST(pred * pred AS DECIMAL(38,12))) AS DOUBLE)
              - CAST(SUM(CAST(pred AS DECIMAL(38,12))) AS DOUBLE)
                * CAST(SUM(CAST(pred AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1), 0.0)), 6) AS pred_std
    FROM samples
    GROUP BY event_id, user_id, event_type
    """,
    tags=("I11",),
)
def q_ml_posterior_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I11 — per-cell posterior mean + std across samples (macau returns
    per-cell mean & std of test predictions [api], SURVEY §2.I11).

    The real posterior samples are randomized (q_ml_bpmf_events returns
    them, rows-only); this is the *relational readout* made oracle-checkable
    by substituting deterministic pseudo-samples: the bias-baseline score
    (I7's model) fanned out to {_N_SAMPLES} fixed perturbations
    ``score * (0.925 + s*0.05)``. The pipeline shape is exactly the
    production one: samples table → groupBy(cell) → mean/std (SURVEY I11:
    ``groupBy(cell).agg(avg, stddev)`` over sample_id).

    Float parity: exact decimal sums for Σx and Σx² (order-independent —
    safe under Spark's partial-agg merge at any scale), one identical IEEE
    division/sqrt sequence in both engines, matched round(…, 6). Variance
    via the sum-of-squares identity (Σx² − (Σx)²/n)/(n−1) instead of
    engine-native stddev_samp, whose accumulation order differs.

    Scale: biases broadcast; the sample fan-out is a narrow explode (×4);
    the groupBy(cell) re-aggregates on the same key the explode preserved,
    so AQE coalesces it to one shuffle of test-cell cardinality.
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
    scored = (
        split.filter(F.col("split") == "test")
        .join(F.broadcast(ubias), "user_id", "left")
        .join(F.broadcast(tbias), "event_type", "left")
        .crossJoin(F.broadcast(gmean))
        .select(
            "event_id",
            "user_id",
            "event_type",
            (
                F.coalesce("ub", "g") + F.coalesce("tb", "g") - F.col("g")
            ).alias("score"),
        )
    )
    samples = scored.withColumn(
        "s", F.explode(F.sequence(F.lit(0), F.lit(_N_SAMPLES - 1)))
    ).select(
        "event_id",
        "user_id",
        "event_type",
        (
            F.col("score") * (F.lit(0.925) + F.col("s") * F.lit(0.05))
        ).alias("pred"),
    )
    n = F.count(F.lit(1))
    sx = F.sum(F.col("pred").cast("decimal(38,12)")).cast("double")
    sxx = F.sum((F.col("pred") * F.col("pred")).cast("decimal(38,12)")).cast(
        "double"
    )
    return samples.groupBy("event_id", "user_id", "event_type").agg(
        n.alias("n_samples"),
        F.round(sx / n, 6).alias("pred_mean"),
        F.round(
            F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))), 6
        ).alias("pred_std"),
    )


# Macau cold-start (SURVEY §7 step 6, §2.C6): a fixed link matrix row —
# exact eighths so the double literal parses identically in both engines.
_BETA = [((j * 37) % 15 - 7) / 8.0 for j in range(64)]
_BETA_SQL = "[" + ", ".join(str(v) for v in _BETA) + "]"


@register(
    "q_ml_coldstart",
    oracle=f"""
    WITH observed AS (
      SELECT vec_id FROM embeddings
      WHERE ((vec_id * {_P2}) % {_MOD} + {_MOD}) % {_MOD} < {_TRAIN}
    )
    SELECT e.vec_id,
           ROUND({sql_dot('e.embedding', _BETA_SQL)}, 4) AS pred
    FROM embeddings e
    WHERE NOT EXISTS (SELECT 1 FROM observed o WHERE o.vec_id = e.vec_id)
    """,
    tags=("C6", "I5"),
)
def q_ml_coldstart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start prediction from side information only [paper:Macau]:
    entities with NO training observations get ``u_i = beta^T f_i`` (the
    link-matrix mean; mu = 0 here), so they are scorable before a single
    cell is observed — the reference's distinguishing capability over plain
    BPMF.

    The observed set is the arithmetic I1 predicate (deterministic, so the
    oracle replicates it); the cold set is a real left_anti join (C6). beta
    is a fixed link-matrix row of exact binary fractions; the sampled beta
    comes from the CG path in ml/bpmf.py (rows-only) — this query is the
    deterministic readout shape.

    Scale: the observed-id side is a pruned single-column scan broadcast
    into the anti-join; the dot is a codegen'd fold over the embedding
    array — no shuffle at all when the observed side broadcasts.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    observed = emb.filter(
        F.pmod(
            F.col("vec_id").cast("long") * F.lit(_P2).cast("long"),
            F.lit(_MOD).cast("long"),
        )
        < _TRAIN
    ).select("vec_id")
    beta = F.array(*[F.lit(v) for v in _BETA])
    return emb.join(F.broadcast(observed), "vec_id", "left_anti").select(
        "vec_id", F.round(dot("embedding", beta), 4).alias("pred")
    )


@register("q_ml_tensor_events", oracle=None, tags=("I9",), demoted=True)
def q_ml_tensor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9 — arity-3 tensor factorization [paper:Macau] §tensor on the
    events table: (user × event_type × day-of-week, avg log1p value) CP
    model; posterior mean + std per held-out cell.

    Rows-only check (randomized Gibbs). Tiny config on purpose — the
    statistical gate is tests/test_ml.py::test_tensor_arity3_trains (planted
    CP tensor, multi-chain). The m-way sufficient-stat motion (Hadamard
    product of the other modes' factors over observed cells) is the same
    code path at any scale; only n_blocks and K grow.
    """
    from bayesiandatafusion_jl_spark.ml.bpmf import macau
    from bayesiandatafusion_jl_spark.ml.relation import (
        Relation,
        RelationData,
        split_train_test,
    )

    ev = load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct().orderBy("event_type")
    type_ids = {r["event_type"]: i for i, r in enumerate(types.collect())}
    mapping = F.create_map(
        *[x for k, v in type_ids.items() for x in (F.lit(k), F.lit(v))]
    )
    cells = (
        ev.select(
            F.col("user_id").alias("u"),
            mapping[F.col("event_type")].cast("long").alias("t"),
            (F.dayofweek("ts") - 1).cast("long").alias("d"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t", "d")
        .agg(F.avg("value").alias("value"))
    )
    cells = split_train_test(cells, ["u", "t", "d"], test_frac=0.2, seed=13)
    rd = RelationData().add_relation(Relation(cells, ["u", "t", "d"], alpha=10.0))
    res = macau(
        spark, rd, num_latent=3, burnin=1, psamples=2, seed=19,
        n_blocks=8, track_rmse=False,
    )
    return res.pred_mean.select(
        F.col("u").alias("user_id"),
        F.col("t").alias("type_id"),
        F.col("d").alias("dow"),
        F.col("y").alias("actual"),
        "pred",
        "pred_std",
    )


@register(
    "q_ml_factorization_suite",
    oracle=None,
    tags=("I2", "I3", "I4", "I5", "I6", "I9", "I10"),
)
def q_ml_factorization_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's factorization family end-to-end in ONE driver row
    (rows-only check — randomized Gibbs has no SQL oracle by design):

    - ``bpmf``: matrix BPMF on (user × event_type) [paper:BPMF] — I2/I3/I4
      init, conditional-Gaussian kernel, Normal–Wishart hypers; I7/I11
      posterior mean/std readout.
    - ``tensor``: arity-3 CP factorization (user × type × day-of-week)
      [paper:Macau §tensor] — I9 Hadamard sufficient stats.
    - ``collective``: two relations sharing the user entity — I10 summed
      sufficient statistics.
    - ``probit``: binary training (``probit=True``, Albert–Chib) on the
      class_cut-binarized matrix; its row carries the held-out AUC
      (finite and > 0.5 = the binary pipeline learned signal).

    One summary row per model: held-out cell count, mean |error|, mean
    posterior std — finite values prove the whole Gibbs pipeline ran. The
    bpmf row additionally reports ``sample_gain`` = single-final-sample
    RMSE / posterior-sample-mean RMSE on the held-out cells (the measured
    benefit of the Rao-Blackwellized multi-sample predictor, r6), plus
    ``rhat_med`` / ``ess_med`` (r7) — median split-chain Gelman–Rubin R̂
    and Geyer effective sample size of the posterior score over 64 probe
    cells, from the SAME chain's stored samples (ml/diagnostics.py; no
    second training).
    Statistical quality is gated by tests/test_ml.py property tests
    (planted low-rank matrices, RMSE below noise floor, posterior AUC).
    The per-model full readouts stay available as the demoted
    q_ml_{bpmf,tensor,collective,probit}_events specs."""
    from bayesiandatafusion_jl_spark.operators.windows import auc_components

    legs = []
    # bpmf leg: ONE training serves both the standard stats and the
    # multi-sample prediction gain — sample_gain = (final-single-sample
    # RMSE) / (posterior-sample-mean RMSE); ≥ 1 shows the
    # Rao-Blackwellized predictor's variance reduction, measured on the
    # driver's own data, no second training
    res = _bpmf_events_train(spark, sf_dir)
    pm = res.pred_mean
    single = res.predict(pm.select("u", "t"), use_samples=False).select(
        "u", "t", F.col("pred").alias("p1")
    )
    gains = (
        pm.join(single, ["u", "t"])
        .agg(
            F.sqrt(F.avg(F.pow(F.col("y") - F.col("pred"), 2))).alias("rm"),
            F.sqrt(F.avg(F.pow(F.col("y") - F.col("p1"), 2))).alias("r1"),
        )
        .select((F.col("r1") / F.col("rm")).alias("sample_gain"))
    )
    # convergence readout from the SAME chain: split-half R-hat + ESS at a
    # deterministic probe set (stored samples only — zero extra sweeps).
    # The trace is built ONCE and localCheckpoint-ed: identical subplans
    # are NOT deduped across the two metric legs (engine-verified), so
    # without the checkpoint the probe derivation + factor-sample join
    # would execute twice.
    from bayesiandatafusion_jl_spark.ml.diagnostics import (
        ess_from_trace,
        rhat_from_trace,
    )

    probe = pm.orderBy("u", "t").limit(64).select("u", "t")
    trace = (
        res.sample_scores(probe).withColumn("__chain", F.lit(0))
    ).localCheckpoint()
    diag = (
        rhat_from_trace(trace, ["u", "t"], res.n_samples)
        .join(ess_from_trace(trace, ["u", "t"], res.n_samples), ["u", "t"])
        .agg(
            F.expr("percentile(rhat, 0.5)").alias("rhat_med"),
            F.expr("percentile(ess, 0.5)").alias("ess_med"),
        )
    )
    legs.append(
        pm.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.avg(F.abs(F.col("y") - F.col("pred"))).alias("mae"),
            F.avg("pred_std").alias("mean_std"),
        )
        .crossJoin(gains)
        .crossJoin(diag)
        .select(
            F.lit("bpmf").alias("model"),
            "n_cells",
            "mae",
            "mean_std",
            F.lit(None).cast("double").alias("auc"),
            "sample_gain",
            "rhat_med",
            "ess_med",
        )
    )
    for model, fn in (
        ("tensor", q_ml_tensor_events),
        ("collective", q_ml_collective_events),
    ):
        out = fn(spark, sf_dir)
        legs.append(
            out.agg(
                F.count(F.lit(1)).alias("n_cells"),
                F.avg(F.abs(F.col("actual") - F.col("pred"))).alias("mae"),
                F.avg("pred_std").alias("mean_std"),
            ).select(
                F.lit(model).alias("model"),
                "n_cells",
                "mae",
                "mean_std",
                F.lit(None).cast("double").alias("auc"),
                F.lit(None).cast("double").alias("sample_gain"),
                F.lit(None).cast("double").alias("rhat_med"),
                F.lit(None).cast("double").alias("ess_med"),
            )
        )
    pb = q_ml_probit_events(spark, sf_dir)
    pb_auc = auc_components(
        pb.select("score", "label"), n_buckets=8
    ).select("auc")
    legs.append(
        pb.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.avg(F.abs(F.col("label") - F.col("score"))).alias("mae"),
            F.avg("pred_std").alias("mean_std"),
        )
        .crossJoin(pb_auc)
        .select(
            F.lit("probit").alias("model"),
            "n_cells",
            "mae",
            "mean_std",
            "auc",
            F.lit(None).cast("double").alias("sample_gain"),
            F.lit(None).cast("double").alias("rhat_med"),
            F.lit(None).cast("double").alias("ess_med"),
        )
    )
    suite = legs[0]
    for leg in legs[1:]:
        suite = suite.unionByName(leg)
    return suite


@register("q_ml_collective_events", oracle=None, tags=("I10",), demoted=True)
def q_ml_collective_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I10 — collective factorization [api] [paper:Macau]: two relations
    share the user entity (user × event_type avg value; user × hour-of-day
    avg value), so the user factors' sufficient statistics sum across both
    relations (union of per-relation stats, SURVEY G1+I10). Returns the
    posterior per-cell readout of the primary relation.

    Rows-only check (randomized Gibbs); the statistical gate is
    tests/test_ml.py::test_collective_shared_entity.
    """
    from bayesiandatafusion_jl_spark.ml.bpmf import macau
    from bayesiandatafusion_jl_spark.ml.relation import (
        Relation,
        RelationData,
        split_train_test,
    )

    ev = load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct().orderBy("event_type")
    type_ids = {r["event_type"]: i for i, r in enumerate(types.collect())}
    mapping = F.create_map(
        *[x for k, v in type_ids.items() for x in (F.lit(k), F.lit(v))]
    )
    r1 = (
        ev.select(
            F.col("user_id").alias("u"),
            mapping[F.col("event_type")].cast("long").alias("t"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t")
        .agg(F.avg("value").alias("value"))
    )
    r1 = split_train_test(r1, ["u", "t"], test_frac=0.2, seed=23)
    r2 = (
        ev.select(
            F.col("user_id").alias("u"),
            F.hour("ts").cast("long").alias("h"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "h")
        .agg(F.avg("value").alias("value"))
    )
    rd = (
        RelationData()
        .add_relation(Relation(r1, ["u", "t"], alpha=10.0))
        .add_relation(Relation(r2, ["u", "h"], alpha=5.0))
    )
    res = macau(
        spark, rd, num_latent=3, burnin=1, psamples=2, seed=29,
        n_blocks=8, track_rmse=False,
    )
    return res.pred_mean.select(
        F.col("u").alias("user_id"),
        F.col("t").alias("type_id"),
        F.col("y").alias("actual"),
        "pred",
        "pred_std",
    )
