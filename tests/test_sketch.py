"""Count-min sketch invariants (operators/aggregates.py).

The CMS guarantees are deterministic given the data and the seeded hash
family, so the classic probabilistic statements become exact assertions
here: estimates never undercount, the ε·N bound holds for at least the
1−δ fraction, and the sketch is invariant to how the stream is
partitioned (mergeability == Spark partial-agg, pinned explicitly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.operators.aggregates import (
    _cms_dims,
    cms_estimate,
    cms_sketch,
)
from tests.conftest import SF_DIR_TINY

EPS, DELTA = 1e-3, 0.01


@pytest.fixture(scope="module")
def toks(spark):
    docs = spark.read.parquet(f"{SF_DIR_TINY}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).cache()


def test_cms_dims():
    w, d = _cms_dims(1e-3, 0.01)
    assert w == 2719 and d == 5
    with pytest.raises(ValueError):
        _cms_dims(0.0, 0.01)
    with pytest.raises(ValueError):
        _cms_dims(0.1, 1.5)


def test_cms_never_undercounts_and_bound(spark, toks):
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    n_total = toks.count()
    sketch = cms_sketch(toks, "token", EPS, DELTA)
    est = cms_estimate(sketch, exact.select("token"), "token", EPS, DELTA)
    joined = exact.join(est, "token").collect()
    # the synthetic documents corpus has a fixed 31-word vocabulary at
    # every SF; the collision regime (vocab >> w) is exercised by
    # test_cms_bound_under_real_collisions below
    assert len(joined) == exact.count() > 20
    # overestimate-only: structural CMS guarantee, must hold for EVERY item
    assert all(r["est"] >= r["exact"] for r in joined)
    # ε·N bound: guaranteed for ≥ 1−δ of items; assert the measured rate
    within = sum(r["est"] - r["exact"] <= EPS * n_total for r in joined)
    assert within / len(joined) >= 1 - DELTA


def test_cms_row_sums_to_stream_length(spark, toks):
    n_total = toks.count()
    sketch = cms_sketch(toks, "token", EPS, DELTA)
    per_row = sketch.groupBy("r").agg(F.sum("cnt").alias("n")).collect()
    w, d = _cms_dims(EPS, DELTA)
    assert len(per_row) == d
    assert all(r["n"] == n_total for r in per_row)
    # sparse + bounded: never more than d·w cells
    assert sketch.count() <= d * w


def test_cms_partition_invariance(spark, toks):
    def frozen(df):
        return sorted((r["r"], r["c"], r["cnt"]) for r in df.collect())

    a = frozen(cms_sketch(toks.repartition(2), "token", EPS, DELTA))
    b = frozen(cms_sketch(toks.repartition(13), "token", EPS, DELTA))
    assert a == b


def test_cms_exact_when_no_collisions(spark):
    # 50 distinct items, w=2719 → whp no collisions in any row; but the
    # guarantee tested is only est ≥ exact; exactness here pins that the
    # plumbing (explode/join/min/coalesce) introduces no off-by-ones
    items = spark.range(50).select(
        F.concat(F.lit("item_"), F.col("id")).alias("k"),
        F.explode(F.sequence(F.lit(1), (F.col("id") % 5) + 1)).alias("rep"),
    ).select("k")
    sketch = cms_sketch(items, "k", EPS, DELTA)
    est = cms_estimate(sketch, items.select("k").distinct(), "k", EPS, DELTA)
    exact = items.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    rows = exact.join(est, "k").collect()
    assert len(rows) == 50
    assert all(r["est"] == r["exact"] for r in rows)


def test_cms_bound_under_real_collisions(spark):
    # 50k distinct keys into w=272 columns (eps=0.01) → every cell holds
    # ~180 keys, so EVERY estimate is a collision sum and the min-over-d
    # rows is doing the work. Zipf-ish skew via id % steps keeps exact
    # counts spread over [1, 25].
    eps, delta = 1e-2, 1e-3
    items = (
        spark.range(50_000)
        .select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            F.explode(
                F.sequence(F.lit(1), (F.pmod(F.col("id"), F.lit(25)) + 1))
            ).alias("rep"),
        )
        .select("k")
    )
    n_total = items.count()
    exact = items.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    sketch = cms_sketch(items, "k", eps, delta)
    est = cms_estimate(sketch, exact.select("k"), "k", eps, delta)
    rows = exact.join(est, "k").collect()
    assert len(rows) == 50_000
    assert all(r["est"] >= r["exact"] for r in rows)
    within = sum(r["est"] - r["exact"] <= eps * n_total for r in rows)
    assert within / len(rows) >= 1 - delta


def test_cms_unseen_item_small_estimate(spark, toks):
    n_total = toks.count()
    sketch = cms_sketch(toks, "token", EPS, DELTA)
    unseen = toks.sparkSession.createDataFrame(
        [("__never_in_corpus_%d__" % i,) for i in range(20)], "token string"
    )
    rows = cms_estimate(sketch, unseen, "token", EPS, DELTA).collect()
    assert len(rows) == 20
    # unseen items read only collision mass: ≤ ε·N for ≥ 1−δ of them
    within = sum(r["est"] <= EPS * n_total for r in rows)
    assert within / len(rows) >= 1 - DELTA


def test_cms_query_runs(spark):
    from bayesiandatafusion_jl_spark.registry import get_query

    df = get_query("q_agg_cms").fn(spark, SF_DIR_TINY)
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["within_bound"] for r in rows)


def test_cms_streaming_matches_batch(spark, tmp_path):
    """The sketch construction is explode + groupBy-count, so pointing it
    at a readStream gives an incrementally-maintained CMS with NO custom
    operator: Spark's streaming state IS the sketch (mergeability ==
    partial agg == state update). Two file drops; after each, the
    complete-mode result must equal the batch sketch over everything
    seen so far — including cross-batch merges of the same cell."""
    import os

    src = str(tmp_path / "toks_in")
    os.makedirs(src, exist_ok=True)
    schema = "token string"

    def drop(words):
        spark.createDataFrame([(w,) for w in words], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    eps, delta = 1e-2, 1e-3
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cms_sketch(stream, "token", eps, delta)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream")
        .start()
    )

    def frozen(df):
        return sorted((r["r"], r["c"], r["cnt"]) for r in df.collect())

    try:
        batch1 = ["a", "b", "a", "c"] * 5
        drop(batch1)
        q.processAllAvailable()
        assert frozen(spark.table("cms_stream")) == frozen(
            cms_sketch(spark.createDataFrame([(w,) for w in batch1], schema), "token", eps, delta)
        )
        batch2 = ["a", "d"] * 7  # 'a' cells must MERGE across batches
        drop(batch2)
        q.processAllAvailable()
        assert frozen(spark.table("cms_stream")) == frozen(
            cms_sketch(
                spark.createDataFrame([(w,) for w in batch1 + batch2], schema),
                "token",
                eps,
                delta,
            )
        )
    finally:
        q.stop()


def test_cms_cross_type_estimate_never_undercounts(spark):
    """The sketch hashes the item's STRING form, so an estimate issued
    with a differently-typed (but equal-valued) query column still
    upholds est >= true — the guarantee a sketch is trusted for."""
    items = spark.range(500).select((F.col("id") % 50).alias("k"))  # bigint
    sketch = cms_sketch(items, "k", EPS, DELTA)
    q_int = spark.range(50).select(F.col("id").cast("int").alias("k"))
    rows = cms_estimate(sketch, q_int, "k", EPS, DELTA).collect()
    assert len(rows) == 50
    assert all(r["est"] >= 10 for r in rows)  # true count per key = 10
