"""Trained quality classifier (functions/quality_model.py): planted
separation, held-out generalization, and the map-only scoring contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.quality_model import (
    quality_filter_trained,
    score_quality,
    train_quality_classifier,
)


def _corpus(spark, n=80, start=0, good=True):
    if good:
        texts = [
            f"the quick brown fox number {i} jumps over the lazy dog near "
            f"the river bank while reading a long book about history"
            for i in range(n)
        ]
    else:
        texts = [
            f"zzq zzq7 xkcd{i % 3} zzq zzq zzq9 blgh zzq zzq4 zzq zzq "
            f"qqz{i % 5} zzq zzq zzq zzq8 zzq zzq zzq zzq"
            for i in range(n)
        ]
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_planted_separation_generalizes_held_out(spark):
    good, bad = _corpus(spark, good=True), _corpus(spark, start=1000, good=False)
    train = good.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.lit(1.0)
    ).unionByName(
        bad.filter(F.col("doc_id") % 2 == 0).withColumn("label", F.lit(0.0))
    )
    model = train_quality_classifier(train)
    held_good = score_quality(model, good.filter(F.col("doc_id") % 2 == 1))
    held_bad = score_quality(model, bad.filter(F.col("doc_id") % 2 == 1))
    g = [r["p_good"] for r in held_good.collect()]
    b = [r["p_good"] for r in held_bad.collect()]
    assert min(g) > 0.9, min(g)   # held-out good confidently kept
    assert max(b) < 0.1, max(b)   # held-out bad confidently dropped
    # perfect ranking separation => AUC 1 on the held-out split
    assert min(g) > max(b)


def test_filter_keeps_good_side(spark):
    good, bad = _corpus(spark, n=40), _corpus(spark, n=40, start=1000, good=False)
    seed = good.withColumn("label", F.lit(1.0)).unionByName(
        bad.withColumn("label", F.lit(0.0))
    )
    model = train_quality_classifier(seed)
    mixed = good.unionByName(bad)
    kept = quality_filter_trained(model, mixed, threshold=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {r["doc_id"] for r in good.collect()}


def test_scoring_is_shuffle_free(spark):
    """The corpus sweep must stay map-only: no Exchange in the scoring
    plan (featurize + dot product are per-row)."""
    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    good = _corpus(spark, n=20)
    model = train_quality_classifier(good.withColumn("label", F.lit(1.0)).unionByName(
        _corpus(spark, n=20, start=500, good=False).withColumn("label", F.lit(0.0))
    ))
    plan = formatted_plan(score_quality(model, good))
    assert "Exchange" not in plan, plan
