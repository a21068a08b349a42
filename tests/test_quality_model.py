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


def test_save_load_score_parity_and_meta_refusal(spark, tmp_path, monkeypatch):
    """r14 (VERDICT #1): save → fresh load → score must equal the
    in-memory model's scores exactly; a load under a DIFFERENT
    featurization fingerprint must refuse loudly (the load_bpe
    discipline)."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import quality_model as qm

    good = _corpus(spark, n=30)
    bad = _corpus(spark, n=30, start=1000, good=False)
    seed = good.withColumn("label", F.lit(1.0)).unionByName(
        bad.withColumn("label", F.lit(0.0))
    )
    model = train_quality_classifier(seed)
    d = str(tmp_path / "qmodel")
    qm.save_quality_model(spark, model, d, qm.seed_fingerprint(seed))
    loaded, n_features = qm.load_quality_model(spark, d)
    assert n_features == model.numFeatures
    probe = good.unionByName(bad)
    want = sorted(
        (r["doc_id"], round(r["p_good"], 12))
        for r in score_quality(model, probe).collect()
    )
    got = sorted(
        (r["doc_id"], round(r["p_good"], 12))
        for r in score_quality(loaded, probe, n_features=n_features).collect()
    )
    assert got == want
    # featurizer drift: the artifact must refuse to load
    monkeypatch.setattr(qm, "_featurizer_fp", lambda: 12345)
    with _pytest.raises(ValueError, match="DIFFERENT featurization"):
        qm.load_quality_model(spark, d)


def test_ensure_quality_model_trains_once(spark, monkeypatch):
    """Second ensure() over the same corpus must NOT retrain (the
    artifact + matching seed fingerprint short-circuit); a different
    seed (other corpus) must."""
    import shutil

    from bayesiandatafusion_jl_spark.functions import quality_model as qm

    sf_dir = "/root/testdata/sf0.001"
    model_dir = f"/tmp/bdf_quality_model/{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(model_dir, ignore_errors=True)
    d1 = qm.ensure_quality_model(spark, sf_dir)
    assert d1 == model_dir

    def boom(*a, **kw):
        raise AssertionError("retrained despite a fresh matching artifact")

    monkeypatch.setattr(qm, "train_quality_classifier", boom)
    assert qm.ensure_quality_model(spark, sf_dir) == model_dir
    # and the registered query runs scoring-only under the same patch
    out = qm.q_llm_quality_model(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) > 0
