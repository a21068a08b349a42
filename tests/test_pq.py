"""IVF-PQ quality gates (functions/vector_pq.py): encode parity against
a numpy reference, partition invariance, deterministic refits, ADC score
fidelity, and end-to-end recall vs the brute-force baseline — the tests
the rows-only driver check can't express (same convention as
tests/test_ann.py for the plain-IVF path)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.vector import (
    _cached_centers,
    q_llm_knn,
)
from bayesiandatafusion_jl_spark.functions.vector_pq import (
    ann_ivfpq_search,
    pq_encode,
    pq_train,
    q_llm_knn_ivfpq,
)
from tests.conftest import SF_DIR_TINY

M, KSUB = 16, 256


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR_TINY, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=M, ksub=KSUB)


def test_pq_train_shapes_and_determinism(emb, books):
    n = emb.count()
    assert len(books) == M
    assert all(len(b) == min(KSUB, n) for b in books)
    dsub = 64 // M
    assert all(len(c) == dsub for b in books for c in b)
    # bit-reproducible refit (deterministic sample + init + numpy order)
    assert pq_train(emb, m=M, ksub=KSUB) == books


def test_pq_train_rejects_bad_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)


def test_pq_encode_matches_numpy_reference(emb, books):
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    dsub = 64 // M
    sub = x.reshape(len(rows), M, dsub)
    for mi in range(M):
        c = np.array(books[mi])
        d2 = (c**2).sum(axis=1)[None, :] - 2.0 * (sub[:, mi, :] @ c.T)
        want = np.argmin(d2, axis=1)
        for i, r in enumerate(rows):
            assert got[r["vec_id"]][mi] == want[i]


def test_pq_encode_partition_invariance(emb, books):
    def frozen(df):
        return sorted(
            (r["vec_id"], tuple(r["pq_code"]))
            for r in df.select("vec_id", "pq_code").collect()
        )

    a = frozen(pq_encode(emb.repartition(2), books))
    b = frozen(pq_encode(emb.repartition(13), books))
    assert a == b
    # codes are valid codebook indices
    ksub = len(books[0])
    assert all(0 <= c < ksub for _, code in a for c in code)


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def test_ivfpq_recall_vs_brute_force(spark, emb):
    exact = {(r["qid"], r["nb_id"]) for r in q_llm_knn(spark, SF_DIR_TINY).collect()}
    centers = _cached_centers(emb, SF_DIR_TINY, 16)
    got = {
        (r["qid"], r["nb_id"])
        for r in ann_ivfpq_search(emb, _queries(emb), centers=centers).collect()
    }
    # measured 0.94 (== the IVF candidate-recall ceiling: the exact
    # refine re-rank recovers everything the probed cells contain);
    # 0.8 matches the plain-IVF gate in test_ann.py
    assert len(got & exact) / len(exact) >= 0.8
    # ADC-only ordering (no exact re-rank) — measured 0.54 at m=16,
    # ksub=256 on this quasi-uniform corpus; the gate pins that raw ADC
    # stays a usable ranking, not that it matches the refined path
    adc = {
        (r["qid"], r["nb_id"])
        for r in ann_ivfpq_search(
            emb, _queries(emb), centers=centers, refine=0
        ).collect()
    }
    assert len(adc & exact) / len(exact) >= 0.4


def test_adc_score_fidelity(spark, emb):
    """ADC approximations must track exact dots: corr ≥ 0.8 and MAE
    ≤ 0.08 over every candidate pair (measured 0.93 / 0.037)."""
    centers = _cached_centers(emb, SF_DIR_TINY, 16)
    scored = ann_ivfpq_search(
        emb, _queries(emb), centers=centers, refine=0, k=10_000
    ).collect()
    x = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    a = np.array([r["score"] for r in scored])
    e = np.array([float(x[r["qid"]] @ x[r["nb_id"]]) for r in scored])
    assert len(a) > 1000
    assert np.corrcoef(a, e)[0, 1] >= 0.8
    assert np.abs(a - e).mean() <= 0.08


def test_ivfpq_query_runs(spark):
    rows = q_llm_knn_ivfpq(spark, SF_DIR_TINY).collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["rk"])
    assert len(per_q) == 10
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
