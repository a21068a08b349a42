"""RAG pipeline gates (functions/rag.py): feature-hash embedding
invariants and planted-twin retrieval quality — the tests the rows-only
driver check can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.rag import (
    hash_embed,
    q_llm_rag_pipeline,
)
from tests.conftest import SF_DIR_TINY


def _vecs(df):
    return {r["doc_id"]: list(r["embedding"]) for r in df.collect()}


def test_hash_embed_invariants(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),   # identical text
            (3, "a quick brown fox jumps"),     # one-token edit
            (4, ""),                            # empty → zero vector
            (5, "completely different tokens entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    v = _vecs(hash_embed(docs, dim=64))
    assert set(v) == {1, 2, 3, 4, 5}
    assert all(len(x) == 64 for x in v.values())
    # identical text → identical vector; unit norm for non-empty
    assert v[1] == v[2]
    for i in (1, 3, 5):
        assert abs(math.fsum(x * x for x in v[i]) - 1.0) < 1e-9
    assert v[4] == [0.0] * 64
    # one-token edit stays close; unrelated text stays far
    cos13 = math.fsum(a * b for a, b in zip(v[1], v[3]))
    cos15 = math.fsum(a * b for a, b in zip(v[1], v[5]))
    # 5-token docs, one edit → 4 shared tokens ≈ 0.8 cosine minus hash
    # collision noise (measured 0.77); unrelated text sits near 0
    assert cos13 > 0.7
    assert cos15 < 0.4
    # partition invariance
    v2 = _vecs(hash_embed(docs.repartition(7), dim=64))
    assert v == v2
    with pytest.raises(ValueError, match="dim"):
        hash_embed(docs, dim=1)


def test_rag_pipeline_retrieves_planted_twins(spark):
    rows = q_llm_rag_pipeline(spark, SF_DIR_TINY).collect()
    by_q: dict = {}
    for r in rows:
        # lineage decode is lossless
        assert r["nb_doc_id"] * 10_000 + r["nb_chunk_id"] == r["nb_id"]
        by_q.setdefault(r["qid"], []).append(r)
    n_q = len(by_q)
    assert n_q > 50  # every twin doc issues a query
    assert all(sorted(r["rk"] for r in rs) == [1, 2, 3] for rs in by_q.values())
    # measured 0.97 top-1 / 1.0 in-top-3 on this corpus; generous margins
    top1 = sum(1 for rs in by_q.values() if any(r["hit"] for r in rs))
    in3 = sum(
        1
        for q, rs in by_q.items()
        if any(r["nb_doc_id"] == q - 1_000_000 for r in rs)
    )
    assert top1 / n_q >= 0.9
    assert in3 / n_q >= 0.97
