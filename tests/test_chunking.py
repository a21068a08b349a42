"""Document chunking invariants (functions/chunking.py): lossless
coverage (de-overlapped chunks reconstruct the document), exact overlap
between neighbors, single-chunk short docs, and the map-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.chunking import chunk_documents
from bayesiandatafusion_jl_spark.plans.inspect import n_exchanges
from tests.conftest import SF_DIR_TINY

CHUNK, OVERLAP = 32, 8
STRIDE = CHUNK - OVERLAP


@pytest.fixture(scope="module")
def chunked(spark):
    docs = load_table(spark, SF_DIR_TINY, "documents")
    rows = chunk_documents(docs, CHUNK, OVERLAP).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    return by_doc


@pytest.fixture(scope="module")
def originals(spark):
    docs = load_table(spark, SF_DIR_TINY, "documents").collect()
    return {r["doc_id"]: r["text"].split(" ") for r in docs}


def test_chunks_reconstruct_documents(chunked, originals):
    """Chunk 0 plus each later chunk minus its first ``overlap`` tokens
    concatenates back to the exact original token stream — no token
    lost, none duplicated."""
    assert set(chunked) == set(originals)
    for doc_id, chunks in chunked.items():
        ids = sorted(chunks)
        assert ids == list(range(len(ids)))  # dense chunk ids from 0
        rebuilt = chunks[0]["chunk_text"].split(" ")
        for cid in ids[1:]:
            rebuilt += chunks[cid]["chunk_text"].split(" ")[OVERLAP:]
        assert rebuilt == originals[doc_id], doc_id


def test_neighbor_chunks_share_exact_overlap(chunked):
    seen_multi = 0
    for chunks in chunked.values():
        for cid in range(1, len(chunks)):
            prev = chunks[cid - 1]["chunk_text"].split(" ")
            cur = chunks[cid]["chunk_text"].split(" ")
            if len(prev) == CHUNK:  # a full predecessor shares exactly OVERLAP
                assert cur[:OVERLAP] == prev[-OVERLAP:]
                seen_multi += 1
    assert seen_multi > 0  # the corpus actually exercises multi-chunk docs


def test_chunk_sizes_and_short_docs(chunked, originals):
    for doc_id, chunks in chunked.items():
        n = len(originals[doc_id])
        for r in chunks.values():
            assert 1 <= r["n_tokens"] <= CHUNK
            assert r["n_tokens"] == len(r["chunk_text"].split(" "))
        if n <= CHUNK:  # short doc → exactly one chunk, the whole doc
            assert len(chunks) == 1
            assert chunks[0]["chunk_text"].split(" ") == originals[doc_id]
        else:
            assert len(chunks) == 1 + -(-(n - CHUNK) // STRIDE)


def test_chunking_is_map_only(spark):
    docs = load_table(spark, SF_DIR_TINY, "documents")
    assert n_exchanges(chunk_documents(docs, CHUNK, OVERLAP)) == 0


def test_chunking_param_validation(spark):
    docs = load_table(spark, SF_DIR_TINY, "documents")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 32, 32)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 32, -1)
