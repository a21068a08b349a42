"""Sequence-packing semantics: partition-count invariance (the two-phase
distributed scan must equal the single global window at ANY partition
count), exact stream-layout reconstruction, overflow-safe integer
division, and input-partitioning independence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.packing import pack_sequences

from tests.conftest import SF_DIR_TINY


def _packed(spark, n_partitions, capacity=256):
    docs = load_table(spark, SF_DIR_TINY, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = pack_sequences(
        sized, ["doc_id"], "n_tokens", capacity, n_partitions=n_partitions
    )
    return {
        r.doc_id: (r.bin_id, r.offset)
        for r in out.select("doc_id", "bin_id", "offset").collect()
    }


def test_partition_count_invariance(spark):
    """The docstring's contract: bit-identical (bin_id, offset) at every
    partition count — n=1 IS the single global window, so the distributed
    scan at 3/7/32 partitions must reproduce it exactly."""
    reference = _packed(spark, 1)
    assert len(reference) > 0
    for n in (3, 7, 32):
        assert _packed(spark, n) == reference, f"diverged at n_partitions={n}"


def test_input_partitioning_independence(spark):
    """The stream order is (identity_hash, id); a hostile upstream
    partitioning/ordering must not change the layout."""
    docs = load_table(spark, SF_DIR_TINY, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    base = {
        r.doc_id: (r.bin_id, r.offset)
        for r in pack_sequences(sized, ["doc_id"], "n_tokens", 256).collect()
    }
    scrambled = sized.orderBy(F.col("n_tokens").desc()).repartition(5, "n_tokens")
    got = {
        r.doc_id: (r.bin_id, r.offset)
        for r in pack_sequences(scrambled, ["doc_id"], "n_tokens", 256).collect()
    }
    assert got == base


def test_layout_is_concat_then_chunk(spark):
    """On a constructed frame the packed layout must equal the hand-computed
    concat-then-chunk positions, including a doc that straddles a window
    boundary (starts at offset < capacity, spills into the next bin)."""
    rows = [(i, ln) for i, ln in enumerate([100, 100, 100, 50, 200, 6])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = pack_sequences(df, ["doc_id"], "n_tokens", 256, n_partitions=4)
    by_doc = {r.doc_id: (r.bin_id, r.offset, r.n_tokens) for r in got.collect()}
    # reconstruct the stream order from global positions and verify the
    # exclusive prefix sum property: positions are distinct, contiguous
    pos = sorted((b * 256 + o, n) for (b, o, n) in by_doc.values())
    expect = 0
    for p, n in pos:
        assert p == expect, f"gap/overlap in stream: got {p}, want {expect}"
        expect += n
    assert expect == sum(n for _, n in rows)


def test_bin_id_exact_past_2_53(spark):
    """Positions beyond 2^53 must not go through double division: with a
    prefix row of 2^60 tokens, bin_id = pos div capacity must be exact
    (float division would round to the nearest representable double)."""
    big = 1 << 60
    df = spark.createDataFrame(
        [(0, big), (1, 7), (2, 9)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.bin_id, r.offset)
        for r in pack_sequences(df, ["doc_id"], "n_tokens", 1000, n_partitions=2)
        .collect()
    }
    # stream order is by identity hash, so recover each doc's position
    # from its (bin, offset) and check exactness vs Python's int math
    pos = {d: b * 1000 + o for d, (b, o) in got.items()}
    ordered = sorted(pos.items(), key=lambda kv: kv[1])
    lens = {0: big, 1: 7, 2: 9}
    running = 0
    for d, p in ordered:
        assert p == running
        assert got[d][0] == running // 1000
        assert got[d][1] == running % 1000
        running += lens[d]


def test_capacity_validation(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, ["doc_id"], "n_tokens", 0)


def test_pack_chunks_invariants(spark):
    from bayesiandatafusion_jl_spark.functions.packing import pack_chunks

    rows = [(i, ln) for i, ln in enumerate([100, 300, 50, 700, 6, 256])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    chunks = pack_chunks(df, ["doc_id"], "n_tokens", 256, n_partitions=3).collect()
    lens = dict(rows)
    total = sum(lens.values())
    by_doc: dict[int, list] = {}
    by_bin: dict[int, int] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
        by_bin[c.bin_id] = by_bin.get(c.bin_id, 0) + c.chunk_len
        assert 0 < c.chunk_len <= 256
        assert 0 <= c.bin_offset < 256
    # per-doc: chunks contiguous in doc_offset and sum to the doc length
    for d, cs in by_doc.items():
        cs.sort(key=lambda c: c.doc_offset)
        assert cs[0].doc_offset == 0
        acc = 0
        for c in cs:
            assert c.doc_offset == acc
            acc += c.chunk_len
        assert acc == lens[d]
    # per-bin: every window except the stream's last is filled exactly
    last_bin = (total - 1) // 256
    assert set(by_bin) == set(range(last_bin + 1))
    for b, filled in by_bin.items():
        assert filled == (256 if b < last_bin else total - 256 * last_bin)


def test_pack_chunks_zero_length_docs_emit_nothing(spark):
    from bayesiandatafusion_jl_spark.functions.packing import pack_chunks

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 5)], "doc_id long, n_tokens long"
    )
    got = pack_chunks(df, ["doc_id"], "n_tokens", 8).collect()
    assert {r.doc_id for r in got} == {1, 3}
