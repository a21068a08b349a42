"""Broadcast-BPE tokenizer: equivalence vs an independent pure-Python
reference (merges applied sequentially in training order — provably the
same result as the min-rank loop, via a different algorithm), determinism
of the trainer, partition invariance of the distributed encode, and the
packing wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.bpe import (
    _BYTE_SYM,
    _symbolize,
    bpe_encode,
    load_bpe,
    pretokenize,
    save_bpe,
    train_bpe,
    train_bpe_corpus,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs 12345",
    "she's got 99 problems but the fox isn't one",
    "brown foxes and lazy dogs, the usual suspects!",
]


def _reference_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: apply each merge rule in TRAINING ORDER,
    sweeping the symbol list until that rule no longer matches, before
    moving to the next rule. Later merges can only involve symbols earlier
    merges created, so sequential application equals min-rank application."""
    out: list[str] = []
    for w in pretokenize(text):
        s = list(w)
        for a, b in merges:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [a + b]
                    # a merge can create a new (a, b) match ending at i-1
                    i = max(i - 1, 0)
                else:
                    i += 1
        out.extend(s)
    return out


def test_trainer_is_deterministic():
    m1 = train_bpe(CORPUS, 50)
    m2 = train_bpe(list(reversed(CORPUS)), 50)
    assert m1 == m2
    assert len(m1) == 50
    # merges are pairs of non-empty symbols
    assert all(a and b for a, b in m1)


def test_encode_matches_reference(spark):
    merges = train_bpe(CORPUS, 60)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(df, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        assert got[i] == _reference_encode(t, merges), f"doc {i}"


def test_encode_is_lossless_and_counts_match(spark):
    merges = train_bpe(CORPUS, 40)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    rows = bpe_encode(df, merges).collect()
    for r in rows:
        # concatenated tokens reproduce the lowercased pretoken stream
        assert "".join(r.bpe_tokens) == "".join(pretokenize(CORPUS[r.doc_id]))
        assert r.bpe_n_tokens == len(r.bpe_tokens)
        # merges only ever shrink the char-grain sequence
        assert r.bpe_n_tokens <= sum(len(w) for w in pretokenize(CORPUS[r.doc_id]))


def test_encode_partition_invariance(spark):
    merges = train_bpe(CORPUS, 60)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 8)], "doc_id int, text string"
    )
    one = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df.repartition(1), merges).collect()
    )
    many = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df.repartition(7), merges).collect()
    )
    assert one == many


MIXED = CORPUS + [
    "naïve café ünïcode — 日本語 text with émojis",
    "ascii only line stays byte identical",
]


def test_byte_grain_table_is_total_bijection():
    # every byte value has a distinct single-char proxy (GPT-2 table)
    assert len(_BYTE_SYM) == 256
    assert len(set(_BYTE_SYM.values())) == 256
    assert all(len(c) == 1 for c in _BYTE_SYM.values())
    # identity on plain letters, remapped for space and non-ASCII
    assert _symbolize("fox", "byte") == "fox"
    assert _symbolize(" fox", "byte") != " fox"
    assert len(_symbolize("café", "byte")) == len("café".encode("utf-8"))


def test_byte_grain_counts_match_char_grain_on_ascii(spark):
    """On pure ASCII the byte proxy is a per-char bijection, so merge
    learning is isomorphic and token counts are identical; only the
    token SPELLINGS differ (space → proxy char)."""
    mc = train_bpe(CORPUS, 60, grain="char")
    mb = train_bpe(CORPUS, 60, grain="byte")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    nc = {r.doc_id: r.bpe_n_tokens for r in bpe_encode(df, mc).collect()}
    nb = {
        r.doc_id: r.bpe_n_tokens
        for r in bpe_encode(df, mb, grain="byte").collect()
    }
    assert nc == nb


def test_byte_grain_handles_mixed_scripts(spark):
    merges = train_bpe(MIXED, 80, grain="byte")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(MIXED)], "doc_id int, text string"
    )
    rows = bpe_encode(df, merges, grain="byte").collect()
    for r in rows:
        # lossless at the byte-proxy grain: concatenated tokens reproduce
        # the symbolized pretoken stream
        want = "".join(
            _symbolize(w, "byte") for w in pretokenize(MIXED[r.doc_id])
        )
        assert "".join(r.bpe_tokens) == want
    # partition invariance at the byte grain
    one = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df.repartition(1), merges, grain="byte").collect()
    )
    many = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df.repartition(5), merges, grain="byte").collect()
    )
    assert one == many
    with pytest.raises(ValueError, match="grain"):
        train_bpe(CORPUS, 5, grain="word")


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    tok_dir = str(tmp_path / "tok")
    merges = train_bpe(MIXED, 60, grain="byte")
    save_bpe(spark, merges, tok_dir, grain="byte")
    loaded, grain = load_bpe(spark, tok_dir)
    assert loaded == merges and grain == "byte"
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(MIXED)], "doc_id int, text string"
    )
    via_dir = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df, tokenizer_dir=tok_dir).collect()
    )
    via_merges = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(df, merges, grain="byte").collect()
    )
    assert via_dir == via_merges
    # exactly one of merges / tokenizer_dir
    with pytest.raises(ValueError, match="exactly one"):
        bpe_encode(df, merges, tokenizer_dir=tok_dir)
    with pytest.raises(ValueError, match="exactly one"):
        bpe_encode(df)
    with pytest.raises(ValueError, match="empty merge table"):
        save_bpe(spark, [], tok_dir)


def test_tokenizer_refuses_mixed_vocabulary(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        index_paths,
        write_meta,
    )

    tok_dir = str(tmp_path / "tok2")
    merges = train_bpe(CORPUS, 40)
    save_bpe(spark, merges, tok_dir)
    (meta_path,) = index_paths(tok_dir, "meta")
    meta = spark.read.parquet(meta_path).collect()[0].asDict()
    # a dir pinned to a DIFFERENT pretokenizer version is refused
    write_meta(
        spark, meta_path, "overwrite", **{**meta, "pretok_fp": 12345}
    )
    with pytest.raises(ValueError, match="DIFFERENT pretokenizer"):
        load_bpe(spark, tok_dir)
    # a merges frame that no longer matches its pinned fingerprint
    # (torn/mixed write) is refused
    write_meta(
        spark, meta_path, "overwrite", **{**meta, "merges_fp": 999}
    )
    with pytest.raises(ValueError, match="fingerprint"):
        load_bpe(spark, tok_dir)


def test_corpus_trainer_and_pack_wiring(spark):
    from tests.conftest import SF_DIR_TINY
    from bayesiandatafusion_jl_spark.catalog import load_table
    from bayesiandatafusion_jl_spark.functions.packing import pack_sequences

    docs = load_table(spark, SF_DIR_TINY, "documents").select("doc_id", "text")
    merges = train_bpe_corpus(docs, num_merges=80)
    assert len(merges) == 80
    enc = bpe_encode(docs, merges).select("doc_id", "bpe_n_tokens")
    packed = pack_sequences(enc, ["doc_id"], "bpe_n_tokens", capacity=512)
    rows = packed.collect()
    assert len(rows) == docs.count()
    total = sum(r.bpe_n_tokens for r in rows)
    # every row's window position is consistent with the global stream:
    # bin_id*capacity + offset strictly increases across the pack order and
    # the final row ends exactly at the stream total
    pos = sorted(r.bin_id * 512 + r.offset for r in rows)
    assert pos[0] == 0
    assert all(a < b for a, b in zip(pos, pos[1:]))
    last = max(rows, key=lambda r: r.bin_id * 512 + r.offset)
    assert last.bin_id * 512 + last.offset + last.bpe_n_tokens == total
