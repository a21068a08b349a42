"""Persisted winnowing-fingerprint index (functions/winnow_index.py) —
the lifecycle gates beyond the DuckDB oracle: one-shot equality at the
split, replay idempotence, cross-epoch pairing, the GLOBAL-df rail,
tombstones, id-collision refusal, and compaction invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.winnow_index import (
    compact_winnow_index,
    delete_from_winnow_index,
    winnow_overlap_incremental,
    write_winnow_index,
)

_SF = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{_SF}/documents.parquet")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["pair_type"])
        for r in df.collect()
    }


def _oneshot(spark, hi, boundary, min_shared, max_df=None):
    from bayesiandatafusion_jl_spark.functions.text import (
        fingerprint_overlap,
    )

    ref = fingerprint_overlap(
        _docs(spark, 0, hi), min_shared=min_shared, max_df=max_df
    )
    return {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in ref.filter(F.col("id_b") >= boundary).collect()
    }


def test_incremental_equals_oneshot_overlap(spark, tmp_path):
    boundary, hi = 200, 300
    d = str(tmp_path / "winix")
    write_winnow_index(_docs(spark, 0, boundary), d)
    got = _pairs(
        winnow_overlap_incremental(_docs(spark, boundary, hi), d, min_shared=2)
    )
    want = _oneshot(spark, hi, boundary, 2)
    assert {k: v[0] for k, v in got.items()} == want
    assert len(got) > 0
    for (ia, ib), (_, pt) in got.items():
        assert pt == ("new_index" if ia < boundary else "new_new")


def test_global_df_rail_equals_railed_oneshot(spark, tmp_path):
    """The max_df rail must bind on the GLOBAL df (stored + shard): a
    boilerplate fingerprint split across the boundary (df_stored and
    df_shard each <= cap, sum > cap) is still cut, exactly like the
    railed one-shot join."""
    from bayesiandatafusion_jl_spark.functions.text import (
        fingerprint_overlap,
    )

    boiler = (
        "this document is provided under the standard corporate"
        " license agreement terms"
    )
    rows = [
        (i, f"unique{i}x opening{i} words{i} {boiler} trailing{i} close{i}")
        for i in (1, 2, 3, 4, 5, 6, 101, 102, 103, 104, 105, 106)
    ]
    plag = "a genuinely plagiarized span of nine specific tokens here"
    rows += [
        (20, f"first20 second20 {plag} tail20"),
        (121, f"other121 leading121 {plag} end121"),
    ]
    all_docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = all_docs.filter(F.col("doc_id") < 100)  # 6 boiler docs + doc 20
    shard = all_docs.filter(F.col("doc_id") >= 100)  # 6 boiler + doc 121
    d = str(tmp_path / "winix_rail")
    write_winnow_index(base, d)
    # rail at 8: neither side alone exceeds it, the global df=12 does
    railed = _pairs(
        winnow_overlap_incremental(shard, d, min_shared=1, max_df=8)
    )
    want = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in fingerprint_overlap(all_docs, min_shared=1, max_df=8)
        .filter(F.col("id_b") >= 100)
        .collect()
    }
    assert {k: v[0] for k, v in railed.items()} == want
    assert set(railed) == {(20, 121)}  # boilerplate cut, true pair kept
    # unrailed: the boilerplate pairs flood back in
    unrailed = _pairs(winnow_overlap_incremental(shard, d, min_shared=1))
    assert len(unrailed) > 30


def test_append_replay_and_cross_epoch(spark, tmp_path):
    b1, b2, hi = 150, 220, 300
    d = str(tmp_path / "winix_app")
    write_winnow_index(_docs(spark, 0, b1), d)
    s1 = _docs(spark, b1, b2)
    # min_shared=1: the sf0.001 corpus's straddling fingerprint pairs
    # mostly share exactly one selection, and the cross-epoch assertion
    # below needs them present
    first = _pairs(
        winnow_overlap_incremental(
            s1, d, min_shared=1, update_index=True, epoch="s1"
        )
    )
    n_rows = spark.read.parquet(f"{d}/fps").count()
    replay = _pairs(
        winnow_overlap_incremental(
            s1, d, min_shared=1, update_index=True, epoch="s1"
        )
    )
    assert replay == first
    assert spark.read.parquet(f"{d}/fps").count() == n_rows
    second = _pairs(
        winnow_overlap_incremental(_docs(spark, b2, hi), d, min_shared=1)
    )
    assert {k: v[0] for k, v in second.items()} == _oneshot(spark, hi, b2, 1)
    assert any(b1 <= ia < b2 for (ia, _) in second), "no cross-epoch pair"
    # live id collision refuses
    with pytest.raises(ValueError, match="already indexed"):
        winnow_overlap_incremental(
            s1, d, min_shared=1, update_index=True, epoch="s2"
        )


def test_tombstones_compaction_and_guards(spark, tmp_path):
    boundary, hi = 200, 300
    d = str(tmp_path / "winix_life")
    write_winnow_index(_docs(spark, 0, boundary), d)
    shard = _docs(spark, boundary, hi)
    base_pairs = _pairs(winnow_overlap_incremental(shard, d, min_shared=1))
    victims = sorted({ia for (ia, _) in base_pairs if ia < boundary})
    assert victims
    delete_from_winnow_index(spark, d, victims[:1])
    after = _pairs(winnow_overlap_incremental(shard, d, min_shared=1))
    assert set(after) == {k for k in base_pairs if k[0] != victims[0]}
    st = {r["frame"]: r for r in compact_winnow_index(spark, d).collect()}
    assert st["fps"]["files_after"] <= st["fps"]["files_before"]
    # physical purge: the victim stays gone, everything else unchanged
    assert _pairs(winnow_overlap_incremental(shard, d, min_shared=1)) == after
    for bad_kwargs, msg in [
        (dict(min_shared=0), "min_shared"),
        (dict(max_df=1), "max_df"),
        (dict(update_index=True), "unique epoch"),
        (dict(update_index=True, epoch="base"), "reserved"),
    ]:
        with pytest.raises(ValueError, match=msg):
            winnow_overlap_incremental(shard, d, **bad_kwargs)
    # health surface: native readout + the unified dispatcher
    from bayesiandatafusion_jl_spark.functions.index_stats import (
        index_stats,
    )
    from bayesiandatafusion_jl_spark.functions.winnow_index import (
        winnow_index_stats,
    )

    (row,) = winnow_index_stats(spark, d).collect()
    assert row["n_docs"] > 0 and row["n_fps"] >= row["n_docs"]
    assert row["max_fp_df"] >= 1 and row["bucket_skew"] >= 1.0
    (norm,) = index_stats(spark, d).collect()
    assert norm["family"] == "winnow"
    assert norm["n_entries"] == row["n_fps"]
