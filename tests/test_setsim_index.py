"""Exact incremental set-similarity index (functions/setsim_index.py) —
the lifecycle gates the DuckDB oracle can't cover: one-shot equality at
every split, replay idempotence, cross-epoch probing, tombstones,
unseen-vocabulary ranking, and compaction invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.setsim_index import (
    compact_setsim_index,
    delete_from_setsim_index,
    setsim_incremental,
    setsim_index_stats,
    write_setsim_index,
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
        (r["id_a"], r["id_b"]): (r["overlap"], r["jaccard"], r["pair_type"])
        for r in df.collect()
    }


def _oneshot(spark, hi, boundary, tau):
    """One-shot exact join over [0, hi), restricted to pairs touching
    the shard [boundary, hi) — the ground truth the incremental path
    must equal exactly."""
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    ref = set_similarity_join(_docs(spark, 0, hi), tau=tau, id_col="doc_id")
    return {
        (r["id_a"], r["id_b"]): (r["overlap"], r["jaccard"])
        for r in ref.filter(F.col("id_b") >= boundary).collect()
    }


def test_incremental_equals_oneshot_join(spark, tmp_path):
    """Boundary-straddling recall ≡ the one-shot join (VERDICT r14 #5's
    done-condition), pair types labeled by which side of the epoch
    boundary each partner sits on."""
    tau, boundary, hi = 0.5, 200, 300
    d = str(tmp_path / "setsim")
    write_setsim_index(_docs(spark, 0, boundary), d)
    got = _pairs(setsim_incremental(_docs(spark, boundary, hi), d, tau=tau))
    want = _oneshot(spark, hi, boundary, tau)
    assert {k: v[:2] for k, v in got.items()} == want
    assert len(got) > 0
    for (ia, ib), (_, _, pt) in got.items():
        assert pt == ("new_index" if ia < boundary else "new_new")


def test_append_replay_idempotent_and_cross_epoch(spark, tmp_path):
    """update_index appends are replay-idempotent (a re-run shard
    reproduces the SAME pairs and never duplicates index rows), and a
    LATER shard pairs against an appended epoch's docs — the index is
    cumulative, not base-only."""
    tau, b1, b2, hi = 0.5, 150, 220, 300
    d = str(tmp_path / "setsim_app")
    write_setsim_index(_docs(spark, 0, b1), d)
    s1 = _docs(spark, b1, b2)
    first = _pairs(
        setsim_incremental(s1, d, tau=tau, update_index=True, epoch="s1")
    )
    rows_after_first = (
        spark.read.parquet(f"{d}/tokens").count()
    )
    # replay the SAME shard (crash-retry): identical pairs, no dup rows
    replay = _pairs(
        setsim_incremental(s1, d, tau=tau, update_index=True, epoch="s1")
    )
    assert replay == first
    assert spark.read.parquet(f"{d}/tokens").count() == rows_after_first
    # the second shard must see s1's docs as index partners
    second = _pairs(
        setsim_incremental(_docs(spark, b2, hi), d, tau=tau)
    )
    want = _oneshot(spark, hi, b2, tau)
    assert {k: v[:2] for k, v in second.items()} == want
    straddlers = [
        (ia, ib) for (ia, ib) in second if b1 <= ia < b2
    ]
    # the sf0.001 corpus plants near-dup families across the id range;
    # at least one partner must come from the APPENDED epoch
    assert straddlers, "no pair straddles the appended epoch"
    # increasing-id appends equal the one-shot rule end-to-end: the
    # union of both probes is exactly the one-shot pairs touching >= b1
    combined = {k: v[:2] for k, v in {**first, **second}.items()}
    assert combined == _oneshot(spark, hi, b1, tau)


def test_tombstoned_docs_stop_pairing(spark, tmp_path):
    tau, boundary, hi = 0.5, 200, 300
    d = str(tmp_path / "setsim_del")
    write_setsim_index(_docs(spark, 0, boundary), d)
    base_pairs = _pairs(
        setsim_incremental(_docs(spark, boundary, hi), d, tau=tau)
    )
    victims = sorted({ia for (ia, _) in base_pairs if ia < boundary})
    assert victims, "need at least one cross pair to delete"
    delete_from_setsim_index(spark, d, victims[:1])
    after = _pairs(setsim_incremental(_docs(spark, boundary, hi), d, tau=tau))
    assert all(ia != victims[0] for (ia, _) in after)
    assert set(after) == {
        k for k in base_pairs if k[0] != victims[0]
    }


def test_unseen_vocabulary_ranks_exactly(spark, tmp_path):
    """A shard whose twins use vocabulary ABSENT from the frozen order
    (freq null -> 0) must still pair exactly — the frozen-order contract
    says unseen tokens cost nothing but candidate efficiency."""
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    shard = spark.createDataFrame(
        [
            # exact twin of doc 1 -> jaccard 1.0
            (10, "alpha beta gamma delta epsilon zeta"),
            # entirely NEW vocabulary, twinned within the shard
            (11, "qqa qqb qqc qqd qqe"),
            (12, "qqa qqb qqc qqd qqf"),
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "setsim_unseen")
    write_setsim_index(base, d)
    got = _pairs(setsim_incremental(shard, d, tau=0.5))
    assert set(got) == {(1, 10), (11, 12)}
    assert got[(1, 10)][1] == 1.0 and got[(1, 10)][2] == "new_index"
    assert got[(11, 12)] == (4, round(4 / 6, 6), "new_new")


def test_compaction_preserves_pairs_and_prunes_files(spark, tmp_path):
    tau, b1, b2, hi = 0.5, 150, 220, 300
    d = str(tmp_path / "setsim_cmp")
    write_setsim_index(_docs(spark, 0, b1), d)
    setsim_incremental(
        _docs(spark, b1, b2), d, tau=tau, update_index=True, epoch="s1"
    )
    before = _pairs(setsim_incremental(_docs(spark, b2, hi), d, tau=tau))
    st = {r["frame"]: r for r in compact_setsim_index(spark, d).collect()}
    assert st["tokens"]["files_after"] <= st["tokens"]["files_before"]
    after = _pairs(setsim_incremental(_docs(spark, b2, hi), d, tau=tau))
    assert after == before
    # folded epoch replay is rejected, not resurrected
    with pytest.raises(ValueError, match="folded"):
        setsim_incremental(
            _docs(spark, b1, b2), d, tau=tau, update_index=True, epoch="s1"
        )


def test_guards_and_stats(spark, tmp_path):
    d = str(tmp_path / "setsim_guard")
    base = _docs(spark, 0, 100)
    write_setsim_index(base, d)
    shard = _docs(spark, 100, 130)
    with pytest.raises(ValueError, match="tau"):
        setsim_incremental(shard, d, tau=0.0)
    with pytest.raises(ValueError, match="unique epoch"):
        setsim_incremental(shard, d, tau=0.5, update_index=True)
    with pytest.raises(ValueError, match="reserved"):
        setsim_incremental(
            shard, d, tau=0.5, update_index=True, epoch="base"
        )
    (row,) = setsim_index_stats(spark, d).collect()
    assert row["n_docs"] > 0 and row["n_tokens"] >= row["n_docs"]
    assert row["vocab"] > 0 and row["n_epochs"] == 1
    assert row["bucket_skew"] >= 1.0
    # the unified dispatcher recognizes the family
    from bayesiandatafusion_jl_spark.functions.index_stats import (
        index_stats,
    )

    (norm,) = index_stats(spark, d).collect()
    assert norm["family"] == "setsim"
    assert norm["n_entries"] == row["n_tokens"]


def test_append_refuses_live_id_collision(spark, tmp_path):
    """r15 review: a shard doc_id already LIVE under another epoch
    (upstream redelivery) must refuse loudly on append — silently
    appending would merge token sets across epochs on later probes. A
    same-epoch replay stays allowed, and a probe-only call with a
    colliding id scores each pair kind against its own side's sets
    (one row per pair, no fan-out)."""
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "setsim_clash")
    write_setsim_index(base, d)
    shard = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta theta")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="already indexed"):
        setsim_incremental(shard, d, tau=0.5, update_index=True, epoch="s1")
    # probe-only with the colliding id: the self-pair (1,1) is excluded
    # by contract, and the (1,2) pair appears EXACTLY ONCE, scored
    # against stored doc 2 (no fan-out from doc 1's two copies)
    rows = setsim_incremental(shard, d, tau=0.5).collect()
    got = [(r["id_a"], r["id_b"], r["jaccard"], r["pair_type"]) for r in rows]
    assert got == [(1, 2, 0.75, "new_index")]
    # a fresh (non-colliding) id appends fine, and a REPLAY of that same
    # epoch is still allowed (the replay guard excludes its own epoch)
    ok = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    setsim_incremental(ok, d, tau=0.5, update_index=True, epoch="s1")
    setsim_incremental(ok, d, tau=0.5, update_index=True, epoch="s1")
