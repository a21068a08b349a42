"""Incremental near-dup against the persisted signature index: twin
recall where the twins STRADDLE the index/new-shard boundary, the
banding-mismatch guard, index append, and the no-recompute plan contract
(the old side of every join is a parquet scan of the index — the old
corpus's text never re-read, its signatures never recomputed)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.dedup_index import (
    dedup_incremental,
    write_signature_index,
)
from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan


@pytest.fixture()
def index_dir(tmp_path):
    d = str(tmp_path / "sig_index")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, ids, mutate=()):
    # distinctive long docs so random pairs share no 3-shingles
    rows = []
    for i in ids:
        toks = [f"tok{i}w{j}" for j in range(30)]
        if i in mutate:
            toks = toks[1:]  # drop first token → near-dup twin
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundary_straddling_twin_recall(spark, index_dir):
    # index holds docs 0..19; new shard holds twins of 5 docs (ids+1000,
    # first token dropped) plus 5 genuinely fresh docs
    old = _corpus(spark, range(20))
    write_signature_index(old, index_dir)
    twin_ids = [0, 3, 7, 11, 19]
    twins = _corpus(spark, twin_ids, mutate=twin_ids).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    fresh = _corpus(spark, range(500, 505))
    pairs = dedup_incremental(twins.unionByName(fresh), index_dir).collect()
    cross = {(r.doc_a, r.doc_b) for r in pairs if r.pair_type == "new_index"}
    # every planted twin pair crosses the boundary and must be found
    assert {(t + 1000, t) for t in twin_ids} <= cross
    # fresh docs must not pair with anything
    assert not any(r.doc_a >= 500 and r.doc_a < 1000 for r in pairs)
    # estimator sanity: twins share 27/29 shingles → est well above 0.5
    assert all(r.jaccard_est >= 0.5 for r in pairs)


def test_intra_shard_pairs_found(spark, index_dir):
    write_signature_index(_corpus(spark, range(10)), index_dir)
    # the new shard itself contains an identical pair (200, 201)
    a = _corpus(spark, [200])
    b = a.select(F.lit(201).cast("long").alias("doc_id"), "text")
    pairs = dedup_incremental(a.unionByName(b), index_dir).collect()
    assert {(r.doc_a, r.doc_b, r.pair_type) for r in pairs} == {
        (200, 201, "new_new")
    }
    assert pairs[0].jaccard_est == 1.0


def test_banding_mismatch_rejected(spark, index_dir):
    write_signature_index(_corpus(spark, range(5)), index_dir)
    with pytest.raises(ValueError, match="band hashes would disagree"):
        dedup_incremental(
            _corpus(spark, [100]), index_dir,
            n_hashes=32, n_bands=16, rows_per_band=2,
        )
    with pytest.raises(ValueError, match="band hashes would disagree"):
        write_signature_index(
            _corpus(spark, [100]), index_dir, shingle_k=5, mode="append",
            epoch="s1",
        )


def test_update_index_appends_probed_shard(spark, index_dir):
    write_signature_index(_corpus(spark, range(10)), index_dir)
    shard1 = _corpus(spark, [100])
    dedup_incremental(shard1, index_dir, update_index=True, epoch="s1").collect()
    # a later twin of doc 100 must now hit the index
    twin = _corpus(spark, [100], mutate=[100]).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    pairs = dedup_incremental(twin, index_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1100, 100)}
    assert pairs[0].pair_type == "new_index"
    # epoch is required for appends — silent duplication is not an option
    with pytest.raises(ValueError, match="unique epoch"):
        dedup_incremental(shard1, index_dir, update_index=True)


def test_replayed_epoch_does_not_duplicate_index_rows(spark, index_dir):
    write_signature_index(_corpus(spark, range(5)), index_dir)
    shard = _corpus(spark, [100, 101])
    # same shard + same epoch twice = replay; index must hold it ONCE
    for _ in range(2):
        dedup_incremental(shard, index_dir, update_index=True, epoch="s1").collect()
    sigs = spark.read.parquet(f"{index_dir}/sigs").select("doc_id")
    assert sigs.count() == 7  # 5 base + 2 shard, no duplicates
    # and a future twin of a replayed doc pairs exactly once
    twin = _corpus(spark, [100], mutate=[100]).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    pairs = dedup_incremental(twin, index_dir).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1100, 100)]


def test_fresh_build_wipes_under_dynamic_session_default(spark, index_dir):
    """ADVICE r8: a session configured with partitionOverwriteMode=dynamic
    must not turn a fresh rebuild into a partial overwrite that leaves
    ghost __epoch partitions from pre-rebuild appends."""
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "dynamic")
    try:
        write_signature_index(_corpus(spark, range(5)), index_dir)
        dedup_incremental(
            _corpus(spark, [100]), index_dir, update_index=True, epoch="s1"
        ).collect()
        # fresh rebuild with a smaller corpus: epoch s1 must be GONE
        write_signature_index(_corpus(spark, range(3)), index_dir)
        ids = {
            r.doc_id
            for r in spark.read.parquet(f"{index_dir}/sigs").select("doc_id").collect()
        }
        assert ids == {0, 1, 2}, ids
    finally:
        spark.conf.set(conf_key, prev)


def test_replay_reproduces_original_pair_set(spark, index_dir):
    """Crash-after-index-append replay (ADVICE r8): the first attempt
    appended epoch s1 to the index but 'crashed' before its pairs were
    consumed; the replay probes an index that already holds the shard's
    OWN signatures. Excluding __epoch == s1 from the probe scans means the
    replay emits exactly the clean run's pairs — the intra-shard dup stays
    one new_new pair instead of additionally surfacing as new_index in
    both orientations."""
    write_signature_index(_corpus(spark, range(5)), index_dir)
    a = _corpus(spark, [200])
    shard = a.unionByName(
        a.select(F.lit(201).cast("long").alias("doc_id"), "text")
    )
    first = dedup_incremental(
        shard, index_dir, update_index=True, epoch="s1"
    ).collect()  # attempt 1: index append happened, pretend the sink write died
    replay = dedup_incremental(
        shard, index_dir, update_index=True, epoch="s1"
    ).collect()
    key = lambda rows: sorted((r.doc_a, r.doc_b, r.pair_type) for r in rows)
    assert key(first) == key(replay) == [(200, 201, "new_new")]


def test_plan_never_recomputes_old_signatures(spark, index_dir):
    write_signature_index(_corpus(spark, range(10)), index_dir)
    new = _corpus(spark, [100])
    plan = formatted_plan(dedup_incremental(new, index_dir))
    # every parquet scan in the probe plan reads the INDEX, not a corpus
    scans = [l for l in plan.splitlines() if "Location" in l]
    assert scans, "expected index parquet scans in the plan"
    assert all("sig_index" in l for l in scans), plan
    # and the old side carries no shingle/minhash recompute: the only
    # xxhash64 calls in the plan hash the NEW shard's shingles/bands
    assert "collect_set" not in plan


def test_signature_index_stats_reports_health(spark, index_dir):
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        signature_index_stats,
    )

    write_signature_index(_corpus(spark, range(15)), index_dir)
    write_signature_index(
        _corpus(spark, range(100, 105)), index_dir, mode="append", epoch="s1"
    )
    row = signature_index_stats(spark, index_dir).collect()[0]
    assert row["n_docs"] == 20 and row["n_epochs"] == 2
    assert row["n_files"] >= 2 and row["n_buckets_used"] > 0
    # distinctive corpora: no shared shingles, so every (band,bucket) is
    # near-singleton — skew sits at/near 1
    assert 1.0 <= row["bucket_skew"] <= 2.0
    buckets = spark.read.parquet(f"{index_dir}/buckets")
    per = buckets.groupBy("band", "bucket").count().collect()
    assert row["max_bucket"] == max(r["count"] for r in per)


def test_signature_tombstones_hide_deleted_partners(spark, index_dir):
    """Right-to-be-forgotten on the dedup index: a tombstoned doc stops
    appearing as a new_index pair partner immediately; other partners
    and intra-shard pairs are unaffected; a fresh build clears the set."""
    import os

    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        delete_from_signature_index,
    )

    write_signature_index(_corpus(spark, range(10)), index_dir)
    # twins of indexed docs 3 and 7 arrive as a probe shard
    shard = _corpus(spark, [3, 7], mutate=[3, 7]).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    before = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(shard, index_dir).collect()
    }
    assert (1003, 3) in before and (1007, 7) in before
    delete_from_signature_index(spark, index_dir, [3])
    delete_from_signature_index(spark, index_dir, [3])  # idempotent
    after = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(shard, index_dir).collect()
    }
    assert not any(b == 3 for _, b in after)
    assert (1007, 7) in after  # untouched partner unaffected
    # fresh rebuild over the retained corpus clears the tombstones
    write_signature_index(_corpus(spark, [i for i in range(10) if i != 3]), index_dir)
    assert not os.path.exists(f"{index_dir}/tombstones")
