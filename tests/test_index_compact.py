"""Epoch compaction of the persisted indexes: content preservation,
file-count reduction, probe invariance (incl. the partition-pruning
contract surviving the rewrite), and the folded-epoch replay guard."""

from __future__ import annotations

import re
import shutil

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.dedup_index import (
    dedup_incremental,
    write_signature_index,
)
from bayesiandatafusion_jl_spark.functions.index_compact import (
    compact_ivf_index,
    compact_signature_index,
    folded_epochs,
)
from bayesiandatafusion_jl_spark.functions.vector_index import (
    ann_ivf_query_index,
    write_ivf_index,
)
from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan
from tests.test_vector_index import _clustered


@pytest.fixture()
def ivf_dir(tmp_path):
    d = str(tmp_path / "ivf")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def sig_dir(tmp_path):
    d = str(tmp_path / "sig")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ivf_with_shards(spark, ivf_dir, n_shards=3):
    corpus = _clustered(spark)
    write_ivf_index(corpus, ivf_dir, n_cells=8, n_assign=2)
    for s in range(n_shards):
        shard = corpus.filter(F.col("vec_id") % 7 == s).select(
            (F.col("vec_id") + 1000 * (s + 1)).alias("vec_id"), "embedding"
        )
        write_ivf_index(
            shard, ivf_dir, n_cells=8, n_assign=2, mode="append",
            epoch=f"day-{s}",
        )
    return corpus


def _posting_rows(spark, ivf_dir):
    return {
        (r.cell_id, r.vec_id)
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("cell_id", "vec_id")
        .collect()
    }


def test_ivf_compact_preserves_content_and_cuts_files(spark, ivf_dir):
    _ivf_with_shards(spark, ivf_dir)
    before_rows = _posting_rows(spark, ivf_dir)
    files_before = len(spark.read.parquet(ivf_dir + "/postings").inputFiles())
    stats = compact_ivf_index(spark, ivf_dir).collect()[0]
    assert stats.epochs_folded == 4  # base + 3 shards
    assert _posting_rows(spark, ivf_dir) == before_rows
    files_after = len(spark.read.parquet(ivf_dir + "/postings").inputFiles())
    assert files_after < files_before, (files_before, files_after)
    # one live epoch remains
    epochs = {
        r["__epoch"]
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("__epoch")
        .distinct()
        .collect()
    }
    assert epochs == {"compact-0"}


def test_ivf_probe_invariant_and_still_pruned(spark, ivf_dir):
    corpus = _ivf_with_shards(spark, ivf_dir)
    q = corpus.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    before = {
        (r.qid, r.nb_id)
        for r in ann_ivf_query_index(q, ivf_dir, k=5, n_probe=3).collect()
    }
    compact_ivf_index(spark, ivf_dir)
    df = ann_ivf_query_index(q, ivf_dir, k=5, n_probe=3)
    after = {(r.qid, r.nb_id) for r in df.collect()}
    assert after == before
    # cell_id stays the outer partition level: the probe's static IN
    # partition filter must survive the rewrite
    plan = formatted_plan(df)
    assert re.search(r"PartitionFilters: \[cell_id#\d+ IN \(", plan), plan


def test_ivf_folded_epoch_replay_rejected_new_epoch_ok(spark, ivf_dir):
    corpus = _ivf_with_shards(spark, ivf_dir)
    compact_ivf_index(spark, ivf_dir)
    # vec_ids 3 and 4 are in NO day-shard (shards take vec_id % 7 in 0..2),
    # so their only exact copies will be the ones appended below
    shard = corpus.filter(F.col("vec_id").isin(3, 4)).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="folded into compact-0"):
        write_ivf_index(
            shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-1"
        )
    # reserved prefix rejected outright
    with pytest.raises(ValueError, match="reserved"):
        write_ivf_index(
            shard, ivf_dir, n_cells=8, n_assign=2, mode="append",
            epoch="compact-7",
        )
    # a genuinely new shard appends fine and is served
    write_ivf_index(
        shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-9"
    )
    q = corpus.filter(F.col("vec_id").isin(3, 4)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = ann_ivf_query_index(q, ivf_dir, k=1, n_probe=3).collect()
    assert {(r.qid, r.nb_id) for r in got} == {(3, 9003), (4, 9004)}


def test_ivf_second_compaction_bumps_generation(spark, ivf_dir):
    corpus = _ivf_with_shards(spark, ivf_dir)
    compact_ivf_index(spark, ivf_dir)
    shard = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    write_ivf_index(
        shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-9"
    )
    stats = compact_ivf_index(spark, ivf_dir).collect()[0]
    assert stats.epochs_folded == 2  # compact-0 + day-9
    epochs = {
        r["__epoch"]
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("__epoch")
        .distinct()
        .collect()
    }
    assert epochs == {"compact-1"}
    # ledger holds both folded shard epochs (compact-* outputs are internal
    # and never recorded — external appends can't use the prefix anyway)
    assert folded_epochs(spark, ivf_dir) == {
        "base": 0, "day-0": 0, "day-1": 0, "day-2": 0, "day-9": 1,
    }


def test_ivf_single_epoch_compaction_is_noop(spark, ivf_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, ivf_dir, n_cells=8, n_assign=2)
    before_files = set(spark.read.parquet(ivf_dir + "/postings").inputFiles())
    stats = compact_ivf_index(spark, ivf_dir).collect()[0]
    assert stats.epochs_folded == 0
    assert set(spark.read.parquet(ivf_dir + "/postings").inputFiles()) == before_files
    assert folded_epochs(spark, ivf_dir) == {}


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [
            (i, f"document number {i} with some shared boilerplate text "
                f"and unique payload token-{i} token-{i + 1} token-{i + 2}")
            for i in range(lo, hi)
        ],
        "doc_id long, text string",
    )


def test_sig_compact_preserves_probe_results(spark, sig_dir):
    write_signature_index(_docs(spark, 0, 60), sig_dir)
    write_signature_index(
        _docs(spark, 60, 90), sig_dir, mode="append", epoch="s1"
    )
    write_signature_index(
        _docs(spark, 90, 120), sig_dir, mode="append", epoch="s2"
    )
    # new shard = mutated copies of docs 0..9 → pairs must straddle into
    # the index identically before and after compaction
    new_shard = spark.createDataFrame(
        [
            (10_000 + i, f"document number {i} with some shared boilerplate "
                         f"text and unique payload token-{i} token-{i + 1} "
                         f"token-{i + 2}")
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    before = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(new_shard, sig_dir, jaccard_min=0.5).collect()
    }
    assert before, "probe found no pairs — fixture is vacuous"
    files_before = len(spark.read.parquet(sig_dir + "/buckets").inputFiles())
    stats = {r.frame: r for r in compact_signature_index(spark, sig_dir).collect()}
    assert stats["sigs"].epochs_folded == 3
    assert stats["buckets"].epochs_folded == 3
    after = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(new_shard, sig_dir, jaccard_min=0.5).collect()
    }
    assert after == before
    files_after = len(spark.read.parquet(sig_dir + "/buckets").inputFiles())
    assert files_after < files_before, (files_before, files_after)


def test_sig_update_index_replay_of_folded_epoch_rejected(spark, sig_dir):
    write_signature_index(_docs(spark, 0, 40), sig_dir)
    shard = _docs(spark, 40, 50)
    dedup_incremental(shard, sig_dir, update_index=True, epoch="s1")
    compact_signature_index(spark, sig_dir)
    with pytest.raises(ValueError, match="folded into compact-0"):
        dedup_incremental(shard, sig_dir, update_index=True, epoch="s1")
    with pytest.raises(ValueError, match="folded into compact-0"):
        write_signature_index(shard, sig_dir, mode="append", epoch="s1")
    # a NEW epoch still appends fine post-compaction
    dedup_incremental(
        _docs(spark, 50, 60), sig_dir, update_index=True, epoch="s2"
    )
    epochs = {
        r["__epoch"]
        for r in spark.read.parquet(sig_dir + "/sigs")
        .select("__epoch")
        .distinct()
        .collect()
    }
    assert epochs == {"compact-0", "s2"}


def test_fresh_build_resets_ledger(spark, ivf_dir):
    _ivf_with_shards(spark, ivf_dir, n_shards=1)
    compact_ivf_index(spark, ivf_dir)
    assert folded_epochs(spark, ivf_dir)
    # brand-new incarnation at the same path: old fold history must not
    # reject the new incarnation's epochs
    corpus = _clustered(spark)
    write_ivf_index(corpus, ivf_dir, n_cells=8, n_assign=2)
    assert folded_epochs(spark, ivf_dir) == {}
    shard = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 500).alias("vec_id"), "embedding"
    )
    write_ivf_index(
        shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-0"
    )


def test_refit_rebuilds_from_index_and_rebases_epochs(spark, ivf_dir):
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        refit_ivf_index,
    )

    corpus = _ivf_with_shards(spark, ivf_dir, n_shards=2)
    before_ids = {
        r.vec_id
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("vec_id")
        .distinct()
        .collect()
    }
    stats = refit_ivf_index(spark, ivf_dir).collect()[0]
    assert stats.n_vectors == len(before_ids)
    assert stats.epochs_rebased == 2  # day-0, day-1 (base is reused)
    after_ids = {
        r.vec_id
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert after_ids == before_ids
    # everything now lives in the fresh base epoch
    epochs = {
        r["__epoch"]
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("__epoch")
        .distinct()
        .collect()
    }
    assert epochs == {"base"}
    # pre-refit shard epochs are rebased into the ledger: replays rejected
    assert set(folded_epochs(spark, ivf_dir)) == {"day-0", "day-1"}
    shard = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 500).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="folded into"):
        write_ivf_index(
            shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-0"
        )
    # and the rebuilt index still serves queries
    q = corpus.filter(F.col("vec_id").isin(3, 4)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    assert ann_ivf_query_index(q, ivf_dir, k=3, n_probe=4).count() > 0


def test_refit_crash_before_rebuild_still_rejects_replays(
    spark, ivf_dir, monkeypatch
):
    """Crash-ordering contract (r12): the rebased-epoch ledger is written
    BEFORE the postings rebuild, so a crash between the two leaves old
    shard replays REJECTED (spurious rejection — the conservative
    direction), never silently duplicated into the rebuilt base."""
    import pyspark.sql.readwriter as rw

    from bayesiandatafusion_jl_spark.functions.vector_index import (
        refit_ivf_index,
    )

    corpus = _ivf_with_shards(spark, ivf_dir, n_shards=2)
    orig = rw.DataFrameWriter.parquet

    def boom(self, path, **kw):
        if path.rstrip("/").endswith("postings"):
            raise RuntimeError("injected crash before the postings rebuild")
        return orig(self, path, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        refit_ivf_index(spark, ivf_dir)
    monkeypatch.setattr(rw.DataFrameWriter, "parquet", orig)
    # the ledger already names the rebased epochs: a replayed old shard
    # is refused even though the rebuild never completed
    assert set(folded_epochs(spark, ivf_dir)) == {"day-0", "day-1"}
    shard = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 900).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="folded into"):
        write_ivf_index(
            shard, ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="day-0"
        )


def test_refit_unsticks_drift_guard(spark, ivf_dir):
    """The full lifecycle the drift guard prescribes: a drifted shard is
    warned in, the NEXT drifted shard refuses under the old quantizer,
    refit re-centers on the index's current data, and the follow-up
    drifted shard then passes the guard."""
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        refit_ivf_index,
    )
    from tests.test_vector_index import _drifted_shard

    corpus = _clustered(spark)
    write_ivf_index(corpus, ivf_dir, n_cells=8, n_assign=2)
    with pytest.warns(UserWarning, match="drift guard"):
        write_ivf_index(
            _drifted_shard(spark, n=120), ivf_dir, n_cells=8, n_assign=2,
            mode="append", epoch="d1", on_drift="warn",
        )
    with pytest.raises(ValueError, match="drift guard"):
        write_ivf_index(
            _drifted_shard(spark, n=30).select(
                (F.col("vec_id") + 100).alias("vec_id"), "embedding"
            ),
            ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="d2",
        )
    refit_ivf_index(spark, ivf_dir)
    write_ivf_index(
        _drifted_shard(spark, n=30).select(
            (F.col("vec_id") + 100).alias("vec_id"), "embedding"
        ),
        ivf_dir, n_cells=8, n_assign=2, mode="append", epoch="d2",
    )


def test_ivf_compaction_purges_tombstones_physically(spark, ivf_dir):
    """r13: compaction is the free moment for the physical delete — after
    build → delete → compact, the victims' rows are GONE from the
    postings (not just masked), the tombstone set is cleared, probes are
    unchanged, and stats stop counting the deleted vectors."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        delete_from_ivf_index,
        ivf_index_stats,
    )

    corpus = _ivf_with_shards(spark, ivf_dir)
    # 0 and 5 live in the base epoch; 1007 in shard day-0 (vec_id%7==0 → +1000)
    victims = [0, 5, 1007]
    delete_from_ivf_index(spark, ivf_dir, victims)
    q = corpus.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    before = {
        (r.qid, r.nb_id)
        for r in ann_ivf_query_index(q, ivf_dir, k=5, n_probe=3).collect()
    }
    n_before = ivf_index_stats(spark, ivf_dir).collect()[0]["n_postings"]
    compact_ivf_index(spark, ivf_dir)
    assert not has_tombstones(spark, ivf_dir)
    live_ids = {
        r.vec_id
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert not (set(victims) & live_ids)
    after = {
        (r.qid, r.nb_id)
        for r in ann_ivf_query_index(q, ivf_dir, k=5, n_probe=3).collect()
    }
    assert after == before
    n_after = ivf_index_stats(spark, ivf_dir).collect()[0]["n_postings"]
    assert n_after == n_before - len(victims) * 2  # n_assign=2


def test_ivf_single_epoch_purge_still_rewrites_and_folds(spark, ivf_dir):
    """A purge forces the rewrite even with one epoch, and that epoch is
    folded — replaying it would resurrect the purged rows."""
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        delete_from_ivf_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, ivf_dir, n_cells=8, n_assign=2)
    delete_from_ivf_index(spark, ivf_dir, [1])
    compact_ivf_index(spark, ivf_dir)
    assert 1 not in {
        r.vec_id
        for r in spark.read.parquet(ivf_dir + "/postings")
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert "base" in folded_epochs(spark, ivf_dir)
    # replaying the folded epoch stays rejected (the unique-epoch rail
    # fires first for 'base'; the ledger entry above covers named shards)
    with pytest.raises(ValueError):
        write_ivf_index(
            corpus, ivf_dir, n_cells=8, n_assign=2, mode="append",
            epoch="base",
        )


def test_sig_compaction_purges_tombstones_and_unblocks_id_reuse(
    spark, sig_dir
):
    """After purge-at-compaction both frames drop the victims, the
    tombstones clear, and — the workflow unlock — a RE-USED doc_id can be
    appended and is visible again (pre-r13 that required a full
    rebuild)."""
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        delete_from_signature_index,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )

    write_signature_index(_docs(spark, 0, 60), sig_dir)
    write_signature_index(
        _docs(spark, 60, 90), sig_dir, mode="append", epoch="s1"
    )
    probe = spark.createDataFrame(
        [
            (10_000 + i, f"document number {i} with some shared boilerplate "
                         f"text and unique payload token-{i} token-{i + 1} "
                         f"token-{i + 2}")
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    delete_from_signature_index(spark, sig_dir, [3, 70])
    before = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(probe, sig_dir, jaccard_min=0.5).collect()
    }
    assert before and not any(b in (3, 70) for _, b in before)
    compact_signature_index(spark, sig_dir)
    assert not has_tombstones(spark, sig_dir)
    for frame in ("sigs", "buckets"):
        ids = {
            r.doc_id
            for r in spark.read.parquet(f"{sig_dir}/{frame}")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert not ({3, 70} & ids), frame
    after = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(probe, sig_dir, jaccard_min=0.5).collect()
    }
    assert after == before
    # doc_id 3 re-ingested under a new epoch is a visible partner again
    write_signature_index(
        _docs(spark, 3, 4), sig_dir, mode="append", epoch="reuse"
    )
    reused = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental(probe, sig_dir, jaccard_min=0.5).collect()
    }
    assert any(b == 3 for _, b in reused)


def test_vacuum_store_reclaims_crashed_tmp_dirs(spark, tmp_path, monkeypatch):
    """r15 (VERDICT #8): a compaction killed between the tmp write and
    the directory swap leaves a ``.__compact_tmp`` sibling that only the
    next same-dataset compaction would overwrite; vacuum_store must
    reclaim it (and crashed-write ``_temporary`` residue) while leaving
    every ledgered directory intact — probes identical before/after."""
    import os

    from bayesiandatafusion_jl_spark.functions import index_compact
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        vacuum_store,
    )
    from bayesiandatafusion_jl_spark.functions.setsim_index import (
        compact_setsim_index,
        setsim_incremental,
        write_setsim_index,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 150)
    )
    d = str(tmp_path / "vac_setsim")
    write_setsim_index(docs.filter(F.col("doc_id") < 100), d)
    shard = docs.filter(F.col("doc_id") >= 100)
    setsim_incremental(shard, d, tau=0.5, update_index=True, epoch="s1")
    probe = lambda: sorted(  # noqa: E731
        map(tuple, setsim_incremental(shard.limit(20), d, tau=0.5).collect())
    )
    before = probe()

    real_swap = index_compact._swap_dir

    def dying_swap(spark_, tmp, final):
        raise IOError("killed before the swap")

    monkeypatch.setattr(index_compact, "_swap_dir", dying_swap)
    with pytest.raises(IOError, match="killed before"):
        compact_setsim_index(spark, d)
    monkeypatch.undo()
    assert os.path.isdir(f"{d}/tokens.__compact_tmp")
    # plant crashed-write residue too — at the dataset root AND at an
    # epoch-targeted write's directory (the pipeline-shards shape, which
    # a one-level probe would miss)
    os.makedirs(f"{d}/tokens/_temporary/0", exist_ok=True)
    os.makedirs(f"{d}/tokens/tok_bucket=0/__epoch=s1/_temporary/0",
                exist_ok=True)

    rows = {r["path"]: r["bytes"] for r in vacuum_store(spark, d).collect()}
    assert set(rows) == {
        "tokens.__compact_tmp",
        "tokens/_temporary",
        "tokens/tok_bucket=0/__epoch=s1/_temporary",
    }
    assert not os.path.isdir(f"{d}/tokens.__compact_tmp")
    assert not os.path.isdir(f"{d}/tokens/_temporary")
    assert not os.path.isdir(f"{d}/tokens/tok_bucket=0/__epoch=s1/_temporary")
    assert probe() == before
    # a healthy store vacuums to an empty frame, and the interrupted
    # compaction still completes afterwards (the real swap is restored)
    assert index_compact._swap_dir is real_swap
    assert vacuum_store(spark, d).count() == 0
    compact_setsim_index(spark, d)
    assert probe() == before
