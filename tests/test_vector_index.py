"""Persisted IVF index: recall vs brute force on a clustered corpus,
partition-pruned probe scans (the plan must read ONLY probed cell
directories), incremental shard append under stored centers, and the
meta mismatch guard."""

from __future__ import annotations

import math
import shutil

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.vector import knn_topk
from bayesiandatafusion_jl_spark.functions.vector_index import (
    ann_ivf_query_index,
    write_ivf_index,
)
from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan


@pytest.fixture()
def index_dir(tmp_path):
    d = str(tmp_path / "ivf")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _clustered(spark, n_clusters=4, per_cluster=40, dim=8):
    """Unit-norm vectors in tight clusters around orthant axes — real
    cluster structure so IVF pruning is meaningful."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = np.zeros(dim)
        base[c % dim] = 1.0
        for _ in range(per_cluster):
            v = base + rng.normal(0, 0.05, dim)
            v = v / math.sqrt(float((v * v).sum()))
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_index_recall_matches_brute_force(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    q = corpus.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {
        (r.qid, r.nb_id) for r in knn_topk(corpus, q, k=5).collect()
    }
    got = {
        (r.qid, r.nb_id)
        for r in ann_ivf_query_index(q, index_dir, k=5, n_probe=4).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_probe_scan_is_partition_pruned(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=1)
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    df = ann_ivf_query_index(q, index_dir, k=3, n_probe=2)
    plan = formatted_plan(df)
    # the postings scan must carry a STATIC cell_id partition filter whose
    # IN-list is the probed cells: with n_probe=2 only 2 of 8 cell
    # directories are ever listed, let alone read
    import re

    m = re.search(r"PartitionFilters: \[cell_id#\d+ IN \(([\d,\s]+)\)", plan)
    assert m, f"no static cell_id IN partition filter:\n{plan}"
    probed = [c.strip() for c in m.group(1).split(",")]
    assert len(probed) <= 2, probed


def test_append_shard_under_stored_centers(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    # new shard: near-copies of vectors 0..4, ids offset by 1000
    shard = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    write_ivf_index(
        shard, index_dir, n_cells=8, n_assign=2, mode="append", epoch="day1"
    )
    q = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = ann_ivf_query_index(q, index_dir, k=1, n_probe=3).collect()
    # each query's top hit is its appended exact copy (score 1.0)
    assert {(r.qid, r.nb_id) for r in got} == {(i, i + 1000) for i in range(5)}
    assert all(r.score == 1.0 for r in got)


def test_append_replay_is_idempotent(spark, index_dir):
    """A replayed shard append (same epoch) must REPLACE its earlier
    postings, not duplicate them — the ADVICE r8 finding. Verified at the
    storage level (row count over the raw postings parquet), not via the
    query path, because dropDuplicates in the query would mask dups."""
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    shard = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    for _ in range(2):  # original attempt + replay
        write_ivf_index(
            shard, index_dir, n_cells=8, n_assign=2, mode="append", epoch="day1"
        )
    postings = spark.read.parquet(index_dir + "/postings")
    n_shard = postings.filter(F.col("vec_id") >= 1000).count()
    assert n_shard == 5 * 2, n_shard  # n_assign=2 cells per vector, once each


def test_append_requires_unique_epoch(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    with pytest.raises(ValueError, match="unique epoch"):
        write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, mode="append")


def test_append_meta_mismatch_rejected(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    with pytest.raises(ValueError, match="request asked for"):
        write_ivf_index(
            corpus, index_dir, n_cells=16, n_assign=2, mode="append", epoch="d1"
        )


def _drifted_shard(spark, dim=8, n=30):
    """Unit vectors concentrated in a direction the clustered corpus never
    occupies (equal negative weight on every axis) — far from every fitted
    centroid, so mean best-cell cosine collapses."""
    import math as m

    v = [-1.0 / m.sqrt(dim)] * dim
    return spark.createDataFrame(
        [(2000 + i, v) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_append_drift_guard_rejects_drifted_shard(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    with pytest.raises(ValueError, match="drift guard"):
        write_ivf_index(
            _drifted_shard(spark),
            index_dir,
            n_cells=8,
            n_assign=2,
            mode="append",
            epoch="d1",
        )


def test_append_drift_guard_warn_mode_appends(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    shard = _drifted_shard(spark)
    with pytest.warns(UserWarning, match="drift guard"):
        write_ivf_index(
            shard,
            index_dir,
            n_cells=8,
            n_assign=2,
            mode="append",
            epoch="d1",
            on_drift="warn",
        )
    postings = spark.read.parquet(index_dir + "/postings")
    assert postings.filter(F.col("vec_id") >= 2000).count() > 0


def test_append_in_distribution_shard_passes_guard(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    shard = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    # in-distribution shard sails through with the default error mode
    write_ivf_index(
        shard, index_dir, n_cells=8, n_assign=2, mode="append", epoch="d1"
    )
    postings = spark.read.parquet(index_dir + "/postings")
    assert postings.filter(F.col("vec_id") >= 1000).count() == 10


# ---------------------------------------------------------------- IVF-PQ


def test_pq_index_recall_and_code_shape(spark, index_dir):
    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4, pq_ksub=32)
    posts = spark.read.parquet(f"{index_dir}/postings")
    assert "pq_code" in posts.columns
    codes = posts.select("pq_code").collect()
    assert all(len(r["pq_code"]) == 4 for r in codes)
    assert all(0 <= c < 32 for r in codes for c in r["pq_code"])
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )

    q = corpus.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {(r.qid, r.nb_id) for r in knn_topk(corpus, q, k=5).collect()}
    got = {
        (r.qid, r.nb_id)
        for r in ann_ivfpq_query_index(
            q, index_dir, k=5, n_probe=4, refine=4
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_pq_probe_reads_codes_only(spark, index_dir):
    """The ADC candidate scan must project (cell_id, vec_id, pq_code) —
    the embedding column pruned out of ReadSchema — and keep the
    cell_id partition filter. refine=0 isolates the ADC leg (the exact
    re-rank leg is the one place embeddings are legitimately read)."""
    import re

    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=1, pq_m=4, pq_ksub=32)
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    plan = formatted_plan(ann_ivfpq_query_index(q, index_dir, k=3, n_probe=2, refine=0))
    # each detail section after "Scan parquet" carries Location/ReadSchema
    # lines; pick the sections whose Location is the postings dataset
    scans = [
        s
        for s in plan.split("Scan parquet")[1:]
        if re.search(r"Location:.*postings", s)
    ]
    assert scans, plan
    for s in scans:
        schema = re.search(r"ReadSchema: ([^\n]+)", s)
        assert schema and "embedding" not in schema.group(1), s[:500]
    assert re.search(r"PartitionFilters: \[cell_id#\d+ IN \(", plan), plan


def test_pq_append_encodes_shard_and_rejects_pq_param(spark, index_dir):
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4, pq_ksub=32)
    shard = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="fresh-build"):
        write_ivf_index(
            shard, index_dir, n_cells=8, mode="append", epoch="s1", pq_m=4
        )
    write_ivf_index(shard, index_dir, n_cells=8, mode="append", epoch="s1")
    posts = spark.read.parquet(f"{index_dir}/postings")
    appended = posts.filter(F.col("vec_id") >= 1000).collect()
    assert appended and all(len(r["pq_code"]) == 4 for r in appended)
    # a near-copy's top-1 neighbor through the ADC+refine path is its twin
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    top = ann_ivfpq_query_index(q, index_dir, k=1, n_probe=4, refine=4).collect()
    assert top[0]["nb_id"] == 1000


def test_refit_preserves_pq(spark, index_dir):
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
        refit_ivf_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4, pq_ksub=32)
    stats = refit_ivf_index(spark, index_dir).collect()[0]
    assert stats["n_vectors"] == corpus.count()
    meta = read_meta(spark, f"{index_dir}/meta").asDict()
    assert meta["pq_m"] == 4 and meta["pq_ksub"] == 32
    posts = spark.read.parquet(f"{index_dir}/postings")
    assert "pq_code" in posts.columns
    q = corpus.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {(r.qid, r.nb_id) for r in knn_topk(corpus, q, k=5).collect()}
    got = {
        (r.qid, r.nb_id)
        for r in ann_ivfpq_query_index(
            q, index_dir, k=5, n_probe=4, refine=4
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_non_pq_rebuild_clears_stale_codebooks(spark, index_dir):
    import os

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, pq_m=4, pq_ksub=32)
    assert os.path.isdir(f"{index_dir}/codebooks")
    write_ivf_index(corpus, index_dir, n_cells=8)  # fresh build, no PQ
    assert not os.path.isdir(f"{index_dir}/codebooks")
    posts = spark.read.parquet(f"{index_dir}/postings")
    assert "pq_code" not in posts.columns


def test_ivf_index_stats_reports_health(spark, index_dir):
    """The stats row matches ground truth computed independently, and
    the stats scan never reads the embedding bytes (codes/ids only)."""
    import re

    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ivf_index_stats,
    )
    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    shard = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    write_ivf_index(
        shard, index_dir, n_cells=8, n_assign=2, mode="append", epoch="s1"
    )
    row = ivf_index_stats(spark, index_dir).collect()[0]
    posts = spark.read.parquet(f"{index_dir}/postings")
    assert row["n_postings"] == posts.count()  # n_assign-fold entries
    assert row["n_epochs"] == 2 and row["n_cells"] == 8
    assert 1 <= row["n_cells_used"] <= 8
    per_cell = posts.groupBy("cell_id").count().collect()
    mx = max(r["count"] for r in per_cell)
    assert row["max_cell"] == mx
    assert row["imbalance"] >= 1.0
    assert row["assign_ppm"] > 0
    # embedding column pruned out of the stats scan
    plan = formatted_plan(
        spark.read.parquet(f"{index_dir}/postings")
        .select("cell_id", "vec_id", "__epoch")
        .groupBy("cell_id")
        .count()
    )
    schema = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert schema and "embedding" not in schema.group(1)


def test_pq_refine_semijoin_fallback_is_identical(spark, index_dir, monkeypatch):
    """Above the IN-literal threshold the shortlist re-read switches to a
    broadcast semi-join — results must be identical to the literal path
    (the bloom-rail two-regime pattern applied to query batches)."""
    import bayesiandatafusion_jl_spark.functions.vector_index as vi

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4, pq_ksub=32)
    q = corpus.filter(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    lit_path = {
        (r.qid, r.nb_id, r.rk)
        for r in vi.ann_ivfpq_query_index(
            q, index_dir, k=3, n_probe=4, refine=4
        ).collect()
    }
    monkeypatch.setattr(vi, "_REFINE_IN_MAX_IDS", 0)
    join_path = {
        (r.qid, r.nb_id, r.rk)
        for r in vi.ann_ivfpq_query_index(
            q, index_dir, k=3, n_probe=4, refine=4
        ).collect()
    }
    assert lit_path == join_path and lit_path


def test_tombstone_delete_hides_then_refit_applies(spark, index_dir):
    """Lifecycle of a logical delete: immediately invisible to BOTH
    probe paths (ADC and exact), physically removed and cleared by the
    next refit, and a fresh build clears stale tombstones."""
    import os

    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
        delete_from_ivf_index,
        refit_ivf_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4, pq_ksub=32)
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )

    def hits(fn):
        return {
            r.nb_id
            for r in fn(q, index_dir, k=5, n_probe=4).collect()
        }

    before_exact = hits(ann_ivf_query_index)
    before_adc = hits(ann_ivfpq_query_index)
    victim = sorted(before_exact & before_adc)[0]
    delete_from_ivf_index(spark, index_dir, [victim])
    delete_from_ivf_index(spark, index_dir, [victim])  # idempotent
    assert victim not in hits(ann_ivf_query_index)
    assert victim not in hits(ann_ivfpq_query_index)
    # k slots are still filled from the survivors
    assert len(hits(ann_ivfpq_query_index)) == 5
    # refit applies physically and clears the tombstone set
    refit_ivf_index(spark, index_dir)
    posts = spark.read.parquet(f"{index_dir}/postings")
    assert posts.filter(F.col("vec_id") == victim).count() == 0
    assert not os.path.exists(f"{index_dir}/tombstones")
    assert victim not in hits(ann_ivfpq_query_index)
    # a fresh build over a new corpus clears stale tombstones too
    delete_from_ivf_index(spark, index_dir, [3])
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    assert not os.path.exists(f"{index_dir}/tombstones")
    assert 3 in hits(ann_ivf_query_index) or 3 not in before_exact


def test_ivf_recall_sweep_monotone_to_exhaustive(spark, index_dir):
    """The tuning curve: recall is (weakly) monotone in n_probe and hits
    1.0 at the exhaustive width; the cost axis reports the probed share."""
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ivf_recall_sweep,
        write_ivf_index,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2)
    q = corpus.filter(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    rows = sorted(
        (r["n_probe"], r["recall_at_k"], r["mean_candidates_share"])
        for r in ivf_recall_sweep(
            corpus, q, index_dir, k=5, n_probes=(1, 4, 8)
        ).collect()
    )
    recalls = [r[1] for r in rows]
    assert recalls == sorted(recalls), rows  # monotone in probe width
    assert rows[-1][1] == 1.0, rows  # exhaustive probe == brute force
    assert rows[0][2] == 1 / 8 and rows[-1][2] == 1.0
    assert recalls[0] > 0.3, rows  # clustered data: even 1 cell finds some


def test_cells_literal_one_expr_matches_per_element_form(spark):
    """The r15 one-``F.expr`` centers literal is BIT-identical to the
    per-element ``F.lit`` form it replaced (~2.3k py4j round-trips per
    probe/fit/assignment call): same schema, same doubles — including
    the -0.0 sign, a subnormal-range value, and a non-terminating
    binary fraction — so every ANN score downstream is unchanged."""
    import math
    import random

    from bayesiandatafusion_jl_spark.functions.vector import _cells_literal

    rng = random.Random(7)
    centers = [[rng.uniform(-1, 1) for _ in range(9)] for _ in range(5)]
    centers[0][0] = -0.0
    centers[0][1] = 1e-300
    centers[1][2] = 1 / 3

    old = F.array(*[
        F.struct(
            F.lit(i).alias("cell_id"),
            F.lit(-i).alias("nid"),
            F.array(*[F.lit(v) for v in c]).alias("ce"),
        )
        for i, c in enumerate(centers)
    ])
    df = spark.range(1).select(old.alias("o"), _cells_literal(centers).alias("n"))
    assert (
        df.schema["o"].dataType.simpleString()
        == df.schema["n"].dataType.simpleString()
    )
    row = df.select(
        F.expr("transform(o, s -> s.ce)").alias("oc"),
        F.expr("transform(n, s -> s.ce)").alias("nc"),
        F.expr("transform(o, s -> s.cell_id)").alias("oid"),
        F.expr("transform(n, s -> s.cell_id)").alias("nid_"),
    ).collect()[0]
    assert row["oid"] == row["nid_"]
    for ca, cb in zip(row["oc"], row["nc"]):
        for a, b in zip(ca, cb):
            assert a == b and math.copysign(1, a) == math.copysign(1, b)


def test_artifact_memo_hit_and_rebuild_invalidation(spark, index_dir):
    """The r15 artifact memo: a repeat probe serves centers/codebooks/
    meta from the per-process memo (identical object — no reload job),
    and ANY rewrite of the artifact files (here a full rebuild with a
    different n_cells and corpus slice) invalidates it, so a probe can
    never plan against a stale quantizer."""
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        _load_centers,
        _load_codebooks,
        _load_rotation,
        _paths,
    )

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4)
    _, centers_path, meta_path = _paths(index_dir)

    c1 = _load_centers(spark, centers_path)
    assert _load_centers(spark, centers_path) is c1  # memo hit
    b1 = _load_codebooks(spark, index_dir)
    assert _load_codebooks(spark, index_dir) is b1
    assert _load_rotation(spark, index_dir) is None  # plain PQ: no rotation
    m1 = read_meta(spark, meta_path)
    assert read_meta(spark, meta_path) is m1
    assert m1["n_cells"] == 8

    # rebuild under a different config over a different corpus slice:
    # every artifact file is rewritten -> fingerprints change -> reloads
    write_ivf_index(
        corpus.filter(F.col("vec_id") < 80),
        index_dir,
        n_cells=4,
        n_assign=2,
        pq_m=4,
        pq_opq=True,
    )
    c2 = _load_centers(spark, centers_path)
    assert c2 is not c1 and len(c2) == 4
    m2 = read_meta(spark, meta_path)
    assert m2["n_cells"] == 4 and "opq" in m2.asDict()
    b2 = _load_codebooks(spark, index_dir)
    assert b2 is not b1
    # absent -> present transition: the memoized None must not survive
    # the OPQ rebuild
    rot = _load_rotation(spark, index_dir)
    assert rot is not None and len(rot) == len(c2[0])

    # probe end-to-end on the rebuilt index (memo-served artifacts):
    # results must reflect the NEW quantizer, not the memo of the old
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = ann_ivf_query_index(q, index_dir, k=3, n_probe=4).collect()
    assert got and all(r.nb_id < 80 for r in got)


def test_bounded_artifacts_written_as_one_file(spark, index_dir):
    """centers/codebooks/meta are KB-sized driver-built frames; the
    default write fanned them into one part file per parallelism slice
    (18 files for 16 rows), taxing every probe-side load (guide §6)."""
    import os

    corpus = _clustered(spark)
    write_ivf_index(corpus, index_dir, n_cells=8, n_assign=2, pq_m=4)
    for sub in ("centers", "codebooks", "meta"):
        files = [
            f
            for f in os.listdir(os.path.join(index_dir, sub))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (sub, files)
