"""SemDeDup (cluster-then-prune semantic dedup) — planted-twin recall,
greedy invariants, and partition-count invariance."""

import numpy as np
import pytest

from bayesiandatafusion_jl_spark.functions.vector import semdedup

SF = "/root/testdata/sf0.001"


def _synthetic(spark, n_base=60, n_twins=12, dim=16, noise=0.01, seed=7):
    """n_base near-orthogonal unit vectors + a near-copy of the first
    n_twins of them (twin id = base id + 1000). Random unit vectors in
    dim=16 have pairwise |cos| ≪ 0.9, so the ONLY cosine-≥-0.9 pairs are
    the planted (i, i+1000) twins."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twins = base[:n_twins] + noise * rng.normal(size=(n_twins, dim))
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in base[i]]) for i in range(n_base)]
    rows += [(1000 + i, [float(v) for v in twins[i]]) for i in range(n_twins)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semdedup_exact_single_cluster(spark):
    """n_clusters=1 → the prune is a global exact pass: every planted twin
    must be caught, nothing else, and the LOWER id is always the keeper."""
    df = _synthetic(spark)
    out = semdedup(df, n_clusters=1, threshold=0.9).toPandas()
    assert len(out) == 72
    dups = out[out.is_dup]
    assert sorted(dups.vec_id) == [1000 + i for i in range(12)]
    assert all(dups.rep_id == dups.vec_id - 1000)
    assert all(dups.cos_to_rep >= 0.9)
    kept = out[~out.is_dup]
    assert all(kept.rep_id == kept.vec_id)
    assert all(kept.cos_to_rep == 1.0)


def test_semdedup_clustered_recall_and_invariants(spark):
    """Realistic multi-cluster run: measured twin recall ≥ 0.75 (a twin
    pair split across a cluster boundary is the method's documented loss
    mode), and the structural invariants hold regardless."""
    df = _synthetic(spark, n_base=120, n_twins=20)
    out = semdedup(df, n_clusters=4, threshold=0.9).toPandas()
    assert len(out) == 140
    caught = {
        (int(r.rep_id), int(r.vec_id)) for r in out[out.is_dup].itertuples()
    }
    truth = {(i, 1000 + i) for i in range(20)}
    recall = len(caught & truth) / len(truth)
    assert recall >= 0.75, f"twin recall {recall}"
    assert caught <= truth  # random non-twin pairs never reach cos 0.9
    # every representative is itself kept, in the same cluster
    kept_ids = set(out[~out.is_dup].vec_id)
    cell = dict(zip(out.vec_id, out.cell_id))
    for r in out[out.is_dup].itertuples():
        assert int(r.rep_id) in kept_ids
        assert cell[int(r.rep_id)] == r.cell_id


def test_semdedup_partition_invariance(spark):
    """Output is a pure function of the data: identical rows whether the
    input arrives in 1 or 7 partitions (greedy order is vec_id-pinned)."""
    df = _synthetic(spark)
    outs = []
    for nparts in (1, 7):
        out = (
            semdedup(df.repartition(nparts), n_clusters=4, threshold=0.9)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])


def test_semdedup_giant_cluster_guard(spark):
    """Clusters above max_cluster_rows fail fast with sizing guidance
    instead of OOMing an executor — at CALL time (the pre-pass runs before
    the pandas stage; no .count() here, the plan is never executed), and
    in-kernel as defense when the pre-pass is disabled."""
    df = _synthetic(spark)
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semdedup(df, n_clusters=1, threshold=0.9, max_cluster_rows=10)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(
            df, n_clusters=1, threshold=0.9, max_cluster_rows=10, precheck=False
        ).count()
