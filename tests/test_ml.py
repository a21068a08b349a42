"""Property tests for the ML core (SURVEY §5.2): planted low-rank recovery,
CG vs direct solve, Macau side-info cold start, tensor path."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.ml.bpmf import bpmf, macau
from bayesiandatafusion_jl_spark.ml.relation import Entity, Relation, RelationData, split_train_test


def planted_lowrank(seed=42, n=200, m=100, k=8, noise=0.1, obs_frac=0.35):
    """Seeded planted low-rank matrix (FIXTURES.md planted_lowrank).

    The observation mask and train/test split are *uniform random* (seeded
    numpy, fully deterministic). A structured arithmetic mask like
    ``(a*i + b*j) % P < c`` selects diagonal bands, which breaks the
    incoherent-sampling assumption of matrix completion — even ALS stalls
    at RMSE ≈ 0.7 on such a mask, so it must not be used here.
    """
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, k))
    v = rng.standard_normal((m, k))
    r = u @ v.T + noise * rng.standard_normal((n, m))
    mask = rng.random((n, m)) < obs_frac
    test_mask = rng.random((n, m)) < 0.2
    cells = [
        (i, j, float(r[i, j]), "test" if test_mask[i, j] else "train")
        for i in range(n)
        for j in range(m)
        if mask[i, j]
    ]
    return u, v, cells


@pytest.fixture(scope="module")
def planted(spark):
    u, v, cells = planted_lowrank()
    df = spark.createDataFrame(
        cells, schema="row long, col long, value double, split string"
    )
    return u, v, df.persist()


def test_bpmf_recovers_planted_lowrank(spark, planted):
    """BPMF test-RMSE approaches the noise floor on a planted matrix."""
    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res = bpmf(spark, rd, num_latent=8, burnin=10, psamples=6, seed=1)
    assert res.rmse is not None
    # mean-predictor baseline RMSE is ~ ||UVᵀ|| scale (≈ 2.9); noise floor 0.1
    assert res.rmse < 0.35, f"rmse={res.rmse}, trace={res.rmse_trace}"
    # posterior mean + std exist per test cell
    row = res.pred_mean.limit(1).collect()[0]
    assert row["pred_std"] >= 0.0


def test_macau_side_info_cold_start(spark, planted):
    """Macau with informative side info must beat BPMF on cold-start rows
    (rows with zero training cells predict via βᵀf [paper:Macau])."""
    u, _, df = planted
    # side info = noisy linear image of the true factors: F = U·W + ε
    rng = np.random.default_rng(3)
    w = rng.standard_normal((u.shape[1], 32))
    feats = u @ w + 0.01 * rng.standard_normal((u.shape[0], 32))
    side_rows = [(int(i), feats[i].astype(float).tolist()) for i in range(u.shape[0])]
    side = spark.createDataFrame(side_rows, schema="id long, features array<float>")

    # cold-start: drop rows 0..19 from training entirely (they stay in test)
    df2 = df.withColumn(
        "split", F.when(F.col("row") < 20, "test").otherwise(F.col("split"))
    )
    rd_plain = RelationData().add_relation(Relation(df2, ["row", "col"], alpha=30.0))
    rd_side = RelationData()
    rd_side.add_entity(Entity("row", side_info=side))
    rd_side.add_relation(Relation(df2, ["row", "col"], alpha=30.0))

    res_plain = bpmf(spark, rd_plain, num_latent=8, burnin=6, psamples=8, seed=1)
    res_side = macau(spark, rd_side, num_latent=8, burnin=6, psamples=8, seed=1)

    def cold_rmse(res):
        return (
            res.pred_mean.filter(F.col("row") < 20)
            .agg(F.sqrt(F.avg(F.pow(F.col("y") - F.col("pred"), 2))).alias("r"))
            .collect()[0]["r"]
        )

    r_plain, r_side = cold_rmse(res_plain), cold_rmse(res_side)
    assert r_side < r_plain, f"macau cold {r_side} !< bpmf cold {r_plain}"


def test_tensor_arity3_trains(spark):
    """I9 — arity-3 tensor factorization runs and beats the global-mean
    baseline on a planted CP tensor."""
    rng = np.random.default_rng(5)
    k, ni, nj, nl = 4, 30, 25, 6
    u, v, w = (rng.standard_normal((n, k)) for n in (ni, nj, nl))
    cells = []
    for i in range(ni):
        for j in range(nj):
            for l in range(nl):
                if (i * 7 + j * 11 + l * 13) % 5 < 2:
                    val = float((u[i] * v[j] * w[l]).sum() + 0.05 * rng.standard_normal())
                    cells.append((i, j, l, val))
    df = spark.createDataFrame(cells, schema="i long, j long, l long, value double")
    df = split_train_test(df, ["i", "j", "l"], test_frac=0.2, seed=9)
    rd = RelationData().add_relation(Relation(df, ["i", "j", "l"], alpha=10.0))
    # n_chains=3: CP posteriors are multimodal — single chains land in a
    # metastable non-fitting mode with ~40% probability on this planted
    # problem (verified against an independent numpy Gibbs); best-of-3 by
    # train rmse is the standard restart remedy.
    res = macau(spark, rd, num_latent=4, burnin=6, psamples=8, seed=2, n_chains=3)
    base = (
        df.filter(F.col("split") == "test")
        .crossJoin(df.filter(F.col("split") == "train").agg(F.avg("value").alias("m")))
        .agg(F.sqrt(F.avg(F.pow(F.col("value") - F.col("m"), 2))).alias("r"))
        .collect()[0]["r"]
    )
    assert res.rmse < base * 0.7, f"tensor rmse={res.rmse} vs baseline {base}"


def test_collective_shared_entity(spark, planted):
    """I10 — a second relation sharing the row entity tightens the first
    relation's predictions (runs end-to-end; rmse finite)."""
    u, _, df = planted
    rng = np.random.default_rng(11)
    w2 = rng.standard_normal((u.shape[0], 40, 1))  # unused dims collapse
    # second relation: row × attr, low-rank in the same row factors
    v2 = rng.standard_normal((40, u.shape[1]))
    cells2 = []
    for i in range(u.shape[0]):
        for j in range(40):
            if (i * 13 + j * 17) % 10 < 3:
                cells2.append((i, j, float(u[i] @ v2[j] + 0.05 * rng.standard_normal())))
    df2 = spark.createDataFrame(cells2, schema="row long, attr long, value double")
    rd = RelationData()
    rd.add_relation(Relation(df, ["row", "col"], alpha=30.0))
    rd.add_relation(Relation(df2, ["row", "attr"], alpha=30.0))
    res = macau(spark, rd, num_latent=8, burnin=10, psamples=6, seed=4)
    assert res.rmse is not None and np.isfinite(res.rmse)
    assert res.rmse < 0.6


def test_sample_beta_cg_path_matches_direct(spark, planted):
    """I5 — the large-D CG path (batched-CG solve, distributed matvecs)
    must produce the same β sample as the direct path (distributed Gram
    once + driver D×D Cholesky), given identical RNG state and factors.
    The stochastic target e₁ is seeded per (entity, sweep, id), so both
    paths solve the exact same system."""
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer
    from bayesiandatafusion_jl_spark.ml.nw import sample_normal_wishart

    u, _, df = planted
    rng = np.random.default_rng(3)
    w = rng.standard_normal((u.shape[1], 16))
    feats = u @ w
    side_rows = [(int(i), feats[i].astype(float).tolist()) for i in range(u.shape[0])]
    side = spark.createDataFrame(side_rows, schema="id long, features array<float>")

    def make(direct_max_d):
        rd = RelationData()
        rd.add_entity(Entity("row", side_info=side))
        rd.add_relation(Relation(df, ["row", "col"], alpha=30.0))
        t = MacauTrainer(
            spark, rd, num_latent=4, seed=5, n_blocks=8,
            direct_max_d=direct_max_d, cg_tol=1e-10, cg_max_iter=100,
        )
        t._init()
        n, su, suu = t._moments("row")
        t.hyper["row"] = sample_normal_wishart(n, su, suu, t.rng)
        t._sample_beta("row", 0)
        return t

    t_direct = make(10**9)
    t_cg = make(0)
    assert "row" in t_direct.side_gram and "row" not in t_cg.side_gram
    # same seed → same NW + noise draws; CG solves the same system
    diff = np.max(np.abs(t_direct.beta["row"] - t_cg.beta["row"]))
    scale = np.max(np.abs(t_direct.beta["row"])) + 1e-12
    assert diff / scale < 1e-4, (diff, scale)


def test_kernel_posterior_moments_closed_form():
    """FIXTURES tiny_exact — the I3 kernel's empirical sample moments on a
    single instance must match the closed-form conditional posterior
    N(Λ*⁻¹(Λµ + αΣrv), Λ*⁻¹), Λ* = Λ + αΣvvᵀ [paper:BPMF]. Pure pandas —
    the kernel is engine-independent numpy."""
    import pandas as pd

    from bayesiandatafusion_jl_spark.ml import kernels

    k, alpha = 2, 4.0
    mu = np.array([0.5, -0.25])
    lam = np.array([[2.0, 0.3], [0.3, 1.5]])
    v = np.array([[1.0, 0.0], [0.5, 1.0], [-0.5, 2.0]])
    r = np.array([1.0, 0.2, -0.8])
    prec = lam + alpha * v.T @ v
    cov = np.linalg.inv(prec)
    mean = cov @ (lam @ mu + alpha * v.T @ r)

    m = 4000
    draws = np.empty((m, k))
    pdf = pd.DataFrame(
        {
            "__id": [7, 7, 7],
            "__val": r,
            "__fac": [row for row in v],
            "__alpha": alpha,
        }
    )
    for sweep in range(m):
        out = kernels.sample_block(pdf, k, alpha, mu, lam, seed=3, sweep=sweep)
        draws[sweep] = out["factor"].iloc[0]
    emp_mean = draws.mean(axis=0)
    emp_cov = np.cov(draws.T)
    se = np.sqrt(np.diag(cov) / m)
    assert np.all(np.abs(emp_mean - mean) < 5 * se), (emp_mean, mean)
    assert np.max(np.abs(emp_cov - cov)) < 0.05 * np.max(np.abs(cov)) + 0.01, (
        emp_cov,
        cov,
    )


def test_class_cut_auc_readout(spark, planted):
    """[api] parity: when the relation carries class_cut, training reports
    AUC of the posterior-mean predictions — must be far above chance on the
    planted matrix."""
    _, _, df = planted
    rd = RelationData().add_relation(
        Relation(df, ["row", "col"], alpha=30.0, class_cut=0.0)
    )
    res = bpmf(
        spark, rd, num_latent=8, burnin=4, psamples=3, seed=2, track_rmse=False
    )
    assert res.auc is not None and res.auc > 0.85, res.auc


def test_skew_salted_update_matches_plain(spark, planted):
    """Skew path: the two-phase salted update (partial suff-stats →
    combine+sample) must reproduce the one-phase update's factors — same
    RNG keys, statistics equal up to float associativity."""
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer
    from bayesiandatafusion_jl_spark.ml.nw import sample_normal_wishart

    _, _, df = planted

    def one_update(salt):
        rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
        t = MacauTrainer(
            spark, rd, num_latent=4, seed=13, n_blocks=8, skew_salt=salt
        )
        t._init()
        n, su, suu = t._moments("row")
        t.hyper["row"] = sample_normal_wishart(n, su, suu, t.rng)
        t._sample_entity("row", 0)
        return {
            r["id"]: np.array(r["factor"]) for r in t.factors["row"].collect()
        }

    plain, salted = one_update(None), one_update(4)
    assert plain.keys() == salted.keys()
    diffs = [np.max(np.abs(plain[i] - salted[i])) for i in plain]
    assert max(diffs) < 1e-8, max(diffs)


def test_cg_matches_direct_solve(spark):
    """I5/I6 — distributed CG solution of (FᵀF + λI)x = b matches
    numpy.linalg.solve to 1e-5 (FIXTURES cg_system)."""
    from bayesiandatafusion_jl_spark.ml.cg import (
        DistributedMatvec,
        cg_solve,
        features_to_coo,
    )

    rng = np.random.default_rng(21)
    n, d, kk = 120, 40, 3
    fm = rng.standard_normal((n, d))
    b = rng.standard_normal((d, kk))
    lam = 0.5
    rows = [(int(i), fm[i].astype(float).tolist()) for i in range(n)]
    side = spark.createDataFrame(rows, schema="id long, features array<float>")
    coo = features_to_coo(side)
    mv = DistributedMatvec(spark, coo, n, d)
    x = cg_solve(mv, b, lam, tol=1e-8, max_iter=200)
    fm64 = np.stack([np.asarray(r, dtype=np.float64) for r in [np.float32(fm[i]) for i in range(n)]])
    expect = np.linalg.solve(fm64.T @ fm64 + lam * np.eye(d), b)
    assert np.max(np.abs(x - expect)) < 1e-5, np.max(np.abs(x - expect))


def test_save_load_predict_roundtrip(spark, planted, tmp_path):
    """train → save → load → predict round-trip: the loaded model scores
    identically to the in-memory one, the centering mean survives, and
    prediction works without passing entities= (the trained entity order
    is part of the model) [api: macau workflow ends in reusable
    predictions]."""
    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res = bpmf(spark, rd, num_latent=4, burnin=4, psamples=2, seed=7)

    # train() must populate the prediction metadata
    assert res.rel_entities == ["row", "col"]
    assert res.global_mean != 0.0  # planted data is centered by default
    assert set(res.entity_counts) == {"row", "col"}

    cells = df.filter(F.col("split") == "test").select("row", "col").limit(50)
    direct = {(r["row"], r["col"]): r["pred"] for r in res.predict(cells).collect()}
    assert len(direct) == 50

    path = str(tmp_path / "model")
    res.save(path)
    loaded = res.load(spark, path)
    assert loaded.global_mean == pytest.approx(res.global_mean)
    assert loaded.rel_entities == res.rel_entities
    again = {(r["row"], r["col"]): r["pred"] for r in loaded.predict(cells).collect()}
    assert set(again) == set(direct)
    for k in direct:
        assert again[k] == pytest.approx(direct[k], rel=1e-6), k


def test_multisample_predict_matches_pred_mean(spark, planted, tmp_path):
    """Rao-Blackwellized prediction from stored posterior samples: with all
    psample snapshots retained (the default), predict() on the test cells
    must reproduce pred_mean's posterior-mean column; the samples survive
    save/load; and the sample-averaged RMSE beats the final-single-sample
    RMSE (variance reduction) on the planted fixture [paper:BPMF —
    prediction is the mean over stored posterior samples]."""
    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res = bpmf(spark, rd, num_latent=8, burnin=8, psamples=6, seed=5)
    assert res.n_samples == 6
    assert set(res.factor_samples) == {"row", "col"}

    test_cells = df.filter(F.col("split") == "test").select("row", "col")
    row = (
        res.predict(test_cells, with_std=True).alias("p")
        .join(res.pred_mean.alias("m"), ["row", "col"])
        .agg(
            F.max(F.abs(F.col("p.pred") - F.col("m.pred"))).alias("d"),
            F.max(F.abs(F.col("p.pred_std") - F.col("m.pred_std"))).alias("ds"),
        )
        .collect()[0]
    )
    assert row["d"] < 1e-8, f"multi-sample predict diverges from pred_mean by {row['d']}"
    assert row["ds"] < 1e-8, f"with_std diverges from pred_mean.pred_std by {row['ds']}"

    path = str(tmp_path / "msmodel")
    res.save(path)
    loaded = res.load(spark, path)
    assert loaded.n_samples == 6

    y = df.filter(F.col("split") == "test").select("row", "col", "value")

    def rmse_of(pred_df):
        return (
            pred_df.join(y, ["row", "col"])
            .agg(F.sqrt(F.avg(F.pow(F.col("value") - F.col("pred"), 2))).alias("r"))
            .collect()[0]["r"]
        )

    r_samples = rmse_of(loaded.predict(test_cells))
    r_single = rmse_of(loaded.predict(test_cells, use_samples=False))
    assert r_samples == pytest.approx(res.rmse, rel=1e-6)
    assert r_samples < r_single, f"sample-mean {r_samples} !< single {r_single}"

    # row-count contract: duplicate input cells must come back one-per-row
    # from BOTH paths (the S-sample collapse groups on a per-row tag, not
    # on the cell columns)
    dup = test_cells.limit(5).union(test_cells.limit(5))
    assert res.predict(dup).count() == 10
    assert res.predict(dup, use_samples=False).count() == 10


def test_keep_samples_thinning(spark, planted):
    """keep_samples=N retains exactly N evenly thinned snapshots (final
    sweep always included) and predict still runs on the thinned set."""
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer

    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res = MacauTrainer(
        # psamples=4, keep=3 is the non-divisible case where a ceil stride
        # silently kept only 2 snapshots — exactly `keep` must survive
        spark, rd, num_latent=4, burnin=3, psamples=4, seed=9, keep_samples=3
    ).train()
    assert res.n_samples == 3
    sids = {
        r["sample_id"]
        for r in res.factor_samples["row"].select("sample_id").distinct().collect()
    }
    assert sids == {0, 1, 2}
    cells = df.filter(F.col("split") == "test").select("row", "col").limit(20)
    assert res.predict(cells).count() == 20


def test_adaptive_alpha_recovers_planted_noise(spark):
    """alpha_sample=True: the Gamma-posterior noise precision converges to
    the planted 1/noise² (up to the model-error inflation of the residual),
    starting from a deliberately wrong fixed seed value. True precision
    here is 1/0.25² = 16; the residual also carries approximation error so
    the draw lands at or below it — a generous [16/3, 3·16] band proves the
    knob adapted instead of staying at the alpha=2 seed."""
    u, v, cells = planted_lowrank(seed=11, n=150, m=80, k=6, noise=0.25, obs_frac=0.4)
    df = spark.createDataFrame(
        cells, schema="row long, col long, value double, split string"
    )
    rd = RelationData().add_relation(
        Relation(df, ["row", "col"], alpha=2.0, alpha_sample=True)
    )
    res = bpmf(spark, rd, num_latent=6, burnin=8, psamples=4, seed=3, track_rmse=False)
    a = res.alphas[0]
    assert 16 / 3 < a < 16 * 3, f"adaptive alpha {a} not near planted precision 16"
    # and it must genuinely improve on the planted fit vs the wrong fixed α
    assert res.rmse is not None and res.rmse < 0.5


def test_gram_matches_dense(spark):
    """The per-block outer-product Gram equals the dense FᵀF exactly on a
    random sparse COO (including empty rows/columns)."""
    from bayesiandatafusion_jl_spark.ml.cg import DistributedMatvec

    rng = np.random.default_rng(17)
    n, d = 60, 24
    dense = rng.standard_normal((n, d)) * (rng.random((n, d)) < 0.3)
    dense[5] = 0.0  # an all-zero instance
    dense[:, 7] = 0.0  # an unobserved feature column
    coo_rows = [
        (int(i), int(j), float(dense[i, j]))
        for i in range(n)
        for j in range(d)
        if dense[i, j] != 0.0
    ]
    coo = spark.createDataFrame(coo_rows, "id long, feat long, v double")
    mv = DistributedMatvec(spark, coo, n, d, n_parts=8)
    got = mv.gram()
    mv.unpersist()
    np.testing.assert_allclose(got, dense.T @ dense, rtol=1e-12, atol=1e-12)


def test_safe_name_no_collision(tmp_path):
    """Distinct raw entity names must never map to the same path component."""
    from bayesiandatafusion_jl_spark.ml.bpmf import _safe_name

    assert _safe_name("user b") != _safe_name("user_b")
    assert _safe_name("user_b") == "user_b"  # already-safe names unchanged


def test_assign_to_test_exact_count(spark):
    """assignToTest!(rel, n) form: exactly n cells land in test, the
    choice is seed-stable and independent of input partitioning."""
    from bayesiandatafusion_jl_spark.ml.relation import assign_to_test

    df = spark.range(0, 500).select(
        (F.col("id") % 50).alias("row"), (F.col("id") / 50).cast("long").alias("col"),
        F.rand(3).alias("value"),
    )
    out = assign_to_test(df, ["row", "col"], n=37, seed=5)
    assert out.filter(F.col("split") == "test").count() == 37
    assert out.count() == 500

    picked = {
        (r["row"], r["col"])
        for r in out.filter(F.col("split") == "test").select("row", "col").collect()
    }
    # same seed, different partitioning → same cells
    out2 = assign_to_test(df.repartition(7), ["row", "col"], n=37, seed=5)
    picked2 = {
        (r["row"], r["col"])
        for r in out2.filter(F.col("split") == "test").select("row", "col").collect()
    }
    assert picked == picked2
    # different seed → (almost surely) different cells
    out3 = assign_to_test(df, ["row", "col"], n=37, seed=6)
    picked3 = {
        (r["row"], r["col"])
        for r in out3.filter(F.col("split") == "test").select("row", "col").collect()
    }
    assert picked != picked3


def test_sparse_coo_side_info_matches_dense(spark, planted):
    """Entity.side_info given as a pre-sparse COO (id, feat, v) table must
    train identically to the same features in dense array layout — same
    seed ⇒ same RMSE trace (the ingestion paths converge on the same COO,
    so the Gibbs streams are byte-identical)."""
    from bayesiandatafusion_jl_spark.ml.cg import features_to_coo

    u, _, df = planted
    rng = np.random.default_rng(9)
    w = rng.standard_normal((u.shape[1], 24))
    feats = u @ w
    feats[np.abs(feats) < 1.0] = 0.0  # genuinely sparse
    side_rows = [(int(i), feats[i].astype(float).tolist()) for i in range(u.shape[0])]
    dense = spark.createDataFrame(side_rows, schema="id long, features array<float>")
    coo = features_to_coo(dense)  # same float32 rounding as the dense path

    rd_dense = RelationData()
    rd_dense.add_entity(Entity("row", side_info=dense))
    rd_dense.add_relation(Relation(df, ["row", "col"], alpha=30.0))
    rd_coo = RelationData()
    rd_coo.add_entity(Entity("row", side_info=coo, side_dim=24))
    rd_coo.add_relation(Relation(df, ["row", "col"], alpha=30.0))

    res_dense = macau(spark, rd_dense, num_latent=4, burnin=3, psamples=2, seed=2)
    res_coo = macau(spark, rd_coo, num_latent=4, burnin=3, psamples=2, seed=2)
    assert res_coo.rmse == pytest.approx(res_dense.rmse, abs=1e-9), (
        res_coo.rmse_trace,
        res_dense.rmse_trace,
    )


def test_probit_planted_binary_auc(spark):
    """End-to-end Albert–Chib binary training (probit=True) on a planted
    low-rank sign matrix: held-out AUC must be far above chance — the
    statistical gate for the whole probit path (z refresh → unit-precision
    kernel → posterior readout)."""
    rng = np.random.default_rng(42)
    n, m, k = 150, 60, 4
    u = rng.standard_normal((n, k))
    v = rng.standard_normal((m, k))
    r = u @ v.T
    mask = rng.random((n, m)) < 0.35
    test_mask = rng.random((n, m)) < 0.2
    cells = [
        (i, j, 1.0 if r[i, j] > 0 else 0.0, "test" if test_mask[i, j] else "train")
        for i in range(n)
        for j in range(m)
        if mask[i, j]
    ]
    df = spark.createDataFrame(
        cells, schema="row long, col long, value double, split string"
    )
    rd = RelationData().add_relation(
        Relation(df, ["row", "col"], class_cut=0.5, probit=True)
    )
    res = bpmf(spark, rd, num_latent=4, burnin=4, psamples=2, seed=7, track_rmse=False)
    assert res.auc is not None and res.auc > 0.85, res.auc


def test_als_mllib_cross_check(spark):
    """Stock MLlib ALS on the events matrix must produce finite held-out
    predictions in the mean-predictor's error BALLPARK (≤ 1.5× the sd
    baseline). The synthetic events matrix carries almost no low-rank
    signal, so ALS does NOT reliably beat the mean predictor here
    (measured: rmse ≈ 1.1–1.3× sd depending on split) — this gate proves
    the interop runs end-to-end and is sane, not that it wins; the
    planted-matrix tests above are where predictive quality is gated."""
    from bayesiandatafusion_jl_spark.ml.queries import q_ml_als_mllib
    from tests.conftest import SF_DIR_TINY

    out = q_ml_als_mllib(spark, SF_DIR_TINY).persist()
    assert out.count() > 0
    row = out.agg(
        F.sqrt(F.avg(F.pow(F.col("actual") - F.col("pred"), 2))).alias("rmse"),
        F.stddev("actual").alias("sd"),
    ).collect()[0]
    out.unpersist()
    assert row["rmse"] is not None and np.isfinite(row["rmse"])
    assert row["rmse"] < 1.5 * row["sd"], row


def test_phi_col_matches_numpy(spark):
    """The JVM-side Φ expression matches the vectorized numpy norm_cdf."""
    from bayesiandatafusion_jl_spark.ml.probit import norm_cdf, phi_col

    xs = np.linspace(-6, 6, 201)
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = {r["x"]: r["p"] for r in df.select("x", phi_col(F.col("x")).alias("p")).collect()}
    want = norm_cdf(xs)
    # 2e-7 budget: the A&S 7.1.26 approximation itself is 1.5e-7, and the
    # Column expression's sign(0) convention differs from numpy's at x=0
    for x, w in zip(xs, want):
        assert got[float(x)] == pytest.approx(float(w), abs=2e-7)


def test_cold_start_factors_and_predict(spark, planted):
    """Macau cold-start from a LOADED model: ids absent from training get
    u = mu + beta^T f from side features alone, and predict(side_info=...)
    scores them; factor values match the numpy formula."""
    u, _, df = planted
    rng = np.random.default_rng(3)
    w = rng.standard_normal((u.shape[1], 16))
    feats = u @ w
    n_rows = u.shape[0]
    side_rows = [(int(i), feats[i].astype(float).tolist()) for i in range(n_rows)]
    # train WITHOUT the last 10 row-entities anywhere (no cells, no side info)
    side = spark.createDataFrame(
        side_rows[: n_rows - 10], schema="id long, features array<float>"
    )
    df_tr = df.filter(F.col("row") < n_rows - 10)
    rd = RelationData()
    rd.add_entity(Entity("row", side_info=side))
    rd.add_relation(Relation(df_tr, ["row", "col"], alpha=30.0))
    res = macau(spark, rd, num_latent=4, burnin=3, psamples=2, seed=4)

    # unseen ids with features → factors from beta
    unseen = spark.createDataFrame(
        side_rows[n_rows - 10 :], schema="id long, features array<float>"
    )
    cf = {r["id"]: np.array(r["factor"]) for r in
          res.cold_start_factors("row", unseen).collect()}
    assert len(cf) == 10
    beta = res.beta["row"]
    mu = res.hyper["row"][0]
    for i in range(n_rows - 10, n_rows):
        f32 = np.float64(np.float32(feats[i]))  # the ingestion float cast
        want = mu + beta.T @ f32
        assert np.allclose(cf[i], want, atol=1e-6), (i, cf[i], want)

    # end-to-end: predict cells of unseen rows via side_info=
    cells = unseen.select(F.col("id").alias("row")).crossJoin(
        spark.range(0, 5).select(F.col("id").alias("col"))
    )
    preds = res.predict(cells, side_info={"row": unseen})
    assert preds.count() == 50
    assert preds.filter(F.isnan("pred") | F.col("pred").isNull()).count() == 0


def test_probit_probability_predict(spark):
    """probability=True maps probit latent scores through Φ — bounded in
    (0,1), monotone in the latent score, and refused on non-probit models."""
    rng = np.random.default_rng(11)
    n, m, k = 60, 30, 3
    r = rng.standard_normal((n, k)) @ rng.standard_normal((m, k)).T
    cells = [
        (i, j, 1.0 if r[i, j] > 0 else 0.0)
        for i in range(n) for j in range(m) if rng.random() < 0.5
    ]
    df = spark.createDataFrame(cells, schema="row long, col long, value double")
    rd = RelationData().add_relation(
        Relation(df, ["row", "col"], class_cut=0.5, probit=True)
    )
    res = bpmf(spark, rd, num_latent=3, burnin=3, psamples=1, seed=3, track_rmse=False)
    assert res.probit is True
    some = df.select("row", "col").limit(40)
    scored = res.predict(some).withColumnRenamed("pred", "score")
    proba = res.predict(some, probability=True)
    j = scored.join(proba, ["row", "col"]).collect()
    from bayesiandatafusion_jl_spark.ml.probit import norm_cdf
    for rr in j:
        assert 0.0 < rr["pred"] < 1.0
        assert rr["pred"] == pytest.approx(float(norm_cdf(np.array([rr["score"]]))[0]), abs=1e-9)

    rd2 = RelationData().add_relation(Relation(df, ["row", "col"], alpha=5.0))
    res2 = bpmf(spark, rd2, num_latent=3, burnin=2, psamples=1, seed=3, track_rmse=False)
    with pytest.raises(ValueError):
        res2.predict(some, probability=True)


def test_per_relation_centering_heterogeneous_scales(spark, planted):
    """Collective factorization with a secondary relation on a wildly
    different value scale (×10 + 500): per-relation centering keeps the
    primary relation's fit intact (the r6 pooled global_mean dragged both
    relations toward a blended offset). Done-criterion: primary RMSE in
    the collective run stays close to the single-relation run, and each
    relation's stored mean matches its own train mean."""
    u, _, df = planted
    rng = np.random.default_rng(21)
    v2 = rng.standard_normal((40, u.shape[1]))
    cells2 = []
    for i in range(u.shape[0]):
        for j in range(40):
            if (i * 13 + j * 17) % 10 < 3:
                raw = float(u[i] @ v2[j] + 0.05 * rng.standard_normal())
                cells2.append((i, j, raw * 10.0 + 500.0))
    df2 = spark.createDataFrame(cells2, schema="row long, attr long, value double")

    rd_single = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res_single = bpmf(spark, rd_single, num_latent=8, burnin=8, psamples=4, seed=4)

    rd = RelationData()
    rd.add_relation(Relation(df, ["row", "col"], alpha=30.0))
    rd.add_relation(Relation(df2, ["row", "attr"], alpha=30.0 / 10.0**2))
    res = macau(spark, rd, num_latent=8, burnin=8, psamples=4, seed=4)

    # each relation is centered by its OWN train mean
    m1 = (
        df.filter(F.col("split") == "train")
        .agg(F.avg("value").alias("m")).collect()[0]["m"]
    )
    m2 = df2.agg(F.avg("value").alias("m")).collect()[0]["m"]
    assert res.rel_means[0] == pytest.approx(m1, abs=1e-9)
    assert res.rel_means[1] == pytest.approx(m2, abs=1e-9)
    assert res.global_mean == pytest.approx(m1, abs=1e-9)
    assert abs(res.rel_means[1] - 500.0) < 50.0  # secondary's big offset isolated

    # primary fit survives the heterogeneous-scale fusion — under the r6
    # pooled global_mean the +500-offset secondary dragged the shared
    # offset to ~+125, putting the primary RMSE at ~10² of this bound
    assert np.isfinite(res.rmse)
    assert res.rmse < max(1.0, res_single.rmse * 2.0), (
        f"collective rmse {res.rmse} vs single {res_single.rmse}"
    )

    # predict() adds back the SECONDARY relation's offset when scoring its
    # cells (entity-order match), so scores land on the secondary's scale
    sec_cells = df2.select("row", "attr").limit(50)
    preds = res.predict(sec_cells, entities=["row", "attr"], use_samples=False)
    avg_pred = preds.agg(F.avg("pred").alias("a")).collect()[0]["a"]
    assert abs(avg_pred - 500.0) < 200.0, f"secondary preds off-scale: {avg_pred}"


def test_byte_based_broadcast_gate(spark):
    """_maybe_broadcast gates on estimated BYTES (rows × (K+1) × 8), not
    rows: a 100k-row K=512 factor table (~410 MB) must NOT be broadcast
    while the same row count at K=16 (~14 MB) is; unknown size never
    forces a broadcast."""
    from bayesiandatafusion_jl_spark.ml.bpmf import _maybe_broadcast

    df = spark.range(10)
    assert _maybe_broadcast(df, 100_000, 512) is df
    assert _maybe_broadcast(df, None, 16) is df
    hinted = _maybe_broadcast(df, 100_000, 16)
    assert hinted is not df
    assert "broadcast" in hinted._jdf.queryExecution().logical().toString().lower()


def test_spill_dir_bounds_resident_snapshots(spark, planted, tmp_path):
    """keep_samples + spill_dir: retained posterior snapshots live as lazy
    parquet readers, not executor-resident checkpoint blocks, and
    multi-sample predict still reproduces pred_mean exactly."""
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer

    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    res = MacauTrainer(
        spark, rd, num_latent=4, burnin=4, psamples=4, seed=5,
        spill_dir=str(tmp_path / "spill"),
    ).train()
    assert res.n_samples == 4

    # every snapshot frame is a plain file scan — no in-memory blocks held
    for fr in res.factor_samples.values():
        plan = fr._jdf.queryExecution().optimizedPlan().toString()
        assert "Relation" in plan and "LogicalRDD" not in plan, plan

    test_cells = df.filter(F.col("split") == "test").select("row", "col")
    d = (
        res.predict(test_cells).alias("p")
        .join(res.pred_mean.alias("m"), ["row", "col"])
        .agg(F.max(F.abs(F.col("p.pred") - F.col("m.pred"))).alias("d"))
        .collect()[0]["d"]
    )
    assert d < 1e-8, f"spilled multi-sample predict diverges by {d}"


def test_secondary_shift_leaves_primary_invariant(spark, planted):
    """Translation equivariance of per-relation centering: adding a
    constant to a SECONDARY relation's values must leave the primary
    relation's predictions unchanged up to float noise — the shift is
    absorbed by that relation's own train mean, so each centered kernel
    input differs only by the ~1e-12 cancellation error of
    (v+1000) − mean(v+1000), which the Gibbs sweeps then amplify; the
    tolerance below leaves ~9 orders of magnitude between that noise and
    the ~125 offset the r6 pooled global_mean leaked."""
    u, _, df = planted
    rng = np.random.default_rng(33)
    v2 = rng.standard_normal((40, u.shape[1]))
    cells2 = [
        (i, j, float(u[i] @ v2[j] + 0.05 * rng.standard_normal()))
        for i in range(u.shape[0])
        for j in range(40)
        if (i * 13 + j * 17) % 10 < 3
    ]
    df2 = spark.createDataFrame(cells2, schema="row long, attr long, value double")

    def train(second):
        rd = RelationData()
        rd.add_relation(Relation(df, ["row", "col"], alpha=30.0))
        rd.add_relation(Relation(second, ["row", "attr"], alpha=30.0))
        res = macau(spark, rd, num_latent=8, burnin=4, psamples=2, seed=6)
        return {
            (r["row"], r["col"]): r["pred"] for r in res.pred_mean.collect()
        }

    base = train(df2)
    shifted = train(df2.withColumn("value", F.col("value") + 1000.0))
    assert set(base) == set(shifted)
    worst = max(abs(base[k] - shifted[k]) for k in base)
    assert worst < 1e-3, f"secondary +1000 shift leaked into primary: {worst}"


def test_sample_scores_and_rhat(spark, planted):
    """sample_scores is the per-sample trace surface (cells × S rows), and
    rhat's estimator identities hold exactly: two IDENTICAL chains with
    split=False have zero between-chain variance, so R-hat = sqrt((n-1)/n)
    at every probe cell; two independent chains (different seeds) on the
    converged planted fixture stay near 1."""
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer
    from bayesiandatafusion_jl_spark.ml.diagnostics import rhat

    _, _, df = planted
    rd = RelationData().add_relation(Relation(df, ["row", "col"], alpha=30.0))
    chain_a = bpmf(spark, rd, num_latent=8, burnin=8, psamples=6, seed=21)
    chain_b = bpmf(spark, rd, num_latent=8, burnin=8, psamples=6, seed=22)
    cells = df.filter(F.col("split") == "test").select("row", "col").limit(30)

    # trace surface contract: one row per (distinct cell, sample)
    tr = chain_a.sample_scores(cells)
    assert tr.columns == ["row", "col", "sample_id", "score"]
    assert tr.count() == 30 * 6
    assert tr.select("sample_id").distinct().count() == 6

    # same chain twice, unsplit: B = 0 → R-hat = sqrt((n-1)/n) exactly
    ident = rhat([chain_a, chain_a], cells, split=False).collect()
    assert len(ident) == 30
    expected = float(np.sqrt(5.0 / 6.0))
    for r in ident:
        assert r["rhat"] == pytest.approx(expected, abs=1e-9), r

    # independent chains, split halves: defined and positive everywhere.
    # NO near-1 assertion: 6 Gibbs sweeps per chain are heavily
    # autocorrelated, so large R-hat here is the diagnostic CORRECTLY
    # reporting unmixed chains (estimator calibration is pinned by the
    # exact B=0 identity above and the AR(1) ESS kernel test below).
    vals = [r["rhat"] for r in rhat([chain_a, chain_b], cells).collect()]
    assert len(vals) == 30 and all(v is not None and v > 0.5 for v in vals)

    with pytest.raises(ValueError, match="at least one"):
        rhat([], cells)
    with pytest.raises(ValueError, match=">= 2 chains"):
        rhat([chain_a], cells, split=False)
    # split-half needs >= 4 samples per chain
    thin = MacauTrainer(
        spark, rd, num_latent=4, burnin=2, psamples=2, seed=3
    ).train()
    with pytest.raises(ValueError, match="n_samples >= 4"):
        rhat([thin], cells)

    # ESS on the same chains: defined, positive, bounded by a generous
    # antithetic-overshoot multiple of the m*n raw draws
    from bayesiandatafusion_jl_spark.ml.diagnostics import ess

    evals = [r["ess"] for r in ess([chain_a, chain_b], cells).collect()]
    assert len(evals) == 30
    cap = 12 * np.log10(12) + 1e-9  # Stan's m·n·log10(m·n) ESS ceiling
    assert all(v is not None and 0.9 < v <= cap for v in evals), sorted(evals)

    # posterior predictive quantiles: ordered, and (0,1) hit the trace
    # extremes exactly
    qs = chain_a.predict_quantiles(cells, probs=(0.0, 0.5, 1.0))
    assert set(qs.columns) == {"row", "col", "q000", "q500", "q1000"}
    for r in qs.collect():
        assert r["q000"] <= r["q500"] <= r["q1000"]
    ext = (
        tr.groupBy("row", "col")
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .join(qs, ["row", "col"])
        .agg(
            F.max(F.abs(F.col("q000") - F.col("lo"))).alias("dlo"),
            F.max(F.abs(F.col("q1000") - F.col("hi"))).alias("dhi"),
        )
        .collect()[0]
    )
    assert ext["dlo"] < 1e-12 and ext["dhi"] < 1e-12
    with pytest.raises(ValueError, match="collide"):
        chain_a.predict_quantiles(cells, probs=(0.5, 0.5004))


def test_ess_kernel_iid_vs_ar1():
    """_ess_kernel calibration: iid noise → ESS ≈ m·n; a strongly
    autocorrelated AR(1) trace → ESS near the theoretical
    n_eff = N(1-φ)/(1+φ); constant trace → NaN."""
    from bayesiandatafusion_jl_spark.ml.diagnostics import _ess_kernel

    rng = np.random.default_rng(7)
    m, n = 4, 500
    iid = rng.standard_normal((m, n))
    e_iid = _ess_kernel(iid)
    assert 0.7 * m * n < e_iid < 1.5 * m * n, e_iid

    phi = 0.9
    ar = np.zeros((m, n))
    for c in range(m):
        z = rng.standard_normal(n)
        for t in range(1, n):
            ar[c, t] = phi * ar[c, t - 1] + z[t]
    e_ar = _ess_kernel(ar)
    theory = m * n * (1 - phi) / (1 + phi)  # ≈ 105
    assert 0.4 * theory < e_ar < 2.5 * theory, (e_ar, theory)
    assert e_ar < e_iid / 5

    assert np.isnan(_ess_kernel(np.ones((2, 50))))


def test_rhat_ess_from_synthetic_trace(spark):
    """Trace-level seams pinned on hand-built chains: frozen-at-different-
    values chains → R-hat = +Infinity (the worst divergence signature must
    NOT read as NULL/converged); globally constant trace → NULL; the
    block-folded ESS pass returns one row per cell with the same kernel
    values as direct numpy."""
    from bayesiandatafusion_jl_spark.ml.diagnostics import (
        _ess_kernel,
        ess_from_trace,
        rhat_from_trace,
    )

    s = 4
    rows = []
    # cell 0: chain 0 frozen at 1.0, chain 1 frozen at 2.0 → inf
    # cell 1: everything 3.0 → NULL
    # cell 2: a varying trace → finite
    var_trace = {0: [0.1, 0.9, 0.2, 0.8], 1: [0.5, 0.4, 0.6, 0.3]}
    for chain in (0, 1):
        for sid in range(s):
            rows.append((0, chain, sid, float(1.0 + chain)))
            rows.append((1, chain, sid, 3.0))
            rows.append((2, chain, sid, var_trace[chain][sid]))
    trace = spark.createDataFrame(
        rows, "cell long, __chain int, sample_id int, score double"
    )
    got = {
        r["cell"]: r["rhat"]
        for r in rhat_from_trace(trace, ["cell"], s, split=False).collect()
    }
    assert got[0] == float("inf")
    assert got[1] is None
    assert got[2] is not None and np.isfinite(got[2])

    es = {r["cell"]: r["ess"] for r in ess_from_trace(trace, ["cell"], s).collect()}
    assert len(es) == 3
    assert es[1] is None  # degenerate constant trace
    expect = _ess_kernel(np.array([var_trace[0], var_trace[1]]))
    assert es[2] == pytest.approx(expect, rel=1e-12)
    assert es[0] is not None  # frozen-but-different: defined (b>0)
