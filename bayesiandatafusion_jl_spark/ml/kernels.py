"""Arrow-vectorized Gibbs kernels (SURVEY I2, I3).

The per-instance conditional Gaussian sample [paper:BPMF]:

    Λ_i = Λ + α Σ_{j∈obs(i)} v_j v_jᵀ
    b_i = Λ (μ + βᵀf_i) + α Σ_{j∈obs(i)} r_ij v_j
    u_i ~ N(Λ_i⁻¹ b_i, Λ_i⁻¹)   (via Cholesky)

Executed as ``applyInPandas`` over *blocks* of instances (block =
pmod(id, n_blocks)) — grouping by block instead of by instance amortizes
Arrow batch overhead over thousands of instances while staying
embarrassingly parallel across blocks [paper:BPMF §Gibbs]. Inside a block
the per-instance solves are K×K numpy Cholesky factorizations (K ≈ 8–64),
exactly the reference's inner kernel re-expressed vectorized.

Determinism under task retries (SURVEY §7): the RNG for instance i at
sweep s is ``default_rng((seed, sweep, i))`` — retry-idempotent, so a
recomputed partition reproduces identical samples.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def _stable_seed(seed: int, sweep: int, i: int) -> int:
    # int/tuple hashing is PYTHONHASHSEED-independent → retry-idempotent
    return abs(hash((seed, sweep, int(i)))) % (2**63)


def _canonical_order(
    ids: np.ndarray, vals: np.ndarray, vmat: np.ndarray, *extra: np.ndarray
) -> np.ndarray:
    """Order cells canonically: by id, then value, then factor entries.

    Spark shuffle output order differs between task attempts; float sums
    depend on association order, so without a canonical sort a retried
    task would produce a (slightly) different sample — breaking the
    retry-idempotence promise. Sorting by content makes the kernel a pure
    function of the cell *set*.
    """
    keys = [vmat[:, d] for d in range(vmat.shape[1] - 1, -1, -1)]
    for e in extra:
        keys.append(e)
    keys.append(vals)
    keys.append(ids)  # primary
    return np.lexsort(keys)


def sample_block(
    pdf: pd.DataFrame,
    k: int,
    alpha: float,
    mu: np.ndarray,
    lam: np.ndarray,
    seed: int,
    sweep: int,
    id_col: str = "__id",
    val_col: str = "__val",
    fac_col: str = "__fac",
    off_col: str | None = None,
    alpha_col: str | None = None,
    deterministic: bool = False,
    wr: float = 0.0,
) -> pd.DataFrame:
    """Sample new factors for every instance present in one block.

    pdf rows: one per observed cell of the block's instances —
    (id, rating, opposing-factor array[, prior-offset array][, per-cell α]).
    Per-cell α carries collective factorization (I10): cells from different
    relations keep their relation's noise precision in one fused update.
    Returns (id, factor array) per instance.

    deterministic=True skips the Gaussian innovation and returns the
    conditional MEAN — one half-sweep of ridge ALS with the same
    sufficient statistics, used to warm-start the Gibbs chain near the
    MAP mode [paper:BPMF §init — Gibbs is initialized from the PMF MAP].
    wr adds ALS-WR weighted regularization [paper:ALS-WR]: per-instance
    ridge wr·(Σ_cells α)·I, which suppresses data-unsupported (degenerate)
    directions an unregularized LS fit would inflate — without it a
    strong-residual instance overfits a prior-free runaway direction
    (train RMSE descends while test RMSE explodes).
    """
    ids = pdf[id_col].to_numpy()
    vals = pdf[val_col].to_numpy(dtype=np.float64)
    vmat = np.stack(pdf[fac_col].to_numpy())  # (n_cells, K)
    alphas = (
        pdf[alpha_col].to_numpy(dtype=np.float64)
        if alpha_col is not None and alpha_col in pdf.columns
        else np.full(len(ids), alpha)
    )
    offsets = None
    if off_col is not None and off_col in pdf.columns:
        off_raw = pdf[off_col].to_numpy()
        offsets = {
            int(i): np.asarray(o, dtype=np.float64)
            for i, o in zip(ids, off_raw)
            if o is not None
        }

    order = _canonical_order(ids, vals, vmat, alphas)
    ids_s, vals_s, vmat_s, alpha_s = ids[order], vals[order], vmat[order], alphas[order]
    uniq, starts = np.unique(ids_s, return_index=True)
    bounds = np.append(starts, len(ids_s))

    out_ids = np.empty(len(uniq), dtype=np.int64)
    out_fac = np.empty((len(uniq), k), dtype=np.float64)
    lam_mu = lam @ mu
    for n, i in enumerate(uniq):
        lo, hi = bounds[n], bounds[n + 1]
        vi = vmat_s[lo:hi]  # (deg, K)
        ri = vals_s[lo:hi]
        ai = alpha_s[lo:hi]
        via = vi * ai[:, None]
        prec = lam + vi.T @ via
        if wr > 0.0:
            prec = prec + (wr * ai.sum()) * np.eye(k)
        if offsets is not None and int(i) in offsets:
            b = lam @ (mu + offsets[int(i)]) + via.T @ ri
        else:
            b = lam_mu + via.T @ ri
        mean = np.linalg.solve(prec, b)  # K×K, tiny
        out_ids[n] = i
        if deterministic:
            out_fac[n] = mean
        else:
            chol = np.linalg.cholesky(prec)
            rng = np.random.default_rng(_stable_seed(seed, sweep, int(i)))
            z = rng.standard_normal(k)
            # u ~ N(mean, prec^-1): mean + L^-T z with L = chol(prec)
            out_fac[n] = mean + np.linalg.solve(chol.T, z)
    return pd.DataFrame({"id": out_ids, "factor": list(out_fac)})


def partial_stats_block(
    pdf: pd.DataFrame,
    k: int,
    id_col: str = "__id",
    val_col: str = "__val",
    fac_col: str = "__fac",
    alpha_col: str = "__alpha",
    salt_col: str = "__salt",
) -> pd.DataFrame:
    """Phase 1 of the skew-resistant update: per (instance, salt) partial
    sufficient statistics (n, Σ α r v, Σ α v vᵀ).

    Sufficient stats are linear in the cells, so a power-law instance
    (degree 10⁷ — one popular compound/user) splits across salts into
    bounded-size partials instead of one straggler group [paper:BPMF] —
    the same map-side-combine idea as Spark's own partial aggregation,
    applied to the Gibbs kernel.
    """
    ids = pdf[id_col].to_numpy()
    salts = pdf[salt_col].to_numpy()
    vals = pdf[val_col].to_numpy(dtype=np.float64)
    vmat = np.stack(pdf[fac_col].to_numpy())
    alphas = pdf[alpha_col].to_numpy(dtype=np.float64)

    key = ids * 1_000_003 + salts
    order = _canonical_order(key, vals, vmat, alphas)
    ids_s, salts_s = ids[order], salts[order]
    vals_s, vmat_s, alpha_s = vals[order], vmat[order], alphas[order]
    uniq, starts = np.unique(key[order], return_index=True)
    bounds = np.append(starts, len(ids_s))

    out = []
    for n in range(len(uniq)):
        lo, hi = bounds[n], bounds[n + 1]
        vi = vmat_s[lo:hi]
        via = vi * alpha_s[lo:hi, None]
        srv = via.T @ vals_s[lo:hi]
        svv = vi.T @ via
        out.append(
            (
                int(ids_s[lo]),
                int(salts_s[lo]),
                srv.tolist(),
                svv.reshape(-1).tolist(),
                float(alpha_s[lo:hi].sum()),
            )
        )
    return pd.DataFrame(out, columns=["id", "salt", "srv", "svv", "sa"])


def combine_sample_block(
    pdf: pd.DataFrame,
    k: int,
    mu: np.ndarray,
    lam: np.ndarray,
    seed: int,
    sweep: int,
    off_col: str | None = None,
    deterministic: bool = False,
    wr: float = 0.0,
) -> pd.DataFrame:
    """Phase 2: combine an instance's partials (few rows per instance) and
    draw the conditional Gaussian sample — same math and same RNG key as
    the one-phase ``sample_block``, so the two paths agree to float
    associativity. deterministic=True returns the conditional mean (ALS
    warm-start half-sweep); wr is the ALS-WR weighted ridge (see
    ``sample_block``), applied against the summed per-partial ``sa``."""
    ids = pdf["id"].to_numpy()
    offsets = None
    if off_col is not None and off_col in pdf.columns:
        off_raw = pdf[off_col].to_numpy()
        offsets = {
            int(i): np.asarray(o, dtype=np.float64)
            for i, o in zip(ids, off_raw)
            if o is not None
        }
    # canonical partial order: (id, salt) — retries must combine partials
    # in the same float-association order
    salts = (
        pdf["salt"].to_numpy()
        if "salt" in pdf.columns
        else np.zeros(len(ids), dtype=np.int64)
    )
    order = np.lexsort((salts, ids))
    ids_s = ids[order]
    srv_s = pdf["srv"].to_numpy()[order]
    svv_s = pdf["svv"].to_numpy()[order]
    sa_s = (
        pdf["sa"].to_numpy(dtype=np.float64)[order]
        if "sa" in pdf.columns
        else np.zeros(len(ids_s))
    )
    uniq, starts = np.unique(ids_s, return_index=True)
    bounds = np.append(starts, len(ids_s))
    lam_mu = lam @ mu
    out_fac = np.empty((len(uniq), k), dtype=np.float64)
    for n, i in enumerate(uniq):
        lo, hi = bounds[n], bounds[n + 1]
        srv = np.sum([np.asarray(s) for s in srv_s[lo:hi]], axis=0)
        svv = np.sum(
            [np.asarray(s).reshape(k, k) for s in svv_s[lo:hi]], axis=0
        )
        prec = lam + svv
        if wr > 0.0:
            prec = prec + (wr * sa_s[lo:hi].sum()) * np.eye(k)
        if offsets is not None and int(i) in offsets:
            b = lam @ (mu + offsets[int(i)]) + srv
        else:
            b = lam_mu + srv
        mean = np.linalg.solve(prec, b)
        if deterministic:
            out_fac[n] = mean
        else:
            chol = np.linalg.cholesky(prec)
            rng = np.random.default_rng(_stable_seed(seed, sweep, int(i)))
            z = rng.standard_normal(k)
            out_fac[n] = mean + np.linalg.solve(chol.T, z)
    return pd.DataFrame({"id": uniq.astype(np.int64), "factor": list(out_fac)})


def prior_block(
    pdf: pd.DataFrame,
    k: int,
    mu: np.ndarray,
    lam: np.ndarray,
    seed: int,
    sweep: int,
    deterministic: bool = False,
) -> pd.DataFrame:
    """Cold-start instances (no training cells this sweep): sample from the
    prior u_i ~ N(μ + βᵀf_i, Λ⁻¹) [paper:Macau cold start]. pdf rows:
    (id[, __off]). deterministic=True returns the prior mean."""
    ids = pdf["id"].to_numpy()
    offs = None
    if "__off" in pdf.columns:
        offs = pdf["__off"].to_numpy()
    cov = np.linalg.inv(lam)
    chol = np.linalg.cholesky((cov + cov.T) / 2)
    out = np.empty((len(ids), k), dtype=np.float64)
    for n, i in enumerate(ids):
        m = mu.copy()
        if offs is not None and offs[n] is not None:
            m = m + np.asarray(offs[n], dtype=np.float64)
        if deterministic:
            out[n] = m
        else:
            rng = np.random.default_rng(_stable_seed(seed, sweep, int(i)))
            out[n] = m + chol @ rng.standard_normal(k)
    return pd.DataFrame({"id": ids, "factor": list(out)})


def init_factors_pdf(pdf: pd.DataFrame, k: int, seed: int, scale: float = 0.3) -> pd.DataFrame:
    """I2 — seeded random init per instance: u_i ~ N(0, scale²) with RNG
    keyed by (seed, -1, id) → reproducible under retries. sweep=-1 gives
    initialization its own stream: a bare (seed, 0, id) key would collide
    with sweep 0's kernel key and correlate the init noise with the first
    Gibbs innovation. All-int key — str components would make the hash
    PYTHONHASHSEED-dependent and differ across executor processes."""
    ids = pdf["id"].to_numpy()
    out = np.empty((len(ids), k), dtype=np.float64)
    for n, i in enumerate(ids):
        rng = np.random.default_rng(_stable_seed(seed, -1, int(i)))
        out[n] = scale * rng.standard_normal(k)
    return pd.DataFrame({"id": ids, "factor": list(out)})


def beta_target_block(
    pdf: pd.DataFrame,
    k: int,
    mu: np.ndarray,
    lam_u: float,
    seed: int,
    sweep: int,
) -> pd.DataFrame:
    """Distributed β-sampling target (I5): per instance,

        t_i = λ_u (u_i − μ) + √λ_u ε_i,   ε_i ~ N(0, I_K)

    so that Fᵀ·t is the stochastic right-hand side of the
    Bhattacharya–Mallick exact β sampler — computed WITHOUT collecting the
    N×K factor matrix to the driver. ε is keyed by (seed, sweep, id)
    where the caller passes a β-specific sub-seed (crc32-salted, distinct
    from the kernel streams): retry-idempotent, all-int key
    (PYTHONHASHSEED-safe).
    """
    ids = pdf["id"].to_numpy()
    fac = np.stack(pdf["factor"].to_numpy())
    out = np.empty((len(ids), k), dtype=np.float64)
    sq = np.sqrt(lam_u)
    for n, i in enumerate(ids):
        rng = np.random.default_rng(_stable_seed(seed, sweep, int(i)))
        out[n] = lam_u * (fac[n] - mu) + sq * rng.standard_normal(k)
    return pd.DataFrame({"id": ids, "t": list(out)})


def moments_block(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Partial factor moments for the Normal–Wishart step (I4): per block,
    (n, Σu, Σuuᵀ flattened). Driver reduces the ~n_blocks partial rows —
    a treeAggregate-sized collect, constant in data size."""
    fac = np.stack(pdf["factor"].to_numpy())
    n = fac.shape[0]
    s = fac.sum(axis=0)
    ss = fac.T @ fac
    return pd.DataFrame(
        {"n": [n], "sum_u": [s.tolist()], "sum_uut": [ss.reshape(-1).tolist()]}
    )
