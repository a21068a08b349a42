"""Driver-side Normal–Wishart hyperparameter sampling (SURVEY I4).

(μ, Λ) ~ NW posterior given factor moments (N, Σu, Σuuᵀ) [paper:BPMF].
These are K-dimensional (K ≈ 8–64): the sample itself is trivial numpy on
the driver; only the *moments* are computed distributed (kernels.moments_block).
"""

from __future__ import annotations

import numpy as np


def sample_normal_wishart(
    n: int,
    sum_u: np.ndarray,
    sum_uut: np.ndarray,
    rng: np.random.Generator,
    b0: float = 2.0,
    df0: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample (μ, Λ) from the NW posterior with prior μ0=0, κ0=b0, W0=I,
    ν0=K+2 (paper [paper:BPMF §3.2] uses ν0=K; we add 2 for stability).

    Why ν0=K+2, not the paper's K: with ν0=K the Wishart prior density
    ∝|Λ|^{(ν0−K−1)/2} DIVERGES at singular Λ, and a latent dimension d
    that decouples from the likelihood enters a variance random walk with
    per-sweep gain E[σ²_{t+1}/σ²_t] ≈ (n/(ν0+n)) · ((ν0+n)/(ν0+n−K−1))
    = n/(ν0+n−K−1): the shrink factor n/(ν0+n) times the Jensen factor
    from drawing σ² = 1/Λ_d of an inverse-Wishart marginal. At ν0=K the
    gain is n/(n−1) > 1 — a slow exponential blow-up of one factor
    column, observed empirically on planted matrices (a single entity's
    factor drifts to norm ≫ posterior scale over tens of sweeps). ν0=K+2
    makes the gain n/(n+1) < 1 and the prior density vanish at singular
    Λ, eliminating the runaway while staying a legitimate, proper NW
    prior."""
    k = len(sum_u)
    nu0 = df0 if df0 is not None else k + 2
    if n == 0:
        lam = wishart_sample(nu0, np.eye(k), rng)
        mu = rng.standard_normal(k) / np.sqrt(b0)
        return mu, lam
    ubar = sum_u / n
    s = sum_uut / n - np.outer(ubar, ubar)  # covariance moment
    kappa_n = b0 + n
    nu_n = nu0 + n
    w0_inv = np.eye(k)
    wn_inv = w0_inv + n * s + (b0 * n / kappa_n) * np.outer(ubar, ubar)
    wn = np.linalg.inv(wn_inv)
    wn = (wn + wn.T) / 2
    lam = wishart_sample(nu_n, wn, rng)
    mu_mean = (n * ubar) / kappa_n
    cov = np.linalg.inv(kappa_n * lam)
    mu = rng.multivariate_normal(mu_mean, (cov + cov.T) / 2)
    return mu, lam


def wishart_sample(df: float, scale: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Bartlett decomposition Wishart sampler."""
    k = scale.shape[0]
    chol = np.linalg.cholesky(scale)
    a = np.zeros((k, k))
    for i in range(k):
        a[i, i] = np.sqrt(rng.chisquare(df - i))
        for j in range(i):
            a[i, j] = rng.standard_normal()
    l = chol @ a
    return l @ l.T


def sample_lambda_beta(
    beta: np.ndarray, rng: np.random.Generator, a0: float = 1.0, b0_: float = 1.0
) -> float:
    """Gamma posterior for the link-matrix regularizer λ_β [paper:Macau]."""
    d, k = beta.shape
    shape = a0 + 0.5 * d * k
    rate = b0_ + 0.5 * float((beta * beta).sum())
    return float(rng.gamma(shape, 1.0 / rate))
