"""Probit data augmentation for binary relations (SURVEY §2.I [api]
``class_cut``): when a relation's observations are binary, the reference
trains via Albert–Chib augmentation — latent z_ij ~ N(u_i·v_j, 1)
truncated to the side the label dictates, then the Gaussian kernels run
on z unchanged [paper:BPMF-binary / Albert & Chib 1993].

Engine split of the work (all O(cells), retry-idempotent):
- per-cell prediction u·v: JVM-side join + zip_with/aggregate;
- per-cell uniform draw: JVM-side xxhash64 of the cell key, seed and
  sweep → mod 2⁵³ → [0, 1) — deterministic under task retries;
- inverse-CDF truncation (the only transcendental step): ONE Arrow-
  vectorized pandas_udf mapping (pred, u, y) → z.

No scipy dependency: Φ uses the Abramowitz–Stegun 7.1.26 erf rational
approximation (|err| < 1.5e-7), Φ⁻¹ uses Acklam's rational approximation
(|rel err| < 1.15e-9) — both public-domain constants, vectorized numpy.
Sampling noise swamps both errors.
"""

from __future__ import annotations

import numpy as np

# ---------- normal CDF / inverse CDF (vectorized, numpy-only) ----------

_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf(x: np.ndarray) -> np.ndarray:
    sign = np.sign(x)
    ax = np.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    poly = t * (
        _ERF_A[0]
        + t * (_ERF_A[1] + t * (_ERF_A[2] + t * (_ERF_A[3] + t * _ERF_A[4])))
    )
    return sign * (1.0 - poly * np.exp(-ax * ax))


def norm_cdf(x: np.ndarray) -> np.ndarray:
    """Φ(x), vectorized."""
    return 0.5 * (1.0 + _erf(np.asarray(x, dtype=np.float64) / np.sqrt(2.0)))


_PPF_A = (
    -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
    1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
)
_PPF_B = (
    -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
    6.680131188771972e01, -1.328068155288572e01,
)
_PPF_C = (
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
    -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
)
_PPF_D = (
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
    3.754408661907416e00,
)
_PLOW = 0.02425


def norm_ppf(p: np.ndarray) -> np.ndarray:
    """Φ⁻¹(p), vectorized (Acklam). p must lie in (0, 1)."""
    p = np.asarray(p, dtype=np.float64)
    out = np.empty_like(p)

    lo = p < _PLOW
    hi = p > 1.0 - _PLOW
    mid = ~(lo | hi)

    if np.any(mid):
        q = p[mid] - 0.5
        r = q * q
        num = ((((_PPF_A[0] * r + _PPF_A[1]) * r + _PPF_A[2]) * r + _PPF_A[3]) * r + _PPF_A[4]) * r + _PPF_A[5]
        den = ((((_PPF_B[0] * r + _PPF_B[1]) * r + _PPF_B[2]) * r + _PPF_B[3]) * r + _PPF_B[4]) * r + 1.0
        out[mid] = q * num / den
    if np.any(lo):
        q = np.sqrt(-2.0 * np.log(p[lo]))
        num = ((((_PPF_C[0] * q + _PPF_C[1]) * q + _PPF_C[2]) * q + _PPF_C[3]) * q + _PPF_C[4]) * q + _PPF_C[5]
        den = (((_PPF_D[0] * q + _PPF_D[1]) * q + _PPF_D[2]) * q + _PPF_D[3]) * q + 1.0
        out[lo] = num / den
    if np.any(hi):
        q = np.sqrt(-2.0 * np.log(1.0 - p[hi]))
        num = ((((_PPF_C[0] * q + _PPF_C[1]) * q + _PPF_C[2]) * q + _PPF_C[3]) * q + _PPF_C[4]) * q + _PPF_C[5]
        den = (((_PPF_D[0] * q + _PPF_D[1]) * q + _PPF_D[2]) * q + _PPF_D[3]) * q + 1.0
        out[hi] = -num / den
    return out


def phi_col(x):
    """Φ(x) as a pure JVM Column expression (same Abramowitz–Stegun 7.1.26
    erf approximation as ``norm_cdf``, |err| < 1.5e-7) — keeps probit
    probability scoring inside whole-stage codegen, no Python in the path."""
    from pyspark.sql import functions as F

    z = x / F.lit(float(np.sqrt(2.0)))
    sign = F.when(z < 0, -1.0).otherwise(1.0)
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERF_P) * az)
    poly = t * (
        F.lit(_ERF_A[0])
        + t
        * (
            F.lit(_ERF_A[1])
            + t * (F.lit(_ERF_A[2]) + t * (F.lit(_ERF_A[3]) + t * F.lit(_ERF_A[4])))
        )
    )
    erf = sign * (F.lit(1.0) - poly * F.exp(-az * az))
    return F.lit(0.5) * (F.lit(1.0) + erf)


def truncnorm_z(pred: np.ndarray, u: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Albert–Chib latent draw: z ~ N(pred, 1) truncated to z > 0 when
    y = 1, z ≤ 0 when y = 0, using the inverse-CDF transform of the given
    uniforms u ∈ [0, 1).

        Φ_lo = Φ(−pred) = P(z ≤ 0)
        y=1:  z = pred + Φ⁻¹(Φ_lo + u · (1 − Φ_lo))
        y=0:  z = pred + Φ⁻¹(u · Φ_lo)
    """
    pred = np.asarray(pred, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p_lo = norm_cdf(-pred)
    p = np.where(y > 0.5, p_lo + u * (1.0 - p_lo), u * p_lo)
    # clip away from {0, 1}: extreme preds would otherwise hit ±inf; the
    # clip bounds |z − pred| at Φ⁻¹(1e−12) ≈ 7 — inside float comfort
    p = np.clip(p, 1e-12, 1.0 - 1e-12)
    return pred + norm_ppf(p)
