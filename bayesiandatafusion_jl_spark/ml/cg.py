"""Distributed conjugate gradient for the Macau link matrix (SURVEY I5, I6).

Solves (FᵀF + λ I) X = B for K right-hand-sides without ever forming FᵀF —
the Macau paper's central scalability device [paper:Macau]: side-info
dimensionality D up to 10⁵–10⁶ makes the D×D normal matrix infeasible, but
the matvec FᵀF·x = Fᵀ(F·x) is two sparse products.

Engine mapping (the reference's ParallelSBM multi-process matvec
[upstream:src/ParallelSBM.jl — UNVERIFIED] is *free* in Spark):

    F stored COO: (id: long, feat: long, v: double), co-partitioned by id.
    y = F·x  : broadcast x (D-dim) → map-side v * x[feat] → groupBy(id)
    z = Fᵀ·y : broadcast y join on id → groupBy(feat) sum(v * y[id])

Each CG iteration is therefore 2 shuffles (by id, by feat) of the COO —
at 1000 executors this is a bulk-synchronous sparse matvec, the same
communication pattern as the paper's blocked implementation.

The K RHS are batched into one matvec per iteration (x is D×K), so the
sweep costs O(cg_iters) Spark jobs regardless of K.

For moderate D (≲ 10⁴) the driver solves directly from the Gram matrix —
computed distributed in one pass — because CG's per-iteration job overhead
only pays off when D×D no longer fits (the ``direct`` flag).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def features_to_coo(side_info: DataFrame) -> DataFrame:
    """(id, features: array<float>) → COO (id, feat, v), the sparse layout
    CG operates on. Dense arrays explode to dim·N rows; genuinely sparse
    features should be stored COO at rest."""
    return side_info.select(
        F.col("id"),
        F.posexplode("features").alias("feat", "v"),
    ).select("id", "feat", F.col("v").cast("double").alias("v"))


class DistributedMatvec:
    """y = F·X and z = Fᵀ·Y for a COO feature matrix, X/Y driver-side
    numpy (D×K / N×K), F distributed."""

    def __init__(self, spark: SparkSession, coo: DataFrame, n_rows: int, n_feats: int):
        self.spark = spark
        self.coo = coo.persist()
        self.n_rows = n_rows
        self.n_feats = n_feats
        # row-id ordering maps between DataFrame ids and numpy offsets
        self.row_ids = np.array(
            [r[0] for r in coo.select("id").distinct().orderBy("id").collect()]
        )
        self.feat_ids = np.array(
            [r[0] for r in coo.select("feat").distinct().orderBy("feat").collect()]
        )

    def fx(self, x: np.ndarray) -> np.ndarray:
        """F·x for x (D, K) → (N, K), one distributed pass."""
        k = x.shape[1]
        xb = self.spark.sparkContext.broadcast({int(f): x[d] for d, f in enumerate(self.feat_ids)})

        @F.pandas_udf("array<double>")
        def _contrib(feat, v):
            import pandas as pd  # local: executor side

            lut = xb.value
            return pd.Series(
                [(lut[int(f)] * float(vv)).tolist() for f, vv in zip(feat, v)]
            )

        rows = (
            self.coo.withColumn("c", _contrib("feat", "v"))
            .groupBy("id")
            .agg(
                F.array(
                    *[F.sum(F.element_at("c", i + 1)).alias(f"s{i}") for i in range(k)]
                ).alias("y")
            )
            .orderBy("id")
            .collect()
        )
        out = np.zeros((len(self.row_ids), k))
        pos = {int(i): n for n, i in enumerate(self.row_ids)}
        for r in rows:
            out[pos[int(r["id"])]] = r["y"]
        return out

    def fty(self, y: np.ndarray) -> np.ndarray:
        """Fᵀ·y for y (N, K) → (D, K), one distributed pass."""
        k = y.shape[1]
        yb = self.spark.sparkContext.broadcast({int(i): y[n] for n, i in enumerate(self.row_ids)})

        @F.pandas_udf("array<double>")
        def _contrib(idc, v):
            import pandas as pd

            lut = yb.value
            return pd.Series(
                [(lut[int(i)] * float(vv)).tolist() for i, vv in zip(idc, v)]
            )

        rows = (
            self.coo.withColumn("c", _contrib("id", "v"))
            .groupBy("feat")
            .agg(
                F.array(
                    *[F.sum(F.element_at("c", i + 1)).alias(f"s{i}") for i in range(k)]
                ).alias("z")
            )
            .orderBy("feat")
            .collect()
        )
        out = np.zeros((len(self.feat_ids), k))
        pos = {int(f): d for d, f in enumerate(self.feat_ids)}
        for r in rows:
            out[pos[int(r["feat"])]] = r["z"]
        return out

    def normal_matvec(self, x: np.ndarray, lam: float) -> np.ndarray:
        """(FᵀF + λI)·x in two distributed passes."""
        return self.fty(self.fx(x)) + lam * x


def cg_solve(
    mv: DistributedMatvec,
    b: np.ndarray,
    lam: float,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> np.ndarray:
    """Batched CG on the normal equations; all K RHS share each matvec.

    Plain CG per column but with the matvec applied to the whole block —
    per-column α/β scalars, joint convergence on the max residual.
    """
    x = np.zeros_like(b)
    r = b - mv.normal_matvec(x, lam)
    p = r.copy()
    rs = (r * r).sum(axis=0)
    b_norm = np.maximum(np.sqrt((b * b).sum(axis=0)), 1e-30)
    for _ in range(max_iter):
        ap = mv.normal_matvec(p, lam)
        pap = (p * ap).sum(axis=0)
        alpha = np.where(pap > 0, rs / np.maximum(pap, 1e-300), 0.0)
        x = x + p * alpha
        r = r - ap * alpha
        rs_new = (r * r).sum(axis=0)
        if np.all(np.sqrt(rs_new) / b_norm < tol):
            break
        beta = rs_new / np.maximum(rs, 1e-300)
        p = r + p * beta
        rs = rs_new
    return x


def gram_direct_solve(
    spark: SparkSession, coo: DataFrame, b: np.ndarray, lam: float
) -> np.ndarray:
    """Direct path for moderate D: Gram = FᵀF computed distributed in one
    self-join pass, Cholesky solve on the driver. Used when D² fits
    comfortably in driver memory (D ≲ 10⁴)."""
    a = coo.alias("a")
    bb = coo.alias("b")
    gram_rows = (
        a.join(bb, F.col("a.id") == F.col("b.id"))
        .groupBy(F.col("a.feat").alias("fi"), F.col("b.feat").alias("fj"))
        .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("g"))
        .collect()
    )
    d = b.shape[0]
    gram = np.zeros((d, d))
    for r in gram_rows:
        gram[int(r["fi"]), int(r["fj"])] = r["g"]
    return np.linalg.solve(gram + lam * np.eye(d), b)
