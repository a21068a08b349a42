"""Distributed conjugate gradient for the Macau link matrix (SURVEY I5, I6).

Solves (FᵀF + λ I) X = B for K right-hand-sides without ever forming FᵀF —
the Macau paper's central scalability device [paper:Macau]: side-info
dimensionality D up to 10⁵–10⁶ makes the D×D normal matrix infeasible, but
the matvec FᵀF·x = Fᵀ(F·x) is two sparse products.

Engine mapping (the reference's ParallelSBM multi-process matvec
[upstream:src/ParallelSBM.jl — UNVERIFIED] is *free* in Spark):

    F stored COO: (id: long, feat: long, v: double), partitioned by id.
    y = F·x  : x (D×K, driver) ships as a BROADCAST (feat, x) table →
               map-side join on feat → zip-multiply → groupBy(id).
               y stays a DISTRIBUTED DataFrame — N×K never touches the
               driver.
    z = Fᵀ·y : join COO ⋈ y on id (COO already partitioned by id) →
               zip-multiply → groupBy(feat) → D×K Arrow collect.

Per CG iteration: one D×K broadcast up, one D×K collect down, two
shuffles — the driver only ever holds D×K/K×K objects, matching the
paper's bulk-synchronous blocked matvec at any N. All per-row arithmetic
is JVM higher-order functions (``transform``) — no Python worker in the
loop.

The K RHS are batched into one matvec per iteration (x is D×K), so the
sweep costs O(cg_iters) Spark jobs regardless of K.

For moderate D (D ≤ direct threshold) the Gram matrix FᵀF is computed
distributed ONCE (F is static across sweeps) and every per-sweep β solve
is a driver-side D×D Cholesky — CG's per-iteration job overhead only pays
off when D×D no longer fits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.session import shuffle_partitions


def features_to_coo(side_info: DataFrame) -> DataFrame:
    """(id, features: array<float>) → COO (id, feat, v), the sparse layout
    the matvecs operate on. Dense arrays explode to dim·N rows; genuinely
    sparse features should be stored COO at rest. Zero entries are dropped
    (they contribute nothing to either matvec)."""
    return (
        side_info.select(
            F.col("id"),
            F.posexplode("features").alias("feat", "v"),
        )
        .select("id", "feat", F.col("v").cast("double").alias("v"))
        .filter(F.col("v") != 0.0)
    )


def _elementwise_sum(col: str, k: int) -> F.Column:
    """array<double> aggregate: element-wise sum of K-dim arrays — K plain
    SUM aggregates (partial-aggregated map-side) reassembled into an array."""
    return F.array(*[F.sum(F.element_at(col, i + 1)) for i in range(k)])


class DistributedMatvec:
    """y = F·X (distributed result) and z = Fᵀ·Y (D×K driver result) for a
    COO feature matrix. The driver never holds anything larger than D×K;
    feature ids must lie in [0, n_feats)."""

    def __init__(
        self,
        spark: SparkSession,
        coo: DataFrame,
        n_rows: int,
        n_feats: int,
        n_parts: int | None = None,
    ):
        self.spark = spark
        n_parts = n_parts or shuffle_partitions(spark)
        # partition by id once: Fᵀ·y joins on id every CG iteration without
        # re-shuffling the (large) COO side
        self.coo = coo.repartition(n_parts, "id").persist()
        self.n_rows = n_rows
        self.n_feats = n_feats

    def _x_table(self, x: np.ndarray) -> DataFrame:
        """Ship a D×K driver matrix as a broadcastable (feat, x) table via
        one Arrow upload."""
        pdf = pd.DataFrame(
            {"feat": np.arange(x.shape[0], dtype=np.int64), "x": list(x)}
        )
        return F.broadcast(self.spark.createDataFrame(pdf))

    def fx_df(self, x: np.ndarray) -> DataFrame:
        """F·x for x (D, K) → DISTRIBUTED (id, y: array<double>) — the N×K
        result never leaves the executors. Map-side broadcast join + one
        groupBy(id) shuffle; all arithmetic JVM-side."""
        k = x.shape[1]
        scaled = self.coo.join(self._x_table(x), "feat").select(
            "id", F.transform("x", lambda e: e * F.col("v")).alias("c")
        )
        return scaled.groupBy("id").agg(_elementwise_sum("c", k).alias("y"))

    def fty_df(self, y: DataFrame, k: int, y_col: str = "y") -> np.ndarray:
        """Fᵀ·y for a distributed y (id, <y_col>: array<double>) → (D, K)
        driver numpy. COO is pre-partitioned by id, so only the (smaller)
        y side shuffles into the join; groupBy(feat) partial-aggregates
        map-side down to ≤ D×K per partition."""
        joined = self.coo.join(y.select("id", y_col), "id").select(
            "feat", F.transform(y_col, lambda e: e * F.col("v")).alias("c")
        )
        rows = (
            joined.groupBy("feat").agg(_elementwise_sum("c", k).alias("z")).toPandas()
        )
        out = np.zeros((self.n_feats, k))
        if len(rows):
            out[rows["feat"].to_numpy(dtype=np.int64)] = np.stack(
                rows["z"].to_numpy()
            )
        return out

    def normal_matvec(self, x: np.ndarray, lam: float) -> np.ndarray:
        """(FᵀF + λI)·x: F·x stays distributed between the two passes —
        one broadcast up (D×K), one collect down (D×K)."""
        return self.fty_df(self.fx_df(x), x.shape[1]) + lam * x

    def gram(self) -> np.ndarray:
        """FᵀF (D×D) computed distributed — run ONCE at init for the
        direct path (F is static across sweeps). Only call when D×D
        comfortably fits on the driver.

        Shape: each id-block computes its partial Gram with numpy OUTER
        PRODUCTS (BLAS) inside one Arrow batch and emits it as sparse
        (fi, fj, g) rows — at most D² per block, pre-aggregated before the
        shuffle. The r5 version self-joined the COO on id, generating
        nnz_i² join rows per instance in-task and summing them as a Spark
        agg; the per-block outer product does the same arithmetic several
        times cheaper and bounds the shuffle at n_blocks·D² rows
        regardless of instance degree."""
        d = self.n_feats

        def _partial(pdf):
            g = np.zeros((d, d))
            for _, grp in pdf.groupby("id"):
                f = grp["feat"].to_numpy(np.int64)
                v = grp["v"].to_numpy(np.float64)
                g[np.ix_(f, f)] += np.outer(v, v)
            fi, fj = np.nonzero(g)
            return pd.DataFrame({"fi": fi, "fj": fj, "g": g[fi, fj]})

        n_parts = self.coo.rdd.getNumPartitions()
        rows = (
            self.coo.withColumn("__b", F.pmod(F.col("id"), F.lit(n_parts)))
            .groupBy("__b")
            .applyInPandas(
                lambda pdf: _partial(pdf.drop(columns="__b")),
                schema="fi long, fj long, g double",
            )
            .groupBy("fi", "fj")
            .agg(F.sum("g").alias("g"))
            .toPandas()
        )
        gram = np.zeros((d, d))
        gram[rows["fi"].to_numpy(dtype=np.int64), rows["fj"].to_numpy(dtype=np.int64)] = (
            rows["g"].to_numpy(dtype=np.float64)
        )
        return gram

    def unpersist(self) -> None:
        self.coo.unpersist()


def cg_solve(
    mv: DistributedMatvec,
    b: np.ndarray,
    lam: float,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> np.ndarray:
    """Batched CG on the normal equations; all K RHS share each matvec.

    Plain CG per column but with the matvec applied to the whole block —
    per-column α/β scalars, joint convergence on the max residual. Driver
    state: x, r, p — each D×K.
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
