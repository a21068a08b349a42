"""BPMF / Macau Gibbs training harness (SURVEY §2.I, EP2).

One Gibbs sweep = one Spark job DAG per entity, orchestrated by a plain
Python loop on the driver (the reference's sweep loop
[upstream:src/macau.jl — UNVERIFIED], re-expressed):

    for sweep:
      for each entity e:
        (μ_e, Λ_e) ~ NormalWishart(moments of U_e [− F β offset])   (I4, driver)
        if e has side info: β_e ~ exact posterior via solver         (I5)
        U_e ← join(train cells ⋈ opposing factors)                   (I3)
               .groupBy(block).applyInPandas(sample_block)
        cold-start instances ← prior_block                           (C6 shape)
      after burnin: accumulate test predictions                      (I7/I11)

Scale discipline (SURVEY §4, §7 hard parts):
- factor DataFrames are persisted and ``localCheckpoint``-ed every sweep —
  without lineage truncation the plan doubles per iteration and planning
  time explodes;
- opposing-factor tables are broadcast when small (dimension side of the
  ChEMBL example), else sort-merge joined on the co-partitioned COO;
- the groupBy(block) shuffle is the only wide motion per update; blocks =
  shuffle partitions so every core gets one Arrow batch;
- per-(seed, sweep, instance) RNG keys → task-retry-idempotent sampling.

Supports arity-2 (matrix), arity-m (tensor, I9 — opposing factors combine
by Hadamard product [paper:Macau §tensor]) and collective factorization
(I10 — an entity shared by several relations fuses all their cells in one
update, with per-relation α).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from functools import reduce

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.ml import kernels
from bayesiandatafusion_jl_spark.ml.nw import (
    sample_lambda_beta,
    sample_normal_wishart,
)
from bayesiandatafusion_jl_spark.ml.relation import RelationData

BROADCAST_MAX_ROWS = 1_000_000  # factor tables up to ~K·8·1e6 B comfortably broadcast


def _entity_seed(seed: int, name: str) -> int:
    """Entity-decorrelated RNG sub-seed. Without this, instance i of entity A
    and instance i of entity B would draw identical noise at every sweep
    (same (seed, sweep, id) key), correlating the factor chains. crc32, not
    hash(str): str hashing is PYTHONHASHSEED-randomized across executor
    processes."""
    return (seed * 1_000_003 + zlib.crc32(name.encode())) % (2**31)


def _moments_fn(k):
    def f(pdf):
        return kernels.moments_block(pdf.drop(columns="__b"), k)

    return f


def _sample_fn(k, mu, lam, seed, sweep, off_col):
    def f(pdf):
        return kernels.sample_block(
            pdf, k, 1.0, mu, lam, seed, sweep, off_col=off_col, alpha_col="__alpha"
        )

    return f


def _prior_fn(k, mu, lam, seed, sweep):
    def f(pdf):
        return kernels.prior_block(pdf.drop(columns="__b"), k, mu, lam, seed, sweep)

    return f


def _partial_fn(k):
    def f(pdf):
        return kernels.partial_stats_block(pdf.drop(columns="__b"), k)

    return f


def _combine_fn(k, mu, lam, seed, sweep, off_col):
    def f(pdf):
        return kernels.combine_sample_block(
            pdf.drop(columns="__b"), k, mu, lam, seed, sweep, off_col=off_col
        )

    return f



@dataclass
class TrainResult:
    factors: dict[str, DataFrame]
    pred_mean: DataFrame | None
    rmse_trace: list[float] = field(default_factory=list)
    rmse: float | None = None
    auc: float | None = None  # set when the relation has class_cut [api]
    beta: dict[str, np.ndarray] = field(default_factory=dict)
    hyper: dict[str, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)


def _auc_of(pred_mean: DataFrame, class_cut: float) -> float | None:
    """Tie-averaged Mann–Whitney AUC of posterior-mean predictions against
    the class_cut-binarized truth (macau reports AUC when class_cut is set
    [api]) — the same rank formulation as q_ml_auc/E2."""
    from pyspark.sql import Window

    ranked = pred_mean.select(
        F.when(F.col("y") > class_cut, 1).otherwise(0).alias("label"),
        (
            F.rank().over(Window.orderBy("pred"))
            + (F.count(F.lit(1)).over(Window.partitionBy("pred")) - 1) / 2.0
        ).alias("avg_rank"),
    )
    npos = F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).cast("double")
    nneg = F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).cast("double")
    rpos = F.sum(F.when(F.col("label") == 1, F.col("avg_rank")))
    row = ranked.agg(
        ((rpos - npos * (npos + 1) / 2.0) / (npos * nneg)).alias("auc")
    ).collect()[0]
    return None if row["auc"] is None else float(row["auc"])


def _maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= BROADCAST_MAX_ROWS else df


def _hadamard(cols: list[str]) -> F.Column:
    """Element-wise product of K-dim factor arrays (tensor mode, I9)."""
    return reduce(lambda a, b: F.zip_with(a, b, lambda x, y: x * y), [F.col(c) for c in cols])


class MacauTrainer:
    def __init__(
        self,
        spark: SparkSession,
        rd: RelationData,
        num_latent: int = 16,
        burnin: int = 10,
        psamples: int = 10,
        seed: int = 42,
        n_blocks: int | None = None,
        lambda_beta: float = 5.0,
        center: bool = True,
        track_rmse: bool = True,
        side_driver_max_cells: int = 4_000_000,
        cg_tol: float = 1e-6,
        cg_max_iter: int = 50,
        skew_salt: int | None = None,
        n_chains: int = 1,
    ):
        self.spark = spark
        self.rd = rd
        self.k = num_latent
        self.burnin = burnin
        self.psamples = psamples
        self.seed = seed
        self.n_blocks = n_blocks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self.lambda_beta = {e: lambda_beta for e in rd.entities}
        self.center = center
        self.track_rmse = track_rmse  # False: skip per-sample RMSE collects
        # N·D above this → CG path: F stays a distributed COO, never a
        # driver-side dense matrix [paper:Macau]
        self.side_driver_max_cells = side_driver_max_cells
        self.cg_tol = cg_tol
        self.cg_max_iter = cg_max_iter
        # >1: two-phase skew-resistant update — per-(instance, salt) partial
        # sufficient stats, then combine+sample per instance. Bounds the
        # largest Arrow group for power-law entity degrees.
        self.skew_salt = skew_salt
        # >1: independent restarts through burnin, keep the chain with the
        # best TRAIN rmse for posterior sampling. CP-tensor posteriors are
        # multimodal — a single chain lands in a metastable non-fitting mode
        # with non-trivial probability and stays there for hundreds of
        # sweeps (verified empirically; 100-sweep chains still stuck), so
        # restarts are the standard remedy. Chains are sequential here but
        # independent — on a cluster they parallelize as separate jobs.
        self.n_chains = n_chains
        self._lambda_beta0 = lambda_beta
        self.rng = np.random.default_rng(seed)

        self.factors: dict[str, DataFrame] = {}
        self.hyper: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.beta: dict[str, np.ndarray] = {}
        self.offsets: dict[str, DataFrame] = {}
        self.side_np: dict[str, tuple[np.ndarray, np.ndarray]] = {}  # ids, F matrix
        self.side_cg: dict[str, object] = {}  # entity -> DistributedMatvec (large D)
        self.global_mean = 0.0
        self._entity_counts: dict[str, int] = {}

    # ---------- setup ----------

    def _entity_universe(self, name: str) -> DataFrame:
        """All instance ids of an entity = ids seen in any relation ∪ side
        info ids (cold-start instances exist only in side info)."""
        parts = []
        for rel, mode in self.rd.relations_of(name):
            parts.append(rel.df.select(F.col(rel.entities[mode]).cast("long").alias("id")))
        ent = self.rd.entities[name]
        if ent.side_info is not None:
            parts.append(ent.side_info.select(F.col("id").cast("long")))
        return reduce(lambda a, b: a.unionByName(b), parts).distinct()

    def _init(self) -> None:
        k, seed = self.k, self.seed
        if self.center:
            tot, cnt = 0.0, 0
            for rel in self.rd.relations:
                df = rel.df
                if "split" in df.columns:
                    df = df.filter(F.col("split") == "train")
                row = df.agg(
                    F.sum(rel.value_col).alias("s"), F.count(F.lit(1)).alias("c")
                ).collect()[0]
                tot += row["s"] or 0.0
                cnt += row["c"]
            self.global_mean = tot / max(cnt, 1)

        def _make_init_fn(eseed):
            # factory, not default-arg: applyInPandas dispatches on arg count,
            # so a 2-arg closure would be mistaken for the (key, pdf) form
            def _init_fn(pdf):
                return kernels.init_factors_pdf(pdf.drop(columns="__b"), k, eseed)

            return _init_fn

        self._cold = {}
        for name, ent in self.rd.entities.items():
            universe = self._entity_universe(name)
            _init_fn = _make_init_fn(_entity_seed(seed, name))

            init = universe.withColumn(
                "__b", F.pmod(F.col("id"), F.lit(self.n_blocks))
            ).groupBy("__b").applyInPandas(
                _init_fn, schema="id long, factor array<double>"
            )
            self.factors[name] = init.persist()
            self.factors[name] = self.factors[name].localCheckpoint()
            self._entity_counts[name] = self.factors[name].count()
            # static cold-start set: train split never changes across
            # sweeps, so compute the unobserved-instance ids once
            observed = []
            for rel, mode in self.rd.relations_of(name):
                rdf = rel.df
                if "split" in rdf.columns:
                    rdf = rdf.filter(F.col("split") == "train")
                observed.append(
                    rdf.select(F.col(rel.entities[mode]).cast("long").alias("id"))
                )
            obs = reduce(lambda a, b: a.unionByName(b), observed).distinct()
            missing = universe.join(obs, "id", "left_anti").persist()
            if missing.count() == 0:
                missing.unpersist()
                self._cold[name] = None
            else:
                self._cold[name] = missing.localCheckpoint()
            self.hyper[name] = (np.zeros(k), np.eye(k))
            if ent.side_info is not None:
                n_side = ent.side_info.count()
                d = len(
                    ent.side_info.select("features").limit(1).collect()[0][0]
                )
                if n_side * d <= self.side_driver_max_cells:
                    rows = (
                        ent.side_info.select("id", "features").orderBy("id").collect()
                    )
                    ids = np.array([r["id"] for r in rows], dtype=np.int64)
                    fm = np.stack(
                        [np.asarray(r["features"], dtype=np.float64) for r in rows]
                    )
                    self.side_np[name] = (ids, fm)
                else:
                    # Macau's scalability device [paper:Macau]: F never
                    # densifies; matvecs run as distributed join+agg
                    from bayesiandatafusion_jl_spark.ml.cg import (
                        DistributedMatvec,
                        features_to_coo,
                    )

                    coo = features_to_coo(ent.side_info)
                    self.side_cg[name] = DistributedMatvec(
                        self.spark, coo, n_side, d
                    )
                self.beta[name] = np.zeros((d, k))
                self._refresh_offsets(name)

    def _refresh_offsets(self, name: str) -> None:
        """offset_i = βᵀ f_i as a DataFrame (id, __off). Dense path: driver
        matmul; CG path: distributed F·β matvec (F never densifies)."""
        if name in self.side_np:
            ids, fm = self.side_np[name]
            off = fm @ self.beta[name]
        else:
            mv = self.side_cg[name]
            ids = mv.row_ids
            off = mv.fx(self.beta[name])
        pdf_rows = [(int(i), off[n].tolist()) for n, i in enumerate(ids)]
        df = self.spark.createDataFrame(pdf_rows, schema="id long, __off array<double>")
        self.offsets[name] = F.broadcast(df)

    # ---------- per-sweep steps ----------

    def _moments(self, name: str) -> tuple[int, np.ndarray, np.ndarray]:
        """Distributed partial moments (I4): per-block (n, Σu, Σuuᵀ), driver
        reduces ~n_blocks rows. For Macau the moments are of the residual
        u − βᵀf (the NW prior governs the residual [paper:Macau])."""
        fac = self.factors[name]
        if name in self.offsets:
            fac = fac.join(self.offsets[name], "id", "left").select(
                "id",
                F.when(
                    F.col("__off").isNotNull(),
                    F.zip_with("factor", "__off", lambda a, b: a - b),
                )
                .otherwise(F.col("factor"))
                .alias("factor"),
            )
        k = self.k
        parts = (
            fac.withColumn("__b", F.pmod(F.col("id"), F.lit(self.n_blocks)))
            .groupBy("__b")
            .applyInPandas(
                _moments_fn(k),
                schema="n long, sum_u array<double>, sum_uut array<double>",
            )
            .collect()
        )
        n = sum(r["n"] for r in parts)
        su = np.sum([np.array(r["sum_u"]) for r in parts], axis=0)
        suu = np.sum([np.array(r["sum_uut"]).reshape(k, k) for r in parts], axis=0)
        return n, su, suu

    def _sample_beta(self, name: str) -> None:
        """I5 — link matrix via the exact Bhattacharya–Mallick sampler:

            β_k = (λ_u FᵀF + λ_β I)⁻¹ (λ_u Fᵀũ_k + √λ_u Fᵀe₁ + √λ_β e₂)

        which is a *sample* from the β posterior (mean/cov check out by
        direct computation). λ_u = mean diag(Λ) (exact when Λ isotropic —
        the property-tested regime; documented approximation otherwise).
        Dense path (N·D small): driver-side solve of the D×D system.
        CG path (large D): identical math, but rhs = Fᵀ(λ_u ũ + √λ_u e₁)
        runs as ONE distributed transpose-matvec and the system
        (FᵀF + (λ_β/λ_u) I) β = rhs/λ_u is solved by batched CG whose
        matvecs are distributed join+aggs — FᵀF is never formed
        [paper:Macau]."""
        mu, lam = self.hyper[name]
        lam_u = float(np.mean(np.diag(lam)))
        lam_b = self.lambda_beta[name]
        dense = name in self.side_np
        if dense:
            ids, fm = self.side_np[name]
            d = fm.shape[1]
        else:
            mv = self.side_cg[name]
            ids = mv.row_ids
            d = mv.n_feats
        # collect this entity's factors aligned to side-info ids (N×K — the
        # factor block; Macau's D is the scale axis, not N)
        rows = {r["id"]: np.array(r["factor"]) for r in self.factors[name].collect()}
        u = np.stack([rows.get(int(i), np.zeros(self.k)) for i in ids])
        ut = u - mu  # residual target
        e1 = self.rng.standard_normal(u.shape)
        e2 = self.rng.standard_normal((d, self.k))
        if dense:
            rhs = (
                lam_u * fm.T @ ut
                + np.sqrt(lam_u) * (fm.T @ e1)
                + np.sqrt(lam_b) * e2
            )
            a = lam_u * (fm.T @ fm) + lam_b * np.eye(d)
            self.beta[name] = np.linalg.solve(a, rhs)
        else:
            from bayesiandatafusion_jl_spark.ml.cg import cg_solve

            rhs = mv.fty(lam_u * ut + np.sqrt(lam_u) * e1) + np.sqrt(lam_b) * e2
            self.beta[name] = cg_solve(
                mv,
                rhs / lam_u,
                lam_b / lam_u,
                tol=self.cg_tol,
                max_iter=self.cg_max_iter,
            )
        self.lambda_beta[name] = sample_lambda_beta(self.beta[name], self.rng)
        self._refresh_offsets(name)

    def _cell_inputs(self, name: str) -> DataFrame:
        """Fuse every relation's training cells for this entity into
        (__id, __val, __fac, __alpha): the opposing factor is the Hadamard
        product of all other modes' factors (arity-2 degenerates to the
        plain factor). Collective = unionByName across relations (I10)."""
        pieces = []
        for rel, mode in self.rd.relations_of(name):
            df = rel.df
            if "split" in df.columns:
                df = df.filter(F.col("split") == "train")
            df = df.withColumn("__val", F.col(rel.value_col) - F.lit(self.global_mean))
            fac_cols = []
            for m, other in enumerate(rel.entities):
                if m == mode:
                    continue
                fcol = f"__f{m}"
                other_fac = self.factors[other].select(
                    F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)
                )
                df = df.join(
                    _maybe_broadcast(other_fac, self._entity_counts[other]),
                    F.col(rel.entities[m]).cast("long") == F.col(f"__oid{m}"),
                )
                fac_cols.append(fcol)
            cols = [
                F.col(rel.entities[mode]).cast("long").alias("__id"),
                F.col("__val"),
                _hadamard(fac_cols).alias("__fac"),
                F.lit(rel.alpha).alias("__alpha"),
            ]
            if self.skew_salt:
                other_sum = reduce(
                    lambda a, b: a + b,
                    [
                        F.col(c).cast("long")
                        for m, c in enumerate(rel.entities)
                        if m != mode
                    ],
                )
                cols.append(
                    F.pmod(other_sum, F.lit(self.skew_salt)).alias("__salt")
                )
            df = df.select(*cols)
            pieces.append(df)
        return reduce(lambda a, b: a.unionByName(b), pieces)

    def _sample_entity(self, name: str, sweep: int) -> None:
        k, seed = self.k, _entity_seed(self.seed, name)
        mu, lam = self.hyper[name]
        cells = self._cell_inputs(name)
        off_col = "__off" if name in self.offsets else None
        if self.skew_salt:
            # two-phase: bounded partials per (id, salt), then a tiny
            # combine+sample per id — no straggler group for hot instances
            partials = (
                cells.withColumn(
                    "__b",
                    F.pmod(
                        F.col("__id") * F.lit(self.skew_salt) + F.col("__salt"),
                        F.lit(self.n_blocks * 4),
                    ),
                )
                .groupBy("__b")
                .applyInPandas(
                    _partial_fn(k),
                    schema="id long, salt long, srv array<double>, svv array<double>",
                )
            )
            if off_col:
                partials = partials.join(self.offsets[name], "id", "left")
            new = (
                partials.withColumn(
                    "__b", F.pmod(F.col("id"), F.lit(self.n_blocks))
                )
                .groupBy("__b")
                .applyInPandas(
                    _combine_fn(k, mu, lam, seed, sweep, off_col),
                    schema="id long, factor array<double>",
                )
            )
        else:
            if off_col:
                cells = cells.join(
                    self.offsets[name].select(F.col("id").alias("__id"), "__off"),
                    "__id",
                    "left",
                )
            new = (
                cells.withColumn("__b", F.pmod(F.col("__id"), F.lit(self.n_blocks)))
                .groupBy("__b")
                .applyInPandas(
                    _sample_fn(k, mu, lam, seed, sweep, off_col),
                    schema="id long, factor array<double>",
                )
            )
        # cold-start: instances with no training cells sample from the
        # prior. The train split is static, so the missing-id set was
        # computed ONCE at init (self._cold[name]) — no per-sweep
        # left_anti join, and entities with full observation coverage
        # skip the prior branch entirely (the common case).
        if self._cold.get(name) is None:
            updated = new.persist()
        else:
            missing = self._cold[name]
            if name in self.offsets:
                missing = missing.join(self.offsets[name], "id", "left")
            prior = (
                missing.withColumn("__b", F.pmod(F.col("id"), F.lit(self.n_blocks)))
                .groupBy("__b")
                .applyInPandas(
                    _prior_fn(k, mu, lam, seed, sweep),
                    schema="id long, factor array<double>",
                )
            )
            updated = new.unionByName(prior).persist()
        updated = updated.localCheckpoint()  # truncate lineage (SURVEY §7)
        old = self.factors[name]
        self.factors[name] = updated
        old.unpersist()

    # ---------- prediction ----------

    def _predict_sample(self, rel, test_df: DataFrame) -> DataFrame:
        """r̂ = global_mean + Σ_k Π_modes u^{(m)}_k — for arity 2 this is
        the dot product u·v [paper:BPMF]; tensors use the Hadamard sum."""
        df = test_df
        fac_cols = []
        for m, ent in enumerate(rel.entities):
            fcol = f"__f{m}"
            fdf = self.factors[ent].select(
                F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)
            )
            df = df.join(
                _maybe_broadcast(fdf, self._entity_counts[ent]),
                F.col(rel.entities[m]).cast("long") == F.col(f"__oid{m}"),
            )
            fac_cols.append(fcol)
        prod = _hadamard(fac_cols)
        pred = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) + F.lit(self.global_mean)
        return df.select(
            *[F.col(c) for c in rel.entities],
            F.col(rel.value_col).alias("y"),
            pred.alias("p"),
        )

    # ---------- main loop ----------

    def _gibbs_sweep(self, sweep: int) -> None:
        for name in self.rd.entities:
            n, su, suu = self._moments(name)
            self.hyper[name] = sample_normal_wishart(n, su, suu, self.rng)
            if name in self.side_np or name in self.side_cg:
                self._sample_beta(name)
            self._sample_entity(name, sweep)

    def _train_rmse(self) -> float:
        """Chain-selection criterion: rmse of the current single sample on
        the TRAIN cells (no test leakage)."""
        rel0 = self.rd.relations[0]
        df = rel0.df
        if "split" in df.columns:
            df = df.filter(F.col("split") == "train")
        pred = self._predict_sample(rel0, df)
        return float(
            pred.agg(
                F.sqrt(F.avg(F.pow(F.col("y") - F.col("p"), 2))).alias("r")
            ).collect()[0]["r"]
        )

    def train(self) -> TrainResult:
        base_seed = self.seed
        best: tuple[float, dict] | None = None
        for c in range(self.n_chains):
            # chain 0 keeps the raw seed → n_chains=1 is byte-identical to
            # the single-chain path (same kernel RNG keys, same rng stream)
            self.seed = (
                base_seed
                if c == 0
                else (base_seed * 2_654_435_761 + c * 40_503) % (2**31)
            )
            self.rng = np.random.default_rng(self.seed)
            self.factors, self.hyper, self.beta, self.offsets = {}, {}, {}, {}
            self.side_np, self.side_cg = {}, {}
            self.lambda_beta = {e: self._lambda_beta0 for e in self.rd.entities}
            self._init()
            for sweep in range(self.burnin):
                self._gibbs_sweep(sweep)
            if self.n_chains == 1:
                break
            tr = self._train_rmse()
            state = dict(
                factors=self.factors, hyper=self.hyper, beta=self.beta,
                offsets=self.offsets, lambda_beta=self.lambda_beta,
                side_np=self.side_np, side_cg=self.side_cg,
                rng=self.rng, seed=self.seed,
            )
            if best is None or tr < best[0]:
                if best is not None:
                    for df in best[1]["factors"].values():
                        df.unpersist()
                best = (tr, state)
            else:
                for df in self.factors.values():
                    df.unpersist()
        if best is not None:
            st = best[1]
            self.factors, self.hyper, self.beta = st["factors"], st["hyper"], st["beta"]
            self.offsets, self.lambda_beta = st["offsets"], st["lambda_beta"]
            self.side_np, self.side_cg = st["side_np"], st["side_cg"]
            self.rng, self.seed = st["rng"], st["seed"]

        rel0 = self.rd.relations[0]
        test_df = (
            rel0.df.filter(F.col("split") == "test")
            if "split" in rel0.df.columns
            else None
        )
        acc: DataFrame | None = None
        n_acc = 0
        trace: list[float] = []

        total = self.burnin + self.psamples
        for sweep in range(self.burnin, total):
            self._gibbs_sweep(sweep)

            if test_df is not None:
                pred = self._predict_sample(rel0, test_df)
                prev_acc = acc
                if acc is None:
                    acc = pred.select(
                        *rel0.entities, "y", F.col("p").alias("p_sum"),
                        (F.col("p") * F.col("p")).alias("p_sq"),
                    )
                else:
                    pred_only = pred.select(*rel0.entities, "p")
                    acc = (
                        acc.join(pred_only, on=[*rel0.entities], how="inner")
                        .select(
                            *rel0.entities,
                            "y",
                            (F.col("p_sum") + F.col("p")).alias("p_sum"),
                            (F.col("p_sq") + F.col("p") * F.col("p")).alias("p_sq"),
                        )
                    )
                acc = acc.persist().localCheckpoint()
                if prev_acc is not None:
                    prev_acc.unpersist()
                n_acc += 1
                if self.track_rmse:
                    rmse = acc.select(
                        F.sqrt(
                            F.avg(F.pow(F.col("y") - F.col("p_sum") / n_acc, 2))
                        ).alias("rmse")
                    ).collect()[0]["rmse"]
                    trace.append(float(rmse))

        pred_mean = None
        if acc is not None and n_acc > 0 and not self.track_rmse:
            # one final RMSE instead of one per sample
            rmse = acc.select(
                F.sqrt(
                    F.avg(F.pow(F.col("y") - F.col("p_sum") / n_acc, 2))
                ).alias("rmse")
            ).collect()[0]["rmse"]
            trace.append(float(rmse))
        if acc is not None and n_acc > 0:
            pred_mean = acc.select(
                *rel0.entities,
                "y",
                (F.col("p_sum") / n_acc).alias("pred"),
                F.sqrt(
                    F.greatest(
                        F.col("p_sq") / n_acc - F.pow(F.col("p_sum") / n_acc, 2),
                        F.lit(0.0),
                    )
                ).alias("pred_std"),
            )
        auc = None
        if pred_mean is not None and rel0.class_cut is not None:
            auc = _auc_of(pred_mean, rel0.class_cut)
        return TrainResult(
            factors=self.factors,
            pred_mean=pred_mean,
            rmse_trace=trace,
            rmse=trace[-1] if trace else None,
            auc=auc,
            beta=self.beta,
            hyper=self.hyper,
        )


def macau(
    spark: SparkSession,
    rd: RelationData,
    num_latent: int = 16,
    burnin: int = 10,
    psamples: int = 10,
    seed: int = 42,
    **kw,
) -> TrainResult:
    """The reference's main entry point ``macau(rd; num_latent, burnin,
    psamples, ...)`` [api], Spark-native."""
    return MacauTrainer(
        spark, rd, num_latent=num_latent, burnin=burnin, psamples=psamples, seed=seed, **kw
    ).train()


def bpmf(
    spark: SparkSession,
    rd: RelationData,
    **kw,
) -> TrainResult:
    """BPMF = Macau without side information [paper:BPMF] [api]."""
    return macau(spark, rd, **kw)
