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
from bayesiandatafusion_jl_spark.session import checkpoint_df, shuffle_partitions

# Broadcast budget for factor-table joins, in BYTES — a factor row is one
# long id plus a K-dim double array, so the estimate is rows × (K+1) × 8.
# A row-count gate alone is K-blind: at K=512 a "small" 1e6-row table is
# ~4 GB per broadcast (executor-memory hostile at 100×); the byte gate
# matches the convention functions/dedup.py uses for token-set broadcasts.
BROADCAST_MAX_BYTES = 64 << 20


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


def _sample_fn(k, mu, lam, seed, sweep, off_col, det=False, wr=0.0):
    def f(pdf):
        return kernels.sample_block(
            pdf, k, 1.0, mu, lam, seed, sweep, off_col=off_col,
            alpha_col="__alpha", deterministic=det, wr=wr,
        )

    return f


def _prior_fn(k, mu, lam, seed, sweep, det=False):
    def f(pdf):
        return kernels.prior_block(
            pdf.drop(columns="__b"), k, mu, lam, seed, sweep, deterministic=det
        )

    return f


def _partial_fn(k):
    def f(pdf):
        return kernels.partial_stats_block(pdf.drop(columns="__b"), k)

    return f


def _combine_fn(k, mu, lam, seed, sweep, off_col, det=False, wr=0.0):
    def f(pdf):
        return kernels.combine_sample_block(
            pdf.drop(columns="__b"), k, mu, lam, seed, sweep, off_col=off_col,
            deterministic=det, wr=wr,
        )

    return f


def _beta_target_fn(k, mu, lam_u, seed, sweep):
    def f(pdf):
        return kernels.beta_target_block(
            pdf.drop(columns="__b"), k, mu, lam_u, seed, sweep
        )

    return f


def _checkpoint(df: DataFrame) -> DataFrame:
    """Shared persist→localCheckpoint→unpersist discipline; see
    ``session.checkpoint_df`` for why both halves are load-bearing."""
    return checkpoint_df(df)


def _truncnorm_udf():
    """Arrow-vectorized (pred, uniform, y01) → truncated-normal z draw —
    the only Python step of the probit augmentation (O(cells))."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _tn(pred, u, y):
        from bayesiandatafusion_jl_spark.ml.probit import truncnorm_z

        return pd.Series(
            truncnorm_z(pred.to_numpy(), u.to_numpy(), y.to_numpy())
        )

    return pandas_udf(_tn, "double")



@dataclass
class TrainResult:
    """Trained model state + readouts.

    ``factors`` hold the FINAL posterior sample per entity (the state the
    reference's sweep loop ends in); ``pred_mean`` is the
    Rao-Blackwellized posterior-mean prediction accumulated over the
    ``psamples`` phase. ``predict`` / ``save`` / ``load`` make the model
    reusable after the session ends — the reference's workflow ends in
    reusable predictions [api], so does this one."""

    factors: dict[str, DataFrame]
    pred_mean: DataFrame | None
    rmse_trace: list[float] = field(default_factory=list)
    rmse: float | None = None
    auc: float | None = None  # set when the relation has class_cut [api]
    beta: dict[str, np.ndarray] = field(default_factory=dict)
    hyper: dict[str, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)
    # prediction metadata: entity order of the primary relation, centering
    # mean, and per-entity instance counts (broadcast decisions)
    rel_entities: list[str] = field(default_factory=list)
    global_mean: float = 0.0
    # per-relation centering: entity order + train mean of EVERY relation
    # (rd.relations order) so predict() can add back the right offset when
    # scoring a secondary relation's cells — global_mean is the primary
    # relation's entry
    rel_entities_all: list[list[str]] = field(default_factory=list)
    rel_means: list[float] = field(default_factory=list)
    entity_counts: dict[str, int] = field(default_factory=dict)
    probit: bool = False
    # S retained posterior factor snapshots per entity, schema
    # (sample_id, id, factor) — the reference predicts with the posterior
    # MEAN over stored samples [paper:BPMF], so ``predict`` averages the
    # per-sample scores whenever these are present; ``factors`` (the final
    # sample) remains the single-sample fallback and the cold-start base.
    factor_samples: dict[str, DataFrame] | None = None
    n_samples: int = 0
    # final per-relation noise precision, in rd.relations order — equals
    # the fixed Relation.alpha unless alpha_sample drew it adaptively
    alphas: list[float] = field(default_factory=list)

    def _k(self) -> int:
        """Latent dimension, recovered from stored hyper/β (needed for the
        byte-based broadcast estimate). Falls back to 16 if neither is
        present — only affects the broadcast-or-not heuristic, never
        results."""
        for mu, _ in self.hyper.values():
            return int(np.asarray(mu).shape[0])
        for b in self.beta.values():
            return int(b.shape[1])
        return 16

    def cold_start_factors(self, entity: str, side_info: DataFrame) -> DataFrame:
        """Macau cold-start [paper:Macau]: factors for instances that were
        NEVER seen at training time, from side features alone —
        ``u_i = μ + βᵀ f_i`` (the conditional prior mean given features).
        ``side_info`` is dense ``(id, features: array<float>)`` or sparse
        COO ``(id, feat, v)``; returns ``(id, factor)`` shaped like a
        stored factor table. Scale shape: β ships as a broadcast (feat →
        β-row) table; the dot is a join + groupBy(id) — the same
        distributed matvec the trainer uses, no driver N×K."""
        beta = self.beta.get(entity)
        if beta is None:
            raise ValueError(f"entity {entity!r} has no trained link matrix β")
        k = beta.shape[1]
        if "features" in side_info.columns:
            from bayesiandatafusion_jl_spark.ml.cg import features_to_coo

            coo = features_to_coo(side_info)
        else:
            coo = side_info.select(
                F.col("id").cast("long"),
                F.col("feat").cast("long"),
                F.col("v").cast("double"),
            ).filter(F.col("v") != 0.0)
        spark = side_info.sparkSession
        import pandas as pd

        brows = pd.DataFrame(
            {"feat": np.arange(beta.shape[0], dtype=np.int64), "b": list(beta)}
        )
        btab = F.broadcast(spark.createDataFrame(brows))
        mu = self.hyper.get(entity, (np.zeros(k), None))[0]
        scaled = coo.join(btab, "feat").select(
            "id", F.transform("b", lambda e: e * F.col("v")).alias("c")
        )
        from bayesiandatafusion_jl_spark.ml.cg import _elementwise_sum

        mu_arr = F.array(*[F.lit(float(x)) for x in mu])
        dots = scaled.groupBy("id").agg(
            F.zip_with(
                _elementwise_sum("c", k), mu_arr, lambda a, b: a + b
            ).alias("factor")
        )
        # ids whose features are ALL zero vanish from the COO (v != 0) and
        # would silently drop out of prediction — Macau's conditional mean
        # for f = 0 is u = μ, so left-join every distinct side-info id and
        # fill the missing dot-products with the prior mean
        all_ids = side_info.select(F.col("id").cast("long")).distinct()
        return all_ids.join(dots, "id", "left").select(
            "id", F.coalesce(F.col("factor"), mu_arr).alias("factor")
        )

    def predict(
        self,
        cells_df: DataFrame,
        entities: list[str] | None = None,
        side_info: dict[str, DataFrame] | None = None,
        probability: bool = False,
        use_samples: bool = True,
        with_std: bool = False,
    ) -> DataFrame:
        """Score arbitrary (possibly unseen) cells: r̂ = mean_rel +
        Σ_k Π_modes u^{(m)}_k from the stored factors, where mean_rel is
        the per-relation centering offset of the trained relation whose
        entity order matches ``entities`` (primary relation's mean — the
        stored ``global_mean`` — when nothing matches). ``cells_df`` needs
        one id column per entity (named by the entity); ``entities``
        defaults to the primary relation's mode order.

        ``side_info={entity: features_df}`` extends coverage to ids with
        no stored factor row via ``cold_start_factors`` (stored factors
        win where both exist); cells still unmatched after that are
        dropped — the factor join is inner, same as training.

        ``probability=True`` (probit-trained models only) maps the latent
        score through Φ to P(label = 1) — the Albert–Chib link, evaluated
        as a pure JVM expression. All-JVM scoring path: broadcast factor
        joins + a zip_with Hadamard.

        When the model carries posterior factor SAMPLES (``factor_samples``,
        the default for a trained/loaded r6+ model), the score is the
        Rao-Blackwellized mean over the S per-sample scores — the
        reference's prediction semantics [paper:BPMF]; ``use_samples=False``
        forces the cheaper single-final-sample path. With samples,
        ``probability=True`` averages Φ(score_s) — the exact posterior
        predictive P(label=1), not Φ of the mean score. Plan shape: the
        per-entity sample tables join on (id, sample_id) so every cell
        expands to exactly S rows, then ONE groupBy over the cell columns
        collapses them — S× the single-sample join traffic, same join
        strategy (broadcast when the factor side is dimension-sized).
        ``with_std=True`` adds the posterior std over the S scores as a
        ``pred_std`` column — pred_mean's I11 uncertainty readout for
        arbitrary cells."""
        entities = entities or self.rel_entities
        if not entities:
            raise ValueError("no entity order: pass entities=[...]")
        if probability and not self.probit:
            raise ValueError("probability=True requires a probit-trained model")
        use_samples = (
            use_samples and self.factor_samples is not None and self.n_samples > 0
        )
        df = cells_df
        if use_samples:
            # per-input-row tag so the S-sample collapse below returns one
            # row PER INPUT ROW, not per distinct cell — without it, a
            # cells frame containing duplicate (id …) tuples would come
            # back shorter from the sampled path than from the
            # use_samples=False path (which never aggregates). row_number
            # WITHIN each duplicate group (not monotonically_increasing_id,
            # whose values depend on physical row order and can split a
            # group under task retry): whichever physical duplicate gets
            # rank 1 vs 2, the rows are identical, so the output multiset
            # is retry-stable. One extra shuffle of the (query-sized)
            # cells frame.
            from pyspark.sql import Window as _W

            df = df.withColumn(
                "__rid",
                F.row_number().over(
                    _W.partitionBy(*cells_df.columns).orderBy(F.lit(1))
                ),
            )
        df, fac_cols = self._factor_join(df, entities, use_samples, side_info)
        prod = _hadamard(fac_cols)
        pred = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) + F.lit(
            self._relation_offset(entities)
        )
        if probability:
            from bayesiandatafusion_jl_spark.ml.probit import phi_col

            pred = phi_col(pred)
        if not use_samples:
            if with_std:
                raise ValueError(
                    "with_std=True needs posterior samples (use_samples=True "
                    "on a model trained with keep_samples != 0)"
                )
            return df.select(
                *[F.col(c) for c in cells_df.columns], pred.alias("pred")
            )
        aggs = [F.avg("__ps").alias("pred")]
        if with_std:
            # population std over the S per-sample scores — the same
            # posterior-uncertainty readout pred_mean carries for the
            # training test split (I11), now for arbitrary cells
            aggs.append(
                F.sqrt(
                    F.greatest(
                        F.avg(F.col("__ps") * F.col("__ps"))
                        - F.pow(F.avg("__ps"), 2),
                        F.lit(0.0),
                    )
                ).alias("pred_std")
            )
        return (
            df.select(
                *[F.col(c) for c in cells_df.columns], "__rid", pred.alias("__ps")
            )
            .groupBy(*[F.col(c) for c in cells_df.columns], F.col("__rid"))
            .agg(*aggs)
            .drop("__rid")
        )

    def _factor_join(
        self,
        df: DataFrame,
        entities: list[str],
        use_samples: bool,
        side_info: dict[str, DataFrame] | None = None,
    ) -> tuple[DataFrame, list[str]]:
        """Join one factor table per entity onto a cells frame; returns
        ``(joined, fac_cols)``. With ``use_samples`` the per-entity SAMPLE
        tables join on (id, sample_id) — ``__sid0`` pins every row to one
        sample so each input cell expands to exactly S rows. Shared by
        ``predict`` (which collapses the S rows) and ``sample_scores``
        (which keeps them)."""
        fac_cols = []
        for m, ent in enumerate(entities):
            fcol = f"__f{m}"
            if use_samples:
                fdf = self.factor_samples[ent]
                n_rows = self.entity_counts.get(ent, 0) * self.n_samples
            else:
                fdf = self.factors[ent]
                n_rows = self.entity_counts.get(ent, 0)
            if side_info and ent in side_info:
                cold = self.cold_start_factors(ent, side_info[ent]).join(
                    fdf.select("id").distinct(), "id", "left_anti"
                )
                if use_samples:
                    # conditional-prior-mean factors are sample-independent:
                    # replicate across sample_ids so the (id, sample_id)
                    # joins below stay exact
                    sids = fdf.sparkSession.range(self.n_samples).select(
                        F.col("id").cast("int").alias("sample_id")
                    )
                    cold = cold.crossJoin(F.broadcast(sids))
                fdf = fdf.unionByName(cold)
                n_rows = None  # unknown size: don't force a broadcast
            sel = [F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)]
            if use_samples:
                sel.append(F.col("sample_id").alias(f"__sid{m}"))
            fdf = _maybe_broadcast(fdf.select(*sel), n_rows, self._k())
            cond = F.col(ent).cast("long") == F.col(f"__oid{m}")
            if use_samples and m > 0:
                cond = cond & (F.col("__sid0") == F.col(f"__sid{m}"))
            df = df.join(fdf, cond)
            fac_cols.append(fcol)
        return df, fac_cols

    def _relation_offset(self, entities: list[str]) -> float:
        """Centering offset of the relation whose cells these are: matched
        by entity order against the trained relations, then
        order-insensitively (the factor joins are by entity NAME, so a
        permuted ``entities`` still scores the same relation and must get
        the same offset). First match wins — two relations over the
        IDENTICAL entity set are inherently ambiguous here; score those
        via pred_mean / _predict_sample, which know the relation.
        Unmatched entity lists — ad-hoc cell frames over arbitrary entity
        combinations — get the primary relation's mean."""
        for ents, m in zip(self.rel_entities_all, self.rel_means):
            if list(entities) == list(ents):
                return m
        for ents, m in zip(self.rel_entities_all, self.rel_means):
            if set(entities) == set(ents):
                return m
        return self.global_mean

    def sample_scores(
        self, cells_df: DataFrame, entities: list[str] | None = None
    ) -> DataFrame:
        """Per-posterior-sample scores at arbitrary cells: one row per
        (cell, sample_id) with a ``score`` column — ``predict`` WITHOUT the
        final Rao-Blackwellizing collapse. This is the MCMC trace surface:
        convergence diagnostics (``rhat`` below) and any custom posterior
        functional (quantiles, exceedance probabilities) compute from it
        with plain aggregations. Requires a model trained with
        ``keep_samples != 0``. Distinct cells only (the trace of a
        duplicated cell is the same rows repeated — callers needing
        multiplicity should predict instead). Cells whose entity ids have
        no stored factor row are DROPPED — the factor join is inner, same
        as ``predict`` without side_info; diagnose trained cells."""
        if self.factor_samples is None or self.n_samples <= 0:
            raise ValueError(
                "sample_scores needs posterior samples (train with "
                "keep_samples != 0)"
            )
        entities = entities or self.rel_entities
        if not entities:
            raise ValueError("no entity order: pass entities=[...]")
        df, fac_cols = self._factor_join(
            cells_df.distinct(), entities, use_samples=True
        )
        prod = _hadamard(fac_cols)
        score = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) + F.lit(
            self._relation_offset(entities)
        )
        return df.select(
            *[F.col(c) for c in cells_df.columns],
            F.col("__sid0").alias("sample_id"),
            score.alias("score"),
        )

    def predict_quantiles(
        self,
        cells_df: DataFrame,
        probs: tuple[float, ...] = (0.05, 0.5, 0.95),
        entities: list[str] | None = None,
    ) -> DataFrame:
        """Posterior predictive-score quantiles at arbitrary cells: exact
        percentiles over the S per-sample scores, one column per prob
        (``q050``/``q500``/``q950`` for the defaults — ``int(p*1000)``).
        The interval readout ``pred_std`` can't give for skewed
        posteriors. Exact (not approx) percentile is the scale-correct
        choice here: each group holds exactly S bounded values, so the
        sort is per-cell-constant work, all JVM-side."""
        if not probs:
            raise ValueError("probs must be non-empty")
        if any(not (0.0 <= p <= 1.0) for p in probs):
            raise ValueError(f"probs must lie in [0, 1]: {probs}")
        names = [f"q{int(round(p * 1000)):03d}" for p in probs]
        if len(set(names)) != len(names):
            raise ValueError(f"probs collide at 1/1000 resolution: {probs}")
        t = self.sample_scores(cells_df, entities)
        return t.groupBy(*[F.col(c) for c in cells_df.columns]).agg(
            *[
                F.percentile("score", F.lit(p)).alias(nm)
                for p, nm in zip(probs, names)
            ]
        )

    def save(self, path: str) -> None:
        """Persist the model: one parquet factor table per entity under
        ``{path}/factors/{entity}/`` (repartitioned by id — the join key
        every consumer uses) plus β / Normal-Wishart hyper / metadata as a
        single-row JSON dataset at ``{path}/meta/``. Written through
        Spark, so the path may be any supported filesystem (local, HDFS,
        S3); nothing N-scaled crosses the driver."""
        import json

        spark = None
        for name, fac in self.factors.items():
            spark = fac.sparkSession
            fac.repartition("id").write.mode("overwrite").parquet(
                f"{path}/factors/{_safe_name(name)}"
            )
        if self.factor_samples is not None and self.n_samples > 0:
            for name, fs in self.factor_samples.items():
                fs.repartition("id").write.mode("overwrite").parquet(
                    f"{path}/samples/{_safe_name(name)}"
                )
        meta = {
            "entities": list(self.factors),
            "rel_entities": self.rel_entities,
            "global_mean": self.global_mean,
            "rel_entities_all": self.rel_entities_all,
            "rel_means": self.rel_means,
            "entity_counts": self.entity_counts,
            "rmse": self.rmse,
            "auc": self.auc,
            "probit": self.probit,
            "rmse_trace": self.rmse_trace,
            "n_samples": self.n_samples if self.factor_samples is not None else 0,
            "alphas": self.alphas,
            "beta": {k: v.tolist() for k, v in self.beta.items()},
            "hyper": {
                k: [mu.tolist(), lam.tolist()] for k, (mu, lam) in self.hyper.items()
            },
        }
        assert spark is not None, "cannot save a model with no factor tables"
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").text(f"{path}/meta")

    @staticmethod
    def load(spark: SparkSession, path: str) -> "TrainResult":
        """Rebuild a saved model. Factor tables come back as lazy parquet
        scans (no materialization until a prediction runs); β/hyper are
        restored to numpy."""
        import json

        meta = json.loads(spark.read.text(f"{path}/meta").collect()[0][0])
        factors = {
            name: spark.read.parquet(f"{path}/factors/{_safe_name(name)}")
            for name in meta["entities"]
        }
        n_samples = int(meta.get("n_samples", 0))
        factor_samples = (
            {
                name: spark.read.parquet(f"{path}/samples/{_safe_name(name)}")
                for name in meta["entities"]
            }
            if n_samples > 0
            else None
        )
        return TrainResult(
            factors=factors,
            pred_mean=None,
            factor_samples=factor_samples,
            n_samples=n_samples,
            alphas=[float(a) for a in meta.get("alphas", [])],
            rmse_trace=meta.get("rmse_trace", []),
            rmse=meta.get("rmse"),
            auc=meta.get("auc"),
            beta={k: np.array(v) for k, v in meta.get("beta", {}).items()},
            hyper={
                k: (np.array(mu), np.array(lam))
                for k, (mu, lam) in meta.get("hyper", {}).items()
            },
            rel_entities=meta.get("rel_entities", []),
            global_mean=meta.get("global_mean", 0.0),
            rel_entities_all=[list(e) for e in meta.get("rel_entities_all", [])],
            rel_means=[float(m) for m in meta.get("rel_means", [])],
            entity_counts={k: int(v) for k, v in meta.get("entity_counts", {}).items()},
            probit=bool(meta.get("probit", False)),
        )


def _safe_name(name: str) -> str:
    """Entity names become path components — keep them filesystem-safe.
    Sanitized names get a short content hash appended so distinct raw
    names (e.g. ``"user b"`` vs ``"user_b"``) can never collide on the
    same parquet directory."""
    safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in name)
    if safe == name:
        return safe
    import hashlib

    return f"{safe}-{hashlib.sha256(name.encode()).hexdigest()[:8]}"


def _auc_of(pred_mean: DataFrame, class_cut: float) -> float | None:
    """Tie-averaged Mann–Whitney AUC of posterior-mean predictions against
    the class_cut-binarized truth (macau reports AUC when class_cut is set
    [api]) — the bucketed-offset ``auc_components`` formulation (E2/I8),
    so the trainer's readout has NO single-partition global window."""
    from bayesiandatafusion_jl_spark.operators.windows import auc_components

    scored = pred_mean.select(
        F.col("pred").alias("score"),
        F.when(F.col("y") > class_cut, 1).otherwise(0).alias("label"),
    )
    row = auc_components(scored).collect()[0]
    return None if row["auc"] is None else float(row["auc"])


def _maybe_broadcast(df: DataFrame, n_rows: int | None, k: int) -> DataFrame:
    """Broadcast iff the estimated factor-table size (rows × (K+1) × 8 B)
    fits the byte budget; ``n_rows=None`` means size-unknown → never force
    a broadcast (leave the choice to AQE)."""
    if n_rows is None:
        return df
    return df if n_rows * (k + 1) * 8 > BROADCAST_MAX_BYTES else F.broadcast(df)


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
        direct_max_d: int = 1024,
        cg_tol: float = 1e-6,
        cg_max_iter: int = 50,
        skew_salt: int | None = None,
        n_chains: int = 1,
        warmup: int = 20,
        warmup_lambda: float = 2.0,
        warmup_tol: float = 0.03,
        warmup_wr: float = 0.05,
        keep_samples: int | None = None,
        spill_dir: str | None = None,
    ):
        self.spark = spark
        self.rd = rd
        self.k = num_latent
        self.burnin = burnin
        self.psamples = psamples
        self.seed = seed
        self.n_blocks = n_blocks or shuffle_partitions(spark)
        self.lambda_beta = {e: lambda_beta for e in rd.entities}
        self.center = center
        self.track_rmse = track_rmse  # False: skip per-sample RMSE collects
        # F ALWAYS stays a distributed COO (no N-scaled driver object).
        # D ≤ direct_max_d → FᵀF computed distributed once at init (F is
        # static) and each sweep's β solve is a driver D×D Cholesky;
        # larger D → batched CG with distributed matvecs [paper:Macau].
        self.direct_max_d = direct_max_d
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
        # ALS warm-start before Gibbs: deterministic ridge updates (same
        # kernels, conditional MEAN, fixed Λ = warmup_λ·I, renormalized
        # each half-sweep) run until the train RMSE improvement per sweep
        # drops below warmup_tol (or `warmup` sweeps) — the original BPMF
        # recipe of initializing Gibbs from the (P)MF MAP [paper:BPMF].
        # Starting Gibbs from an unconverged state is the failure mode:
        # the chain crawls through a transient where a strong-residual
        # instance's factor overshoots along a prior-suppressed latent
        # dimension (test error blows up while train error descends),
        # taking tens of sweeps to settle — observed on ~1/3 of seeds on
        # the planted-matrix suite with a cold or half-warmed start.
        self.warmup = warmup
        self.warmup_lambda = warmup_lambda
        self.warmup_tol = warmup_tol
        self.warmup_wr = warmup_wr
        # posterior factor snapshots retained for multi-sample prediction:
        # None → keep every psample sweep's factors (S = psamples, so
        # TrainResult.predict reproduces pred_mean exactly); an int keeps
        # that many THINNED snapshots (every psamples//keep-th sweep) to
        # bound the S× factor storage at large psamples. 0 disables.
        self.keep_samples = keep_samples
        # opt-in snapshot spill: with a spill_dir, each retained posterior
        # snapshot is WRITTEN to parquet during training and held as a lazy
        # reader, so the executor-resident factor blocks are bounded at one
        # sweep's tables instead of S× (memory hygiene for long-lived
        # sessions / large N). Without it, snapshots stay as
        # localCheckpoint'ed in-memory frames (fastest for small N).
        self.spill_dir = spill_dir
        self._lambda_beta0 = lambda_beta
        self.rng = np.random.default_rng(seed)

        self.factors: dict[str, DataFrame] = {}
        self.hyper: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.beta: dict[str, np.ndarray] = {}
        self.offsets: dict[str, DataFrame] = {}  # entity -> (id, __off) distributed
        self.side_mv: dict[str, object] = {}  # entity -> DistributedMatvec (COO F)
        self.side_gram: dict[str, np.ndarray] = {}  # entity -> FᵀF (D ≤ direct_max_d)
        self.global_mean = 0.0
        self._rel_mean: dict[int, float] = {}  # id(rel) -> per-relation train mean
        self._entity_counts: dict[str, int] = {}
        self._side_counts: dict[str, int] = {}
        # probit relations: id(rel) -> current augmented-z cell frame
        self._aug: dict[int, DataFrame] = {}
        # per-relation CURRENT noise precision — mutated by the adaptive-α
        # Gamma draw when rel.alpha_sample; the user's Relation stays as-is
        self._alpha: dict[int, float] = {id(r): r.alpha for r in rd.relations}

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
        # PER-RELATION centering (the reference models each relation's mean
        # structure per relation): two fused relations on different value
        # scales (e.g. ratings 1–5 with log-IC50) must each be centered by
        # their OWN train mean — a pooled mean offsets both and biases the
        # shared factors. Probit relations train on augmented z with latent
        # mean 0, so their offset is 0 and they contribute nothing to the
        # continuous scale stats.
        self._rel_mean = {}
        var_num, cnt_all = 0.0, 0
        for rel in self.rd.relations:
            if rel.probit:
                self._rel_mean[id(rel)] = 0.0
                continue
            df = rel.df
            if "split" in df.columns:
                df = df.filter(F.col("split") == "train")
            row = df.agg(
                F.sum(rel.value_col).alias("s"),
                F.sum(F.col(rel.value_col) * F.col(rel.value_col)).alias("sq"),
                F.count(F.lit(1)).alias("c"),
            ).collect()[0]
            s, sq, c = row["s"] or 0.0, row["sq"] or 0.0, row["c"]
            m = s / max(c, 1)
            self._rel_mean[id(rel)] = m if self.center else 0.0
            # numerator of the pooled variance of per-relation-centered
            # values: Σ_rel Σ_cells (v − m_rel)² = Σ_rel (sq − c·m²)
            var_num += sq - c * m * m
            cnt_all += c
        # the PRIMARY relation's offset — what TrainResult.predict adds
        # back by default (its cells are the default prediction target)
        self.global_mean = self._rel_mean[id(self.rd.relations[0])]
        # pooled std of per-relation-centered train values — sets the
        # warmup's balanced factor scale: r ≈ Σ_k Π_m u^m_k has per-entry
        # variance ≈ K·Π_m var_m, so each of the m sides targets per-entry
        # rms (std_r²/K)^(1/2m). All-probit data has no continuous values;
        # its ±1 warmup targets have unit scale.
        if cnt_all == 0:
            self._value_std = 1.0
        else:
            self._value_std = max(
                float(np.sqrt(max(var_num / cnt_all, 0.0))), 1e-6
            )

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
            self.factors[name] = _checkpoint(init)
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
            missing = _checkpoint(universe.join(obs, "id", "left_anti"))
            if missing.count() == 0:
                missing.unpersist()
                self._cold[name] = None
            else:
                self._cold[name] = missing
            self.hyper[name] = (np.zeros(k), np.eye(k))
            if ent.side_info is not None:
                # Macau's scalability device [paper:Macau]: F NEVER
                # densifies on the driver at any N — it lives as a
                # distributed COO; β/offsets move as D×K broadcasts and
                # distributed matvecs.
                from bayesiandatafusion_jl_spark.ml.cg import (
                    DistributedMatvec,
                    features_to_coo,
                )

                if "features" in ent.side_info.columns:
                    # dense (id, features: array<float>) — explode to COO
                    n_side = ent.side_info.count()
                    d = len(
                        ent.side_info.select("features").limit(1).collect()[0][0]
                    )
                    coo = features_to_coo(ent.side_info)
                else:
                    # already-sparse COO (id, feat, v) at rest — the
                    # Macau 10⁵–10⁶-dim sparse-binary regime [paper:Macau]
                    # must never take a dense detour. One stats pass gives
                    # the dims (Entity.side_dim overrides the feature-space
                    # width when trailing all-zero columns exist).
                    coo = ent.side_info.select(
                        F.col("id").cast("long"),
                        F.col("feat").cast("long"),
                        F.col("v").cast("double"),
                    ).filter(F.col("v") != 0.0)
                    stats = coo.agg(
                        F.countDistinct("id").alias("n"),
                        F.max("feat").alias("dmax"),
                    ).collect()[0]
                    n_side = stats["n"]
                    d = ent.side_dim or int(stats["dmax"]) + 1
                self.side_mv[name] = DistributedMatvec(
                    self.spark, coo, n_side, d, n_parts=self.n_blocks
                )
                self._side_counts[name] = n_side
                if d <= self.direct_max_d:
                    # F is static across sweeps → one distributed Gram
                    # pass; every sweep's β solve is then a driver-side
                    # D×D Cholesky with a distributed rhs.
                    self.side_gram[name] = self.side_mv[name].gram()
                self.beta[name] = np.zeros((d, k))
                self._refresh_offsets(name)

    def _refresh_offsets(self, name: str) -> None:
        """offset_i = βᵀ f_i as a DISTRIBUTED DataFrame (id, __off) — the
        F·β matvec runs as a broadcast join + groupBy(id) on the COO; the
        N×K offsets never exist on the driver. Persisted + checkpointed
        per refresh (it feeds several joins per sweep); the previous
        sweep's frame is unpersisted."""
        mv = self.side_mv[name]
        new = _checkpoint(
            mv.fx_df(self.beta[name]).select("id", F.col("y").alias("__off"))
        )
        old = self.offsets.get(name)
        self.offsets[name] = new
        if old is not None:
            old.unpersist()

    def _offsets_join(self, name: str) -> DataFrame:
        """Offsets side for joins — broadcast when the entity is small.
        The offsets frame is (id, scalar), so the byte estimate uses k=1."""
        return _maybe_broadcast(self.offsets[name], self._side_counts.get(name, 0), 1)

    def _renorm_factors(self, name: str) -> None:
        """Rescale an entity's factors to the balanced data-implied
        per-entry rms after an ALS warmup half-sweep. Unregularized-ish
        ridge updates from a tiny random init overshoot by α/λ-sized
        gains and oscillate; renormalizing turns the warmup into an
        orthogonal-iteration-style subspace sweep that cannot blow up —
        the absolute scale is then re-fit by the first Gibbs sweeps."""
        arity = min(
            len(rel.entities) for rel, _ in self.rd.relations_of(name)
        )
        target = (self._value_std**2 / self.k) ** (1.0 / (2 * arity))
        ms = self.factors[name].agg(
            F.avg(
                F.aggregate(
                    F.transform("factor", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            ).alias("ms")
        ).collect()[0]["ms"]
        rms = float(np.sqrt(max(ms or 0.0, 1e-18) / self.k))
        s = target / max(rms, 1e-12)
        scaled = _checkpoint(
            self.factors[name].select(
                "id", F.transform("factor", lambda x: x * F.lit(s)).alias("factor")
            )
        )
        old = self.factors[name]
        self.factors[name] = scaled
        old.unpersist()

    # ---------- per-sweep steps ----------

    def _moments(self, name: str) -> tuple[int, np.ndarray, np.ndarray]:
        """Distributed partial moments (I4): per-block (n, Σu, Σuuᵀ), driver
        reduces ~n_blocks rows. For Macau the moments are of the residual
        u − βᵀf (the NW prior governs the residual [paper:Macau])."""
        fac = self.factors[name]
        if name in self.offsets:
            fac = fac.join(self._offsets_join(name), "id", "left").select(
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

    def _sample_beta(self, name: str, sweep: int) -> None:
        """I5 — link matrix via the exact Bhattacharya–Mallick sampler:

            β_k = (λ_u FᵀF + λ_β I)⁻¹ (λ_u Fᵀũ_k + √λ_u Fᵀe₁ + √λ_β e₂)

        which is a *sample* from the β posterior (mean/cov check out by
        direct computation). λ_u = mean diag(Λ) (exact when Λ isotropic —
        the property-tested regime; documented approximation otherwise).

        NOTHING N-scaled touches the driver: the stochastic target
        t = λ_u ũ + √λ_u e₁ is computed per instance by a seeded kernel
        over the factor DataFrame (e₁ keyed by ("beta_e1", seed, sweep,
        id) — retry-idempotent), and rhs = Fᵀt is ONE distributed
        transpose-matvec collecting only D×K. The system is then solved
        either driver-side from the precomputed D×D Gram (D ≤
        direct_max_d) or by batched CG whose matvecs are distributed
        join+aggs — FᵀF is never formed [paper:Macau]."""
        mu, lam = self.hyper[name]
        lam_u = float(np.mean(np.diag(lam)))
        lam_b = self.lambda_beta[name]
        mv = self.side_mv[name]
        d, k = mv.n_feats, self.k
        # β-specific sub-seed: distinct stream from the factor kernel's
        # (_entity_seed(seed, name), sweep, id) keys
        eseed = _entity_seed(self.seed, name + "/beta_e1")
        target = (
            self.factors[name]
            .withColumn("__b", F.pmod(F.col("id"), F.lit(self.n_blocks)))
            .groupBy("__b")
            .applyInPandas(
                _beta_target_fn(k, mu, lam_u, eseed, sweep),
                schema="id long, t array<double>",
            )
        )
        rhs = mv.fty_df(target, k, y_col="t")
        rhs = rhs + np.sqrt(lam_b) * self.rng.standard_normal((d, k))
        if name in self.side_gram:
            a = lam_u * self.side_gram[name] + lam_b * np.eye(d)
            self.beta[name] = np.linalg.solve(a, rhs)
        else:
            from bayesiandatafusion_jl_spark.ml.cg import cg_solve

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
            if rel.probit:
                aug = self._aug.get(id(rel))
                if aug is not None:
                    # Albert–Chib latents refreshed this sweep: train on z
                    # with unit noise precision, no centering (the latent
                    # mean lives in u·v)
                    df = aug.withColumn("__val", F.col("__zval"))
                else:
                    # warmup (pre-augmentation): ALS on the ±1 binarized
                    # labels — sign structure is what matters for the
                    # subspace warm start
                    df = rel.df
                    if "split" in df.columns:
                        df = df.filter(F.col("split") == "train")
                    df = df.withColumn(
                        "__val",
                        F.when(
                            F.col(rel.value_col) > F.lit(rel.class_cut), 1.0
                        ).otherwise(-1.0),
                    )
            else:
                df = rel.df
                if "split" in df.columns:
                    df = df.filter(F.col("split") == "train")
                df = df.withColumn(
                    "__val",
                    F.col(rel.value_col) - F.lit(self._rel_mean[id(rel)]),
                )
            fac_cols = []
            for m, other in enumerate(rel.entities):
                if m == mode:
                    continue
                fcol = f"__f{m}"
                other_fac = self.factors[other].select(
                    F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)
                )
                df = df.join(
                    _maybe_broadcast(other_fac, self._entity_counts[other], self.k),
                    F.col(rel.entities[m]).cast("long") == F.col(f"__oid{m}"),
                )
                fac_cols.append(fcol)
            cols = [
                F.col(rel.entities[mode]).cast("long").alias("__id"),
                F.col("__val"),
                _hadamard(fac_cols).alias("__fac"),
                # probit augmentation fixes the latent noise precision at 1
                F.lit(1.0 if rel.probit else self._alpha[id(rel)]).alias("__alpha"),
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

    def _refresh_probit_z(self, rel, sweep: int) -> None:
        """Albert–Chib augmentation step (runs once per sweep per probit
        relation, BEFORE the entity updates): z_c ~ N(u·v, 1) truncated by
        the binarized label. Everything is O(cells) and stays distributed:
        JVM joins for u·v, an xxhash64-derived uniform per cell
        (retry-idempotent: keyed by cell ids, seed and sweep), and one
        Arrow-vectorized UDF for the inverse-CDF truncation."""
        df = rel.df
        if "split" in df.columns:
            df = df.filter(F.col("split") == "train")
        df = df.select(
            *[F.col(c).cast("long").alias(c) for c in rel.entities],
            F.when(F.col(rel.value_col) > F.lit(rel.class_cut), 1.0)
            .otherwise(0.0)
            .alias("__y"),
        )
        fac_cols = []
        for m, ent in enumerate(rel.entities):
            fcol = f"__f{m}"
            fdf = self.factors[ent].select(
                F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)
            )
            df = df.join(
                _maybe_broadcast(fdf, self._entity_counts[ent], self.k),
                F.col(rel.entities[m]) == F.col(f"__oid{m}"),
            )
            fac_cols.append(fcol)
        prod = _hadamard(fac_cols)
        pred = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        zseed = _entity_seed(self.seed, "/probit/" + "/".join(rel.entities))
        unif = (
            F.pmod(
                F.xxhash64(*rel.entities, F.lit(zseed), F.lit(sweep)),
                F.lit(2**53),
            ).cast("double")
            / F.lit(float(2**53))
        )
        tn = _truncnorm_udf()
        new = _checkpoint(
            df.select(*rel.entities, tn(pred, unif, F.col("__y")).alias("__zval"))
        )
        old = self._aug.get(id(rel))
        self._aug[id(rel)] = new
        if old is not None:
            old.unpersist()

    def _sample_entity(
        self, name: str, sweep: int, deterministic: bool = False
    ) -> None:
        k, seed = self.k, _entity_seed(self.seed, name)
        wr = 0.0
        if deterministic:
            # ALS-WR warm-start half-sweep: weighted ridge, conditional mean
            mu, lam = np.zeros(k), self.warmup_lambda * np.eye(k)
            wr = self.warmup_wr
        else:
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
                    schema=(
                        "id long, salt long, srv array<double>, "
                        "svv array<double>, sa double"
                    ),
                )
            )
            if off_col:
                partials = partials.join(self._offsets_join(name), "id", "left")
            new = (
                partials.withColumn(
                    "__b", F.pmod(F.col("id"), F.lit(self.n_blocks))
                )
                .groupBy("__b")
                .applyInPandas(
                    _combine_fn(k, mu, lam, seed, sweep, off_col, deterministic, wr),
                    schema="id long, factor array<double>",
                )
            )
        else:
            if off_col:
                cells = cells.join(
                    self._offsets_join(name).select(
                        F.col("id").alias("__id"), "__off"
                    ),
                    "__id",
                    "left",
                )
            new = (
                cells.withColumn("__b", F.pmod(F.col("__id"), F.lit(self.n_blocks)))
                .groupBy("__b")
                .applyInPandas(
                    _sample_fn(k, mu, lam, seed, sweep, off_col, deterministic, wr),
                    schema="id long, factor array<double>",
                )
            )
        # cold-start: instances with no training cells sample from the
        # prior. The train split is static, so the missing-id set was
        # computed ONCE at init (self._cold[name]) — no per-sweep
        # left_anti join, and entities with full observation coverage
        # skip the prior branch entirely (the common case).
        if self._cold.get(name) is None:
            updated = new
        else:
            missing = self._cold[name]
            if name in self.offsets:
                missing = missing.join(self._offsets_join(name), "id", "left")
            prior = (
                missing.withColumn("__b", F.pmod(F.col("id"), F.lit(self.n_blocks)))
                .groupBy("__b")
                .applyInPandas(
                    _prior_fn(k, mu, lam, seed, sweep, deterministic),
                    schema="id long, factor array<double>",
                )
            )
            updated = new.unionByName(prior)
        updated = _checkpoint(updated)  # truncate lineage (SURVEY §7)
        old = self.factors[name]
        self.factors[name] = updated
        old.unpersist()

    # ---------- prediction ----------

    def _predict_sample(self, rel, test_df: DataFrame) -> DataFrame:
        """r̂ = mean_rel + Σ_k Π_modes u^{(m)}_k — for arity 2 this is the
        dot product u·v [paper:BPMF]; tensors use the Hadamard sum. The
        added-back offset is the relation's OWN train mean (per-relation
        centering), which for the primary relation equals global_mean."""
        df = test_df
        fac_cols = []
        for m, ent in enumerate(rel.entities):
            fcol = f"__f{m}"
            fdf = self.factors[ent].select(
                F.col("id").alias(f"__oid{m}"), F.col("factor").alias(fcol)
            )
            df = df.join(
                _maybe_broadcast(fdf, self._entity_counts[ent], self.k),
                F.col(rel.entities[m]).cast("long") == F.col(f"__oid{m}"),
            )
            fac_cols.append(fcol)
        prod = _hadamard(fac_cols)
        pred = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) + F.lit(
            self._rel_mean[id(rel)]
        )
        return df.select(
            *[F.col(c) for c in rel.entities],
            F.col(rel.value_col).alias("y"),
            pred.alias("p"),
        )

    # ---------- main loop ----------

    def _release_working_caches(self) -> None:
        """Unpersist every working frame that is NOT part of the returned
        model (factors and the prediction accumulator stay live): final
        per-entity offsets, probit z augmentations, cold-start id sets and
        the side-info COO. Without this each training pins its scratch
        caches until session end — across a 50-query driver session the
        block manager fills with dead partitions."""
        for df in self.offsets.values():
            df.unpersist()
        self.offsets = {}
        for df in self._aug.values():
            df.unpersist()
        self._aug = {}
        for df in self._cold.values():
            if df is not None:
                df.unpersist()
        self._cold = {}
        for mv in self.side_mv.values():
            mv.coo.unpersist()

    def _sample_alpha(self, rel) -> None:
        """Adaptive noise precision [api]: conjugate Gamma posterior draw
        α ~ Gamma(a0 + n/2, b0 + SSE/2) from the TRAIN residuals under the
        current factors. One join + one agg per relation per sweep (only
        when ``rel.alpha_sample``); the draw itself is a driver scalar."""
        df = rel.df
        if "split" in df.columns:
            df = df.filter(F.col("split") == "train")
        pred = self._predict_sample(rel, df)
        row = pred.agg(
            F.sum(F.pow(F.col("y") - F.col("p"), 2)).alias("sse"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        shape = rel.alpha_a0 + row["n"] / 2.0
        rate = rel.alpha_b0 + (row["sse"] or 0.0) / 2.0
        self._alpha[id(rel)] = float(self.rng.gamma(shape, 1.0 / rate))

    def _gibbs_sweep(self, sweep: int) -> None:
        for rel in self.rd.relations:
            if rel.probit:
                self._refresh_probit_z(rel, sweep)
            elif rel.alpha_sample:
                self._sample_alpha(rel)
        for name in self.rd.entities:
            n, su, suu = self._moments(name)
            self.hyper[name] = sample_normal_wishart(n, su, suu, self.rng)
            if name in self.side_mv:
                self._sample_beta(name, sweep)
            self._sample_entity(name, sweep)

    def _train_rmse(self) -> float:
        """Chain-selection criterion: rmse of the current single sample on
        the TRAIN cells (no test leakage)."""
        rel0 = self.rd.relations[0]
        df = rel0.df
        if "split" in df.columns:
            df = df.filter(F.col("split") == "train")
        pred = self._predict_sample(rel0, df)
        if rel0.probit:
            # latent scores vs ±1 labels — tracks the binary fit for the
            # warmup plateau detector and chain selection
            pred = pred.withColumn(
                "y",
                F.when(F.col("y") > F.lit(rel0.class_cut), 1.0).otherwise(-1.0),
            )
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
            self.side_mv, self.side_gram, self._aug = {}, {}, {}
            self._alpha = {id(r): r.alpha for r in self.rd.relations}
            self.lambda_beta = {e: self._lambda_beta0 for e in self.rd.entities}
            self._init()
            # ALS warm-start: deterministic mean half-sweeps (negative
            # sweep ids — never collide with the Gibbs RNG keys), until
            # the per-sweep train-RMSE improvement stalls
            prev_tr = None
            for w in range(self.warmup):
                for name in self.rd.entities:
                    self._sample_entity(name, -(w + 2), deterministic=True)
                    self._renorm_factors(name)
                tr = self._train_rmse()
                if prev_tr is not None and tr > prev_tr * (1 - self.warmup_tol):
                    break
                prev_tr = tr
            for sweep in range(self.burnin):
                self._gibbs_sweep(sweep)
            if self.n_chains == 1:
                break
            tr = self._train_rmse()
            state = dict(
                factors=self.factors, hyper=self.hyper, beta=self.beta,
                offsets=self.offsets, lambda_beta=self.lambda_beta,
                side_mv=self.side_mv, side_gram=self.side_gram,
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
            self.side_mv, self.side_gram = st["side_mv"], st["side_gram"]
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

        # which psample sweeps to retain as posterior factor snapshots:
        # evenly thinned from the END so the final sample is always kept
        keep = (
            self.psamples if self.keep_samples is None
            else min(self.keep_samples, self.psamples)
        )
        # per-training spill token: two trainings sharing a spill_dir must
        # not overwrite each other's snapshot files while an earlier
        # TrainResult's lazy readers still point at them
        spill_token = None
        if self.spill_dir:
            import uuid

            spill_token = uuid.uuid4().hex[:12]
        kept_js: set[int] = set()
        if keep > 0 and self.psamples > 0:
            # floor stride, NOT ceil: with ceil, keep=3 of psamples=4 gave
            # stride 2 and only {3, 1} — one fewer snapshot than requested.
            # floor always yields exactly `keep` distinct non-negative
            # indices: (keep-1) * (psamples // keep) <= psamples - 1.
            thin = max(1, self.psamples // keep)
            kept_js = {self.psamples - 1 - i * thin for i in range(keep)}
        snap: dict[str, list[DataFrame]] = {e: [] for e in self.rd.entities}

        total = self.burnin + self.psamples
        for sweep in range(self.burnin, total):
            self._gibbs_sweep(sweep)

            if (sweep - self.burnin) in kept_js:
                # factors are localCheckpoint-ed per sweep, so each snapshot
                # is a stable executor-resident frame; holding the reference
                # keeps its blocks alive (S × N×K rows total). With
                # spill_dir the snapshot is flushed to parquet instead and
                # held as a lazy reader — its checkpoint blocks free as
                # soon as the next sweep unpersists the old factors.
                for nm in self.rd.entities:
                    sid = len(snap[nm])
                    fr = self.factors[nm].withColumn("sample_id", F.lit(sid))
                    if self.spill_dir:
                        p = (
                            f"{self.spill_dir}/samples-{spill_token}/"
                            f"{_safe_name(nm)}/{sid}"
                        )
                        fr.write.mode("overwrite").parquet(p)
                        fr = self.spark.read.parquet(p)
                    snap[nm].append(fr)

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
                acc = _checkpoint(acc)
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
        factor_samples = None
        n_samples = 0
        if kept_js and all(snap[nm] for nm in snap):
            n_samples = len(next(iter(snap.values())))
            factor_samples = {
                nm: reduce(lambda a, b: a.unionByName(b), frames)
                for nm, frames in snap.items()
            }
        self._release_working_caches()
        return TrainResult(
            factors=self.factors,
            pred_mean=pred_mean,
            rmse_trace=trace,
            rmse=trace[-1] if trace else None,
            auc=auc,
            beta=self.beta,
            hyper=self.hyper,
            rel_entities=list(rel0.entities),
            global_mean=self.global_mean,
            rel_entities_all=[list(r.entities) for r in self.rd.relations],
            rel_means=[self._rel_mean[id(r)] for r in self.rd.relations],
            entity_counts=dict(self._entity_counts),
            probit=rel0.probit,
            factor_samples=factor_samples,
            n_samples=n_samples,
            alphas=[self._alpha[id(r)] for r in self.rd.relations],
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
