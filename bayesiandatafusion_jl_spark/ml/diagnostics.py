"""MCMC convergence diagnostics over stored posterior samples.

The reference's Gibbs sampler (and this engine's) answers "has it
converged?" only by eyeballing the per-sweep RMSE trace. The standard
quantitative answer is the Gelman–Rubin potential scale reduction factor
R̂ [Gelman & Rubin 1992; split-chain form: Vehtari et al. 2021]: run M
independent chains (different seeds), compare within-chain to
between-chain variance of a monitored scalar; R̂ ≈ 1 ⇒ the chains are
sampling the same distribution. Its companion is the Geyer effective
sample size [Geyer 1992] — how many INDEPENDENT draws the autocorrelated
samples are worth, the denominator of every Monte-Carlo standard error.

What to monitor: NOT the factors — a factor model's latent dimensions are
identifiable only up to rotation/permutation, so per-coordinate factor
traces never "converge" across chains. The rotation-invariant observables
are the PREDICTIONS û·v̂ at probe cells, which is what ``rhat``/``ess``
monitor (the practical choice in the BPMF literature).

Coverage caveat (inherited from ``TrainResult.sample_scores``): probe
cells whose entity ids have no stored factor row (never seen in training)
are DROPPED by the inner factor join — the output can hold fewer rows
than the distinct probe count. Diagnose trained cells, or predict
cold-start ids via side info first.

Plan shape (100 TB): ``sample_scores`` is the same broadcast factor join
as ``predict`` (one row per cell × sample); R̂ is then two hash
aggregations and ESS one block-folded ``applyInPandas`` pass (cells are
folded inside Arrow batches — per-group dispatch is per BLOCK, not per
cell). Nothing N-scaled touches the driver; probe-cell count is the only
scale knob and it is caller-chosen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chain_traces(
    models: list, cells_df: DataFrame, entities: list[str] | None, min_s: int
) -> tuple[DataFrame, int]:
    """Validate the chains and union their per-sample score traces with a
    ``__chain`` tag. Returns ``(trace, n_samples)``."""
    s = models[0].n_samples
    if any(m.n_samples != s for m in models):
        raise ValueError(
            f"chains disagree on n_samples: {[m.n_samples for m in models]}"
        )
    if s < min_s:
        raise ValueError(
            f"need n_samples >= {min_s} (got {s}): train with a larger "
            "keep_samples/psamples"
        )
    frames = [
        mdl.sample_scores(cells_df, entities).withColumn("__chain", F.lit(c))
        for c, mdl in enumerate(models)
    ]
    return reduce(lambda a, b: a.unionByName(b), frames), s


def rhat_from_trace(
    trace: DataFrame,
    cell_cols: list[str],
    n_samples: int,
    split: bool = True,
) -> DataFrame:
    """R̂ from a prebuilt trace frame (columns: ``cell_cols`` +
    ``__chain`` + ``sample_id`` + ``score``) — the seam that lets a
    caller build the (expensive) trace once and feed both ``rhat`` and
    ``ess`` from it. See ``rhat`` for semantics."""
    s = n_samples
    half = s // 2
    n = float(half if split else s)
    if split:
        # first `half` sweeps vs last `half` per chain; on odd S the
        # middle sample is dropped so both halves are equal length
        trace = trace.filter(
            (F.col("sample_id") < half) | (F.col("sample_id") >= s - half)
        ).withColumn(
            "__chain",
            F.col("__chain") * 2
            + (F.col("sample_id") >= s - half).cast("int"),
        )
    per_chain = trace.groupBy(*cell_cols, "__chain").agg(
        F.avg("score").alias("__m"), F.var_samp("score").alias("__v")
    )
    w = F.avg("__v")
    b_over_n = F.var_samp("__m")  # = B/n across the sub-chains
    var_plus = F.lit((n - 1.0) / n) * w + b_over_n
    # W = 0 with B > 0 is the WORST signature — chains frozen at
    # DIFFERENT values (a stuck sampler): mathematically R̂ → ∞, so
    # report +Infinity, not NULL; NULL is reserved for the fully
    # degenerate constant-everywhere trace (no scale to reduce at all)
    return per_chain.groupBy(*cell_cols).agg(
        F.when(w > 0, F.sqrt(var_plus / w))
        .when(b_over_n > 0, F.lit(float("inf")))
        .alias("rhat")
    )


def rhat(
    models: list,
    cells_df: DataFrame,
    entities: list[str] | None = None,
    split: bool = True,
) -> DataFrame:
    """Split-chain Gelman–Rubin R̂ of the posterior score at probe cells.

    ``models``: TrainResults trained with ``keep_samples != 0`` on the
    same data with DIFFERENT seeds (independent chains). ``split=True``
    (the modern default) halves each chain along sweep order, which also
    detects a still-trending single chain; M models yield 2M sub-chains,
    so even one model is diagnosable. Returns one row per distinct probe
    cell (minus cold ids — see the module caveat): the cell id columns +
    ``rhat`` (double; +Infinity for chains frozen at different values,
    NULL only for a trace constant across ALL chains). Converged ⇒
    rhat ≲ 1.01 (loose practical cut: 1.1).

    With ``split=False`` and M identical chains the estimator's bias is
    visible exactly: B = 0 ⇒ R̂ = √((n−1)/n) — pinned by the tests.
    """
    if not models:
        raise ValueError("rhat needs at least one trained model")
    if not split and len(models) < 2:
        raise ValueError("split=False needs >= 2 chains (models)")
    trace, s = _chain_traces(models, cells_df, entities, 4 if split else 2)
    return rhat_from_trace(trace, list(cells_df.columns), s, split=split)


def _ess_kernel(arr) -> float:
    """Combined-chain effective sample size of an m×n trace array
    [Vehtari et al. 2021 §3.2 / Geyer 1992 initial-monotone-sequence].

    Per-lag autocovariances use the biased (divide-by-n) estimator;
    ρ_t combines chains through W and var⁺ so between-chain drift counts
    as autocorrelation; paired sums are truncated at the first negative
    pair and forced monotone non-increasing. Returns NaN for a
    degenerate (zero-variance) trace. Pure numpy — traces are bounded
    (m chains × n kept samples), never data-scaled."""
    import numpy as np

    m, n = arr.shape
    chain_vars = arr.var(axis=1, ddof=1) if n > 1 else np.zeros(m)
    w = chain_vars.mean()
    b_over_n = arr.mean(axis=1).var(ddof=1) if m > 1 else 0.0
    var_plus = (n - 1.0) / n * w + b_over_n
    if not np.isfinite(var_plus) or var_plus <= 0:
        return float("nan")
    centered = arr - arr.mean(axis=1, keepdims=True)
    # mean-over-chains autocovariance at each lag, divisor n (Geyer)
    acov = np.array(
        [
            np.mean([c[: n - t] @ c[t:] for c in centered]) / n
            for t in range(n)
        ]
    )
    rho = 1.0 - (w - acov) / var_plus
    # Geyer pairs: sum ρ_{2k} + ρ_{2k+1}, stop at first negative pair,
    # then enforce the monotone non-increasing envelope
    pairs = []
    for k in range(0, n - 1, 2):
        p = rho[k] + rho[k + 1]
        if p <= 0:
            break
        pairs.append(p)
    for i in range(1, len(pairs)):
        pairs[i] = min(pairs[i], pairs[i - 1])
    # antithetic traces can legitimately have tau < 1 (ESS above the raw
    # draw count); cap at m·n·log10(m·n) per Stan's convention so a
    # truncated-at-zero pair sum can't report a near-infinite ESS
    tau = max(-1.0 + 2.0 * sum(pairs), 1e-10)
    cap = m * n * max(1.0, np.log10(m * n))
    return float(min(m * n / tau, cap))


def ess_from_trace(
    trace: DataFrame, cell_cols: list[str], n_samples: int
) -> DataFrame:
    """ESS from a prebuilt trace frame (same seam as
    ``rhat_from_trace``). One ``applyInPandas`` pass, BLOCK-folded:
    cells are hashed into ``shuffle.partitions`` blocks and the bounded
    m×S kernel runs per cell INSIDE each Arrow batch — per-group
    dispatch overhead (~1–3 ms/group measured in this engine) is paid
    per block, not per probe cell, so a 100k-cell probe set costs ~32
    dispatches, not 100k."""
    from bayesiandatafusion_jl_spark.session import shuffle_partitions

    n_blocks = shuffle_partitions(trace.sparkSession)
    out_fields = ", ".join(
        f"`{c}` {trace.schema[c].dataType.simpleString()}" for c in cell_cols
    )
    out_schema = out_fields + ", ess double"

    def _per_block(pdf):
        import numpy as np
        import pandas as pd

        rows = []
        for cell, g in pdf.groupby(cell_cols, sort=False):
            chains = [
                cg.sort_values("sample_id")["score"].to_numpy()
                for _, cg in g.groupby("__chain", sort=True)
            ]
            n = min(len(c) for c in chains)
            e = _ess_kernel(np.stack([c[:n] for c in chains]))
            key = cell if isinstance(cell, tuple) else (cell,)
            rows.append(key + (None if not np.isfinite(e) else e,))
        return pd.DataFrame(rows, columns=cell_cols + ["ess"])

    blocked = trace.withColumn(
        "__blk", F.pmod(F.xxhash64(*cell_cols), F.lit(n_blocks))
    )
    return blocked.groupBy("__blk").applyInPandas(_per_block, out_schema)


def ess(
    models: list,
    cells_df: DataFrame,
    entities: list[str] | None = None,
) -> DataFrame:
    """Per-probe-cell effective sample size of the posterior score.

    R̂ says whether the chains agree; ESS says how many INDEPENDENT draws
    the m×S autocorrelated Gibbs samples are worth — the denominator of
    every Monte-Carlo standard error (mcse = sd/√ESS). One row per
    distinct probe cell (minus cold ids — see the module caveat): cell
    ids + ``ess`` (double; NULL for a degenerate constant trace, capped
    at m·n·log₁₀(m·n) per Stan's convention)."""
    if not models:
        raise ValueError("ess needs at least one trained model")
    trace, s = _chain_traces(models, cells_df, entities, 2)
    return ess_from_trace(trace, list(cells_df.columns), s)
