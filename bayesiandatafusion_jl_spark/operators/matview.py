"""Incremental materialized-aggregate maintenance (matview).

A 100 TB fact table's rollups are not recomputed from scratch per run —
the nightly refresh must cost O(delta), never O(base). This module keeps
a per-key MERGEABLE STATE (the classic incremental-view-maintenance
decomposition: every supported readout is derivable from sum/count/
min/max partials, which are associative and commutative), so refreshing
a materialized rollup is: aggregate the delta down to its key grain,
then merge two key-grain frames. The base facts are touched exactly
once — at initial build.

State layout per measure column ``m``: ``m_sum`` (kept as
``decimal(38,6)`` IN THE STATE, not double — decimal sums are exact and
order-independent, so any merge tree over any number of deltas produces
bit-identical state; casting to double per merge would re-introduce the
float-order nondeterminism exprs.py exists to kill), ``m_cnt`` (non-null
count), and optionally ``m_min`` / ``m_max``. Plus ``n_rows``. The
readout derives ``m_avg = sum/cnt`` with one IEEE division.

Scale shapes:

- ``rollup_state`` is one hash aggregate with map-side partial combine —
  the delta shuffles at its KEY cardinality, not its row count.
- ``rollup_merge`` unions key-grain frames and re-aggregates: cost is
  the states' key counts. With the state persisted bucketed on the keys
  (sources/io.py ``write_parquet(bucket_by=...)``) even that shuffle
  disappears on the state side.
- ``rollup_retract`` handles CDC deletes by merging a NEGATED delta
  state: sum/count subtract exactly (decimal). min/max are NOT
  retractable without re-reading the base (the standard IVM
  limitation), so retraction requires a state built with
  ``minmax=False`` and raises otherwise — loudly, instead of serving a
  stale min.

No reference analogue (upstream is a batch ML library); this is the
warehouse-side machinery a training pipeline needs to keep corpus
statistics current without rescanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import DEC, sql_dmean, sql_dsum
from bayesiandatafusion_jl_spark.registry import register


def _state_cols(measures: list[str], minmax: bool) -> list[str]:
    out = []
    for m in measures:
        out += [f"{m}_sum", f"{m}_cnt"] + ([f"{m}_min", f"{m}_max"] if minmax else [])
    return out + ["n_rows"]


def rollup_state(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
) -> DataFrame:
    """Key-grain mergeable state for ``df`` (one hash aggregate,
    map-side combinable). Build it once on the base, then once per
    delta batch; combine with ``rollup_merge``."""
    aggs = []
    for m in measures:
        aggs.append(F.sum(F.col(m).cast(DEC)).alias(f"{m}_sum"))
        aggs.append(F.count(F.col(m)).alias(f"{m}_cnt"))
        if minmax:
            aggs.append(F.min(m).alias(f"{m}_min"))
            aggs.append(F.max(m).alias(f"{m}_max"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def rollup_merge(
    states: list[DataFrame],
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
) -> DataFrame:
    """Merge any number of key-grain states into one (union + one hash
    aggregate over key cardinality; never touches fact rows). Decimal
    sums make the result independent of merge order and tree shape."""
    if not states:
        raise ValueError("rollup_merge needs at least one state")
    cols = keys + _state_cols(measures, minmax)
    merged = states[0].select(*cols)
    for s in states[1:]:
        merged = merged.unionByName(s.select(*cols))
    aggs = []
    for m in measures:
        # sum over decimal(38,6) partials stays decimal(38,6): exact
        aggs.append(F.sum(f"{m}_sum").cast(DEC).alias(f"{m}_sum"))
        aggs.append(F.sum(f"{m}_cnt").alias(f"{m}_cnt"))
        if minmax:
            aggs.append(F.min(f"{m}_min").alias(f"{m}_min"))
            aggs.append(F.max(f"{m}_max").alias(f"{m}_max"))
    aggs.append(F.sum("n_rows").alias("n_rows"))
    return merged.groupBy(*keys).agg(*aggs)


def rollup_retract(
    state: DataFrame,
    retracted: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Remove previously-ingested rows from a state by merging their
    negated partials (CDC delete / correction path). Keys whose count
    drops to zero disappear from the view.

    Requires a ``minmax=False`` state: a retracted row that WAS the
    minimum leaves min/max unrecoverable without re-reading the base,
    and serving a silently-stale extremum is worse than refusing."""
    bad = [c for c in state.columns if c.endswith(("_min", "_max"))]
    if bad:
        raise ValueError(
            "rollup_retract needs a state built with minmax=False — "
            f"min/max are not retractable (found {bad}); rebuild the "
            "affected keys from the base instead"
        )
    neg = rollup_state(retracted, keys, measures, minmax=False)
    flipped = neg.select(
        *keys,
        *[
            c
            for m in measures
            for c in (
                (-F.col(f"{m}_sum")).cast(DEC).alias(f"{m}_sum"),
                (-F.col(f"{m}_cnt")).alias(f"{m}_cnt"),
            )
        ],
        (-F.col("n_rows")).alias("n_rows"),
    )
    return rollup_merge([state, flipped], keys, measures, minmax=False).filter(
        F.col("n_rows") > 0
    )


def rollup_read(
    state: DataFrame,
    measures: list[str],
) -> DataFrame:
    """Serve the view: per measure sum (double), count, avg (one IEEE
    division of identical operands in any engine), and min/max when the
    state carries them."""
    has_minmax = any(c.endswith("_min") for c in state.columns)
    state_names = set(_state_cols(measures, True))
    out = [F.col(c) for c in state.columns if c not in state_names]
    for m in measures:
        out.append(F.col(f"{m}_sum").cast("double").alias(f"sum_{m}"))
        out.append(F.col(f"{m}_cnt").alias(f"cnt_{m}"))
        out.append(
            (F.col(f"{m}_sum").cast("double") / F.col(f"{m}_cnt")).alias(f"avg_{m}")
        )
        if has_minmax:
            out.append(F.col(f"{m}_min").alias(f"min_{m}"))
            out.append(F.col(f"{m}_max").alias(f"max_{m}"))
    out.append(F.col("n_rows"))
    return state.select(*out)


@register(
    "q_matview_rollup",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum('l_quantity')} AS sum_l_quantity,
           COUNT(l_quantity) AS cnt_l_quantity,
           {sql_dmean('l_quantity')} AS avg_l_quantity,
           MIN(l_quantity) AS min_l_quantity,
           MAX(l_quantity) AS max_l_quantity,
           {sql_dsum('l_extendedprice')} AS sum_l_extendedprice,
           COUNT(l_extendedprice) AS cnt_l_extendedprice,
           {sql_dmean('l_extendedprice')} AS avg_l_extendedprice,
           MIN(l_extendedprice) AS min_l_extendedprice,
           MAX(l_extendedprice) AS max_l_extendedprice,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("D1", "matview", "maintenance"),
    demoted=True,
)
def q_matview_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup ≡ full recompute: lineitem split into a base
    (80% of order keys) and two delta batches, each aggregated to state
    independently, merged, and read out — hash-identical to the oracle's
    one-shot GROUP BY over the whole table. The refresh path the oracle
    can't express: merging delta 2 later costs |keys| + |delta2|, not a
    re-read of the base."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = ["l_quantity", "l_extendedprice"]
    base = li.filter(F.col("l_orderkey") % 10 < 8)
    delta1 = li.filter(F.col("l_orderkey") % 10 == 8)
    delta2 = li.filter(F.col("l_orderkey") % 10 == 9)
    state = rollup_merge(
        [rollup_state(d, keys, measures) for d in (base, delta1, delta2)],
        keys,
        measures,
    )
    return rollup_read(state, measures)
