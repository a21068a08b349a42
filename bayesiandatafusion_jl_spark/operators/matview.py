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

Two further pieces round out the deployment shape:

- ``distinct_cols`` stores a Datasketches HLL sketch per key per column
  (``hll_sketch_agg`` / ``hll_union_agg`` — register-max merge, so the
  merged estimate is EXACTLY the one-shot-sketch estimate at any merge
  tree): mergeable approx-distinct, the uniques rollup COUNT(DISTINCT)'s
  Expand can never provide incrementally.
- the persisted lifecycle (``write_matview`` / ``matview_append`` /
  ``read_matview`` / ``compact_matview`` + streaming ingestion via
  ``streaming.pipelines.matview_ingest_stream``): epoch-partitioned
  partials with config pinning, replay-idempotent appends, a
  folded-epoch ledger written before the compaction swap, and CDC
  retraction epochs — the same durability contract as the vector and
  signature indexes.

No reference analogue (upstream is a batch ML library); this is the
warehouse-side machinery a training pipeline needs to keep corpus
statistics current without rescanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import DEC, sql_dmean, sql_dsum
from bayesiandatafusion_jl_spark.registry import register


def _state_cols(
    measures: list[str],
    minmax: bool,
    distinct_cols: list[str] | None = None,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> list[str]:
    out = []
    for m in measures:
        out += [f"{m}_sum", f"{m}_cnt"]
        out += [f"{m}_sum2"] if sumsq else []
        out += [f"{m}_min", f"{m}_max"] if minmax else []
    out += [f"{c}_hll" for c in distinct_cols or []]
    out += [f"{c}_hist" for c in hist_cols or {}]
    return out + ["n_rows"]


def _hist_bucket(col: str, lo: float, hi: float, nb: int) -> F.Column:
    """Same clamped IEEE bucket arithmetic as ``aggregates.histogram`` —
    the two must agree or a matview histogram and a one-shot histogram
    of the same data would disagree."""
    width = (hi - lo) / nb
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1))


def rollup_state(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> DataFrame:
    """Key-grain mergeable state for ``df`` (one hash aggregate,
    map-side combinable). Build it once on the base, then once per
    delta batch; combine with ``rollup_merge``.

    ``distinct_cols`` adds a Datasketches HLL sketch per listed column
    (``F.hll_sketch_agg``) — the mergeable approx-distinct the exact
    ``COUNT(DISTINCT)`` Expand can never be at 100 TB: register-max
    merge is associative/commutative/idempotent, so the merged
    estimate is EXACTLY the estimate a one-shot sketch of the whole
    table would give, at any merge tree and ~(2^lg_k) bytes per key.

    ``hist_cols`` ({col: (lo, hi, n_buckets)}) adds a dense equi-width
    histogram per key per column — exact counts (so mergeable AND
    retractable by element-wise array arithmetic) built as n_buckets
    conditional sums inside the same hash aggregate, same clamped IEEE
    bucket arithmetic as ``aggregates.histogram``. The quantile readout
    (``histogram_quantiles``) interpolates within buckets — mergeable
    approximate percentiles, the piece exact-percentile windows can't
    provide incrementally."""
    aggs = []
    for m in measures:
        aggs.append(F.sum(F.col(m).cast(DEC)).alias(f"{m}_sum"))
        aggs.append(F.count(F.col(m)).alias(f"{m}_cnt"))
        if sumsq:
            # decimal squares: exact, mergeable, retractable — the extra
            # partial that makes variance/std (and drift z-scores)
            # derivable from state alone
            aggs.append(
                F.sum((F.col(m).cast(DEC) * F.col(m).cast(DEC)).cast(DEC)).alias(
                    f"{m}_sum2"
                )
            )
        if minmax:
            aggs.append(F.min(m).alias(f"{m}_min"))
            aggs.append(F.max(m).alias(f"{m}_max"))
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(int(lg_k))).alias(f"{c}_hll"))
    for c, (lo, hi, nb) in (hist_cols or {}).items():
        b = _hist_bucket(c, lo, hi, nb)
        x = F.col(c).cast("double")
        valid = x.isNotNull() & ~F.isnan(x)  # histogram()'s NULL/NaN rule
        aggs.append(
            F.array(
                *[
                    F.sum(
                        F.when(valid & (b == i), F.lit(1)).otherwise(F.lit(0))
                    ).cast("long")
                    for i in range(nb)
                ]
            ).alias(f"{c}_hist")
        )
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def rollup_merge(
    states: list[DataFrame],
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> DataFrame:
    """Merge any number of key-grain states into one (union + one hash
    aggregate over key cardinality; never touches fact rows). Decimal
    sums make the result independent of merge order and tree shape;
    HLL register-max union is order-independent by construction;
    histogram arrays merge by per-bucket long sums."""
    if not states:
        raise ValueError("rollup_merge needs at least one state")
    cols = keys + _state_cols(measures, minmax, distinct_cols, hist_cols, sumsq)
    merged = states[0].select(*cols)
    for s in states[1:]:
        merged = merged.unionByName(s.select(*cols))
    aggs = []
    for m in measures:
        # sum over decimal(38,6) partials stays decimal(38,6): exact
        aggs.append(F.sum(f"{m}_sum").cast(DEC).alias(f"{m}_sum"))
        aggs.append(F.sum(f"{m}_cnt").alias(f"{m}_cnt"))
        if sumsq:
            aggs.append(F.sum(f"{m}_sum2").cast(DEC).alias(f"{m}_sum2"))
        if minmax:
            aggs.append(F.min(f"{m}_min").alias(f"{m}_min"))
            aggs.append(F.max(f"{m}_max").alias(f"{m}_max"))
    for c in distinct_cols or []:
        aggs.append(F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll"))
    for c, (_, _, nb) in (hist_cols or {}).items():
        aggs.append(
            F.array(
                *[
                    F.sum(F.element_at(F.col(f"{c}_hist"), i + 1)).cast("long")
                    for i in range(nb)
                ]
            ).alias(f"{c}_hist")
        )
    aggs.append(F.sum("n_rows").alias("n_rows"))
    return merged.groupBy(*keys).agg(*aggs)


def _negate_partials(
    state: DataFrame,
    keys: list[str],
    measures: list[str],
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> DataFrame:
    """Flip a retractable (minmax-free, HLL-free) state's signs: decimal
    sums (and squares), counts, n_rows, and per-bucket histogram counts
    all subtract exactly."""
    return state.select(
        *keys,
        *[
            c
            for m in measures
            for c in (
                [
                    (-F.col(f"{m}_sum")).cast(DEC).alias(f"{m}_sum"),
                    (-F.col(f"{m}_cnt")).alias(f"{m}_cnt"),
                ]
                + (
                    [(-F.col(f"{m}_sum2")).cast(DEC).alias(f"{m}_sum2")]
                    if sumsq
                    else []
                )
            )
        ],
        *[
            F.transform(F.col(f"{c}_hist"), lambda x: -x).alias(f"{c}_hist")
            for c in hist_cols or {}
        ],
        (-F.col("n_rows")).alias("n_rows"),
    )


def rollup_retract(
    state: DataFrame,
    retracted: DataFrame,
    keys: list[str],
    measures: list[str],
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> DataFrame:
    """Remove previously-ingested rows from a state by merging their
    negated partials (CDC delete / correction path). Keys whose count
    drops to zero disappear from the view.

    Requires a ``minmax=False`` state without HLL columns: a retracted
    row that WAS the minimum leaves min/max unrecoverable without
    re-reading the base, and HLL registers are max-merged (insert-only)
    — serving a silently-stale extremum or uniques count is worse than
    refusing. Histogram partials ARE retractable (exact per-bucket
    counts subtract)."""
    bad = [c for c in state.columns if c.endswith(("_min", "_max", "_hll"))]
    if bad:
        raise ValueError(
            "rollup_retract needs a state built with minmax=False and no "
            f"distinct_cols — min/max/HLL are not retractable (found {bad});"
            " rebuild the affected keys from the base instead"
        )
    neg = rollup_state(
        retracted, keys, measures, minmax=False, hist_cols=hist_cols, sumsq=sumsq
    )
    flipped = _negate_partials(neg, keys, measures, hist_cols, sumsq)
    return rollup_merge(
        [state, flipped], keys, measures, minmax=False, hist_cols=hist_cols,
        sumsq=sumsq,
    ).filter(F.col("n_rows") > 0)


def rollup_read(
    state: DataFrame,
    measures: list[str],
) -> DataFrame:
    """Serve the view: per measure sum (double), count, avg (one IEEE
    division of identical operands in any engine), min/max when the
    state carries them, and ``approx_distinct_<col>`` per stored HLL
    sketch."""
    has_minmax = any(c.endswith("_min") for c in state.columns)
    has_sumsq = any(c.endswith("_sum2") for c in state.columns)
    hll_cols = [c[: -len("_hll")] for c in state.columns if c.endswith("_hll")]
    hist_names = [c for c in state.columns if c.endswith("_hist")]
    state_names = set(
        _state_cols(measures, True, hll_cols, sumsq=True)
    ) | set(hist_names)
    out = [F.col(c) for c in state.columns if c not in state_names]
    for m in measures:
        out.append(F.col(f"{m}_sum").cast("double").alias(f"sum_{m}"))
        out.append(F.col(f"{m}_cnt").alias(f"cnt_{m}"))
        mean = F.col(f"{m}_sum").cast("double") / F.col(f"{m}_cnt")
        out.append(mean.alias(f"avg_{m}"))
        if has_sumsq:
            # population variance from the mergeable partials:
            # E[x²] − E[x]² (clamped — decimal truncation can leave a
            # tiny negative for near-constant columns)
            var = (
                F.col(f"{m}_sum2").cast("double") / F.col(f"{m}_cnt")
                - mean * mean
            )
            out.append(
                F.sqrt(F.greatest(var, F.lit(0.0))).alias(f"std_{m}")
            )
        if has_minmax:
            out.append(F.col(f"{m}_min").alias(f"min_{m}"))
            out.append(F.col(f"{m}_max").alias(f"max_{m}"))
    for c in hll_cols:
        out.append(
            F.hll_sketch_estimate(F.col(f"{c}_hll")).alias(f"approx_distinct_{c}")
        )
    for c in hist_names:
        out.append(F.col(c))  # raw mergeable counts; see histogram_quantiles
    out.append(F.col("n_rows"))
    return state.select(*out)


def histogram_quantiles(
    state: DataFrame,
    col: str,
    lo: float,
    hi: float,
    probs: list[float],
    keys: list[str] | None = None,
) -> DataFrame:
    """Approximate per-key quantiles from a ``hist_cols`` state column:
    linear interpolation inside the bucket where the cumulative count
    crosses p·total (the classic histogram-quantile estimator — error
    bounded by one bucket width). Runs on |keys|·n_buckets exploded
    rows — state grain, never data grain. Output: keys + one ``p<prob>``
    column per requested quantile (``p0.5`` → ``p50``)."""
    keys = list(keys or [])
    hist = f"{col}_hist"
    base = state.select(
        *keys,
        F.posexplode(F.col(hist)).alias("__b", "__cnt"),
        F.size(F.col(hist)).alias("__nb"),
    )
    pw = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    cum = base.withColumn(
        "__cum",
        F.sum("__cnt").over(
            pw.orderBy("__b").rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn(
        "__total",
        F.sum("__cnt").over(
            pw.orderBy("__b").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ),
    )
    bucket_w = (F.lit(float(hi)) - F.lit(float(lo))) / F.col("__nb")
    outs = []
    for p in probs:
        pct = float(p) * 100
        name = f"p{int(round(pct))}" if abs(pct - round(pct)) < 1e-9 else (
            "p" + f"{pct:g}".replace(".", "_")
        )
        target = F.lit(float(p)) * F.col("__total")
        frac = (target - (F.col("__cum") - F.col("__cnt"))) / F.col("__cnt")
        hit = (
            cum.filter((F.col("__cum") >= target) & (F.col("__cnt") > 0))
            .withColumn("__rk", F.row_number().over(pw.orderBy("__b")))
            .filter(F.col("__rk") == 1)
        )
        outs.append(
            hit.select(
                *keys,
                (
                    F.lit(float(lo))
                    + (
                        F.col("__b")
                        + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
                    )
                    * bucket_w
                ).alias(name),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.join(o, keys) if keys else res.crossJoin(o)
    return res


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


# --- persisted matview (r12): the deployment lifecycle -------------------
#
# A matview that outlives one session is a directory, same discipline as
# the vector/signature indexes (functions/vector_index.py):
#
#   <view_dir>/meta                 pinned config (fingerprint + lg_k +
#                                   flags) — a delta aggregated under a
#                                   DIFFERENT (keys, measures) config
#                                   would merge garbage, so appends check
#   <view_dir>/state/__epoch=<e>/   one key-grain partial state per
#                                   ingested batch (dynamic-partition
#                                   overwrite: a replayed batch REWRITES
#                                   its own epoch instead of
#                                   double-counting — byte-idempotent)
#   <view_dir>/folded               replay ledger (functions/index_compact
#                                   primitives): epochs folded by a past
#                                   compaction are REJECTED on re-append,
#                                   written BEFORE the swap so a crash
#                                   between the two spuriously rejects,
#                                   never silently duplicates
#
# Serving merges the epoch partials (|epochs|·|keys| rows — never fact
# rows); compaction folds them back to one epoch when the epoch count
# grows. Retraction batches append NEGATED partials as their own epochs
# (sum/count-only views), so CDC deletes flow through the same
# idempotent epoch contract.

def _config_fp(
    keys: list[str],
    measures: list[str],
    minmax: bool,
    distinct_cols: list[str] | None,
    lg_k: int,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> int:
    """28-bit config fingerprint (sha256 prefix — the bpe.py artifact
    discipline): pins column sets + flags into index_meta's int rows."""
    import hashlib

    canon = "|".join(
        [
            ",".join(keys),
            ",".join(measures),
            str(int(minmax)),
            ",".join(distinct_cols or []),
            str(int(lg_k)),
            ",".join(
                f"{c}:{lo!r}:{hi!r}:{nb}"
                for c, (lo, hi, nb) in sorted((hist_cols or {}).items())
            ),
            str(int(sumsq)),
        ]
    )
    return int.from_bytes(hashlib.sha256(canon.encode()).digest()[:4], "big") >> 4


def _view_paths(view_dir: str):
    from bayesiandatafusion_jl_spark.functions.index_meta import index_paths

    return index_paths(view_dir, "meta", "state")


def write_matview(
    base: DataFrame,
    view_dir: str,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> None:
    """Fresh view build: aggregate ``base`` to state, write it as the
    ``base`` epoch, pin the config, reset the replay ledger (a new
    incarnation owns a new epoch namespace)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import reset_ledger
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        write_epoch,
        write_meta,
    )

    spark = base.sparkSession
    meta_path, state_path = _view_paths(view_dir)
    reset_ledger(spark, view_dir)
    state = rollup_state(
        base, keys, measures, minmax, distinct_cols, lg_k, hist_cols, sumsq
    )
    write_epoch(state, state_path, "base", fresh=True)
    write_meta(
        spark,
        meta_path,
        "overwrite",
        config_fp=_config_fp(
            keys, measures, minmax, distinct_cols, lg_k, hist_cols, sumsq
        ),
        minmax=int(minmax),
        sumsq=int(sumsq),
        lg_k=int(lg_k),
        retract_ok=int(not minmax and not distinct_cols),
    )


def _check_view(spark: SparkSession, view_dir: str, keys, measures, minmax,
                distinct_cols, lg_k, hist_cols=None, sumsq=False) -> None:
    from bayesiandatafusion_jl_spark.functions.index_meta import check_meta

    meta_path, _ = _view_paths(view_dir)
    check_meta(
        spark,
        meta_path,
        "a state aggregated under a different (keys, measures, minmax,"
        " distinct_cols, lg_k) config would merge into garbage — rebuild"
        " the view or match its pinned config",
        config_fp=_config_fp(
            keys, measures, minmax, distinct_cols, lg_k, hist_cols, sumsq
        ),
    )


def matview_append(
    delta: DataFrame,
    view_dir: str,
    keys: list[str],
    measures: list[str],
    epoch: str,
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
    sumsq: bool = False,
    retract: bool = False,
) -> None:
    """Ingest one delta batch: aggregate it to key grain and write it as
    its own ``__epoch`` partition. Replay-idempotent (the epoch is
    dynamically overwritten), config-pinned, and ledger-checked (an
    epoch folded by a past compaction is rejected — re-ingest genuinely
    new data under a NEW epoch name). ``retract=True`` negates the
    partials (CDC delete/correction), allowed only on views pinned
    ``retract_ok`` (minmax=False, no distinct_cols)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        guard_append,
        read_meta,
        write_epoch,
    )

    spark = delta.sparkSession
    meta_path, state_path = _view_paths(view_dir)
    _check_view(
        spark, view_dir, keys, measures, minmax, distinct_cols, lg_k,
        hist_cols, sumsq,
    )
    guard_append(spark, view_dir, epoch, reserved=("base",))
    state = rollup_state(
        delta, keys, measures, minmax, distinct_cols, lg_k, hist_cols, sumsq
    )
    if retract:
        if not read_meta(spark, meta_path)["retract_ok"]:
            raise ValueError(
                "retraction needs a view built with minmax=False and no"
                " distinct_cols — min/max/HLL partials cannot subtract"
                " (histogram partials subtract fine and are allowed)"
            )
        state = _negate_partials(state, keys, measures, hist_cols, sumsq)
    write_epoch(state, state_path, epoch, fresh=False)


def read_matview(
    spark: SparkSession,
    view_dir: str,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> DataFrame:
    """Serve the view: merge every epoch's partials down to one state
    and read it out. Cost is |epochs|·|keys| state rows — fact rows are
    never re-read; fully-retracted keys (n_rows <= 0) disappear."""
    _check_view(
        spark, view_dir, keys, measures, minmax, distinct_cols, lg_k,
        hist_cols, sumsq,
    )
    _, state_path = _view_paths(view_dir)
    state = spark.read.parquet(state_path).drop("__epoch")
    merged = rollup_merge(
        [state], keys, measures, minmax, distinct_cols, hist_cols, sumsq
    )
    return rollup_read(merged.filter(F.col("n_rows") > 0), measures)


def compact_matview(
    spark: SparkSession,
    view_dir: str,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
    sumsq: bool = False,
) -> list[str]:
    """Fold every epoch partial into one compacted epoch, so serve-time
    merge cost stays |keys| no matter how many batches ever ingested.
    Crash ordering follows the index_compact contract: the folded
    epochs hit the replay ledger BEFORE the state swap — a crash
    between the two leaves replays spuriously rejected, never silently
    double-counted. Returns the folded epoch names."""
    from bayesiandatafusion_jl_spark.functions.index_compact import _swap_dir
    from bayesiandatafusion_jl_spark.functions.index_meta import begin_fold

    _check_view(
        spark, view_dir, keys, measures, minmax, distinct_cols, lg_k,
        hist_cols, sumsq,
    )
    _, state_path = _view_paths(view_dir)
    state = spark.read.parquet(state_path)
    # force=True: the rewrite COLLAPSES state to merged partials, so even
    # a lone epoch must become non-replayable (ledger BEFORE the swap —
    # the refit_ivf_index lesson, ADVICE r11)
    new_epoch, epochs = begin_fold(spark, view_dir, state_path, force=True)
    merged = rollup_merge(
        [state.drop("__epoch")], keys, measures, minmax, distinct_cols,
        hist_cols, sumsq,
    )
    tmp_path = state_path.rstrip("/") + ".__compact_tmp"
    (
        merged.withColumn("__epoch", F.lit(new_epoch))
        .write.mode("overwrite")
        .partitionBy("__epoch")
        .parquet(tmp_path)
    )
    _swap_dir(spark, tmp_path, state_path)
    return sorted(epochs)


@register(
    "q_matview_persisted",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum('l_quantity')} AS sum_l_quantity,
           COUNT(l_quantity) AS cnt_l_quantity,
           {sql_dmean('l_quantity')} AS avg_l_quantity,
           MIN(l_quantity) AS min_l_quantity,
           MAX(l_quantity) AS max_l_quantity,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_orderkey % 10 < 9
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("D1", "matview", "maintenance", "streaming"),
    demoted=True,
)
def q_matview_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-view lifecycle, end-to-end and hash-exact: build
    from an 80% base, append one delta epoch, compact, append a second
    delta, then RETRACT it again (negated-partial epoch) — the served
    readout must equal a one-shot GROUP BY over exactly base+delta1.
    Decimal partials make every step bit-deterministic, so this
    side-effecting pipeline still carries a full DuckDB oracle.

    min/max note: the retractable view pins minmax=False, so min/max
    for the oracle's column list come from a second, append-only
    minmax view over the same 90% slice — the composition a deployment
    would actually run (retractable sums + monotone extrema views)."""
    import shutil

    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = ["l_quantity"]
    base = li.filter(F.col("l_orderkey") % 10 < 8)
    d1 = li.filter(F.col("l_orderkey") % 10 == 8)
    d2 = li.filter(F.col("l_orderkey") % 10 == 9)
    vd = f"/tmp/bdf_matview/{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(vd, ignore_errors=True)
    write_matview(base, vd, keys, measures, minmax=False)
    matview_append(d1, vd, keys, measures, "d1", minmax=False)
    compact_matview(spark, vd, keys, measures, minmax=False)
    matview_append(d2, vd, keys, measures, "d2", minmax=False)
    matview_append(d2, vd, keys, measures, "undo-d2", minmax=False, retract=True)
    sums = read_matview(spark, vd, keys, measures, minmax=False)

    mmvd = vd + "_minmax"
    shutil.rmtree(mmvd, ignore_errors=True)
    write_matview(base, mmvd, keys, measures, minmax=True)
    matview_append(d1, mmvd, keys, measures, "d1", minmax=True)
    minmax = read_matview(spark, mmvd, keys, measures, minmax=True).select(
        *keys, "min_l_quantity", "max_l_quantity"
    )
    return sums.join(minmax, keys).select(
        *keys,
        "sum_l_quantity",
        "cnt_l_quantity",
        "avg_l_quantity",
        "min_l_quantity",
        "max_l_quantity",
        "n_rows",
    )


def matview_drift(
    delta: DataFrame,
    view_dir: str,
    keys: list[str],
    measures: list[str],
    z_thresh: float = 4.0,
    min_rows: int = 30,
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    hist_cols: dict | None = None,
) -> DataFrame:
    """Distributional drift report for a delta batch against the
    persisted view's history — the OTHER half of the ingest gate:
    ``checks.expect`` rejects contract violations (nulls, domains,
    orphan keys); this flags a batch whose VALUES went sideways while
    every row individually passes (a sensor stuck at 0, a price feed
    that switched currency).

    Per (key, measure): z = |delta_mean − view_mean| / (view_std /
    √n_delta), the standard error of a mean of n_delta draws from the
    view's distribution. ``status``: ``drift`` (z > z_thresh with
    n_delta ≥ min_rows), ``new_key`` (no history), ``low_n`` (too few
    delta rows to call), else ``ok``. Requires a ``sumsq=True`` view
    (std must be derivable from state — refused otherwise).

    State-grain only: one key-grain aggregate over the delta, one
    |keys|-sized join against the served view. The base is never read.
    """
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta

    spark = delta.sparkSession
    meta_path, _ = _view_paths(view_dir)
    meta = read_meta(spark, meta_path).asDict()
    if not meta.get("sumsq"):
        raise ValueError(
            "matview_drift needs a view built with sumsq=True — the"
            " view's std is not derivable from its state"
        )
    _check_view(
        spark, view_dir, keys, measures, minmax, distinct_cols, lg_k,
        hist_cols, sumsq=True,
    )
    view = rollup_read(
        # served state, not the raw epochs: retractions already applied
        rollup_merge(
            [
                spark.read.parquet(_view_paths(view_dir)[1]).drop("__epoch")
            ],
            keys, measures, minmax, distinct_cols, hist_cols, sumsq=True,
        ).filter(F.col("n_rows") > 0),
        measures,
    )
    dstate = rollup_read(
        rollup_state(delta, keys, measures, minmax=False, sumsq=False),
        measures,
    )
    outs = []
    for m in measures:
        d = dstate.select(
            *keys,
            F.col(f"avg_{m}").alias("delta_mean"),
            F.col(f"cnt_{m}").alias("n_delta"),
            (
                1.0 - F.col(f"cnt_{m}").cast("double") / F.col("n_rows")
            ).alias("delta_nullrate"),
            F.col("n_rows").alias("n_delta_rows"),
        )
        v = view.select(
            *keys,
            F.col(f"avg_{m}").alias("view_mean"),
            F.col(f"std_{m}").alias("view_std"),
            (
                1.0 - F.col(f"cnt_{m}").cast("double") / F.col("n_rows")
            ).alias("view_nullrate"),
        )
        j = d.join(v, keys, "left")
        se = F.col("view_std") / F.sqrt(F.col("n_delta"))
        z = F.when(se > 0, F.abs(F.col("delta_mean") - F.col("view_mean")) / se)
        status = (
            F.when(F.col("view_mean").isNull(), F.lit("new_key"))
            .when(F.col("n_delta") < min_rows, F.lit("low_n"))
            .when(z > F.lit(float(z_thresh)), F.lit("drift"))
            .otherwise(F.lit("ok"))
        )
        outs.append(
            j.select(
                *keys,
                F.lit(m).alias("measure"),
                "view_mean",
                "view_std",
                "delta_mean",
                "n_delta",
                F.round(z, 4).alias("z"),
                status.alias("status"),
            )
        )
        # null-rate leg: a field silently going null passes every mean
        # test (nulls don't enter avg) — z-test the PROPORTION instead,
        # se = sqrt(p(1-p)/n) from the view's historical rate
        p = F.col("view_nullrate")
        se_p = F.sqrt(p * (1.0 - p) / F.col("n_delta_rows"))
        zp = F.when(
            se_p > 0,
            F.abs(F.col("delta_nullrate") - p) / se_p,
        ).otherwise(
            # view rate exactly 0 or 1: ANY deviation is drift-grade
            F.when(F.abs(F.col("delta_nullrate") - p) > 0, F.lit(float("inf")))
        )
        status_p = (
            F.when(p.isNull(), F.lit("new_key"))
            .when(F.col("n_delta_rows") < min_rows, F.lit("low_n"))
            .when(zp > F.lit(float(z_thresh)), F.lit("drift"))
            .otherwise(F.lit("ok"))
        )
        outs.append(
            j.select(
                *keys,
                F.lit(f"{m}__null_rate").alias("measure"),
                p.alias("view_mean"),
                F.lit(None).cast("double").alias("view_std"),
                F.col("delta_nullrate").alias("delta_mean"),
                F.col("n_delta_rows").alias("n_delta"),
                F.round(zp, 4).alias("z"),
                status_p.alias("status"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# --- incremental top-k (r13): the non-retractable family member ----------
#
# Exact top-k rows by a PER-ROW order column is mergeable (max-k of
# max-k's is max-k: any row in the global top-k is in its own state's
# top-k), so an incremental "top products per region" view needs only
# |keys|·k state per batch. It is deliberately NOT retractable — deleting
# a row that sat inside the top-k cannot be repaired from state alone
# (rank k+1 was never kept); a deletion-bearing source re-builds from the
# surviving epochs instead (the same honesty rule as the index
# tombstones: never silently wrong, only explicitly rebuilt).


def topk_state(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
) -> DataFrame:
    """Key-grain top-k state: one row per key carrying the k largest
    (order_col, payload...) structs, descending, ties broken by the
    payload columns ascending (fully deterministic). Plan: one window
    rank per key (shuffle on keys, k rows survive per key) + a bounded
    collect_list (≤ k elements by construction — never data-sized).

    NULL-order contract: rows with a NULL ``order_col`` are EXCLUDED
    from the state here (equivalent to ``WHERE order_col IS NOT NULL``
    before the window). Without the filter the two orderings diverge:
    the window's ``desc`` ranks NULLs last, but the state array sorts by
    the negated order column ascending, which puts NULL ``__no`` FIRST —
    so ``topk_read`` would hand rank 1 to rows the one-shot window ranks
    last. Excluding them keeps state ≡ one-shot on every input; a view
    that wants NULLs ranked must coalesce them to a sentinel first."""
    w = W.partitionBy(*keys).orderBy(
        F.desc(order_col), *[F.asc(c) for c in payload_cols]
    )
    ranked = (
        df.filter(F.col(order_col).isNotNull())
        .select(*keys, order_col, *payload_cols)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
    )
    # array order must equal the window's (order desc, payload ASC) —
    # a plain sort_array(desc) would flip the payload tie-break, so the
    # struct leads with the NEGATED order column and sorts ascending
    return ranked.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(order_col)).alias("__no"),
                    *payload_cols,
                    F.col(order_col).alias(order_col),
                )
            )
        ).alias("topk")
    )


def topk_merge(
    states: list[DataFrame],
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
) -> DataFrame:
    """Merge top-k states: union → explode (≤ k rows per key per state)
    → re-rank → re-collect. Cost scales with |keys|·k·n_states, never
    with the fact rows the states summarized; associative and
    commutative, so any merge tree gives the identical view."""
    if not states:
        raise ValueError("topk_merge needs at least one state")
    cols = keys + ["topk"]
    merged = states[0].select(*cols)
    for s in states[1:]:
        merged = merged.unionByName(s.select(*cols))
    rows = merged.select(*keys, F.explode("topk").alias("e")).select(
        *keys,
        F.col(f"e.{order_col}").alias(order_col),
        *[F.col(f"e.{c}").alias(c) for c in payload_cols],
    )
    return topk_state(rows, keys, order_col, payload_cols, k)


def topk_read(
    state: DataFrame,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """State → ranked rows (keys..., rk, order_col, payload...)."""
    rows = state.select(
        *keys, F.posexplode("topk").alias("__pos", "e")
    )
    return rows.select(
        *keys,
        (F.col("__pos") + 1).cast("int").alias("rk"),
        F.col(f"e.{order_col}").alias(order_col),
        *[F.col(f"e.{c}").alias(c) for c in payload_cols],
    )


@register(
    "q_matview_topk",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey ASC,
                        l_linenumber ASC
             ) AS rk
      FROM lineitem
    )
    SELECT l_returnflag AS l_returnflag, CAST(rk AS INT) AS rk,
           l_extendedprice AS l_extendedprice,
           l_orderkey AS l_orderkey, l_linenumber AS l_linenumber
    FROM ranked WHERE rk <= 5
    ORDER BY l_returnflag, rk
    """,
    tags=("matview", "topk", "incremental"),
    demoted=True,
)
def q_matview_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental top-k ≡ full recompute: lineitem split into three
    batches, each reduced to |keys|·k top-k state, merged, read out —
    hash-identical to the oracle's one-shot window over the whole table.
    The refresh path the oracle can't express: a new batch costs its own
    scan + a |keys|·k merge, never a base re-read."""
    li = load_table(spark, sf_dir, "lineitem")
    keys, oc = ["l_returnflag"], "l_extendedprice"
    payload = ["l_orderkey", "l_linenumber"]
    splits = [
        li.filter(F.col("l_orderkey") % 10 < 8),
        li.filter(F.col("l_orderkey") % 10 == 8),
        li.filter(F.col("l_orderkey") % 10 == 9),
    ]
    state = topk_merge(
        [topk_state(s, keys, oc, payload, k=5) for s in splits],
        keys, oc, payload, k=5,
    )
    return topk_read(state, keys, oc, payload).orderBy("l_returnflag", "rk")


# --- persisted top-k view (r13) -------------------------------------------


def _topk_fp(keys: list[str], order_col: str, payload_cols: list[str], k: int) -> int:
    import hashlib

    canon = "|".join([",".join(keys), order_col, ",".join(payload_cols), str(k)])
    return int.from_bytes(hashlib.sha256(canon.encode()).digest()[:4], "big") >> 4


def _check_topk_view(spark, view_dir, keys, order_col, payload_cols, k):
    from bayesiandatafusion_jl_spark.functions.index_meta import check_meta

    meta_path, _ = _view_paths(view_dir)
    check_meta(
        spark,
        meta_path,
        "a top-k state under a different (keys, order, payload, k) config"
        " would merge into garbage — rebuild the view or match its pin",
        config_fp=_topk_fp(keys, order_col, payload_cols, k),
    )


def write_topk_view(
    base: DataFrame,
    view_dir: str,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
) -> None:
    """Fresh persisted top-k view: |keys|·k state as the ``base`` epoch,
    config pinned, replay ledger reset — the ``write_matview``
    incarnation contract, for the non-retractable family member."""
    from bayesiandatafusion_jl_spark.functions.index_compact import reset_ledger
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        write_epoch,
        write_meta,
    )

    spark = base.sparkSession
    meta_path, state_path = _view_paths(view_dir)
    reset_ledger(spark, view_dir)
    write_epoch(
        topk_state(base, keys, order_col, payload_cols, k),
        state_path, "base", fresh=True,
    )
    write_meta(
        spark, meta_path, "overwrite",
        config_fp=_topk_fp(keys, order_col, payload_cols, k), k=int(k),
    )


def topk_view_append(
    delta: DataFrame,
    view_dir: str,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
    epoch: str,
) -> None:
    """Ingest one delta batch as its own |keys|·k epoch partition —
    replay-idempotent (dynamic epoch overwrite), config-pinned,
    folded-epoch-ledger-checked, exactly the ``matview_append``
    contract. NO retraction: a delete inside the top-k cannot be
    repaired from k rows of state (rank k+1 was never kept) — rebuild
    from the surviving data instead."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        guard_append,
        write_epoch,
    )

    spark = delta.sparkSession
    _check_topk_view(spark, view_dir, keys, order_col, payload_cols, k)
    guard_append(spark, view_dir, epoch, reserved=("base",))
    _, state_path = _view_paths(view_dir)
    write_epoch(
        topk_state(delta, keys, order_col, payload_cols, k),
        state_path, epoch, fresh=False,
    )


def read_topk_view(
    spark: SparkSession,
    view_dir: str,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
) -> DataFrame:
    """Serve the view: merge every epoch's |keys|·k state and read the
    ranked rows — |epochs|·|keys|·k rows of work, never a fact re-read."""
    _check_topk_view(spark, view_dir, keys, order_col, payload_cols, k)
    _, state_path = _view_paths(view_dir)
    state = spark.read.parquet(state_path).drop("__epoch")
    merged = topk_merge([state], keys, order_col, payload_cols, k)
    return topk_read(merged, keys, order_col, payload_cols)


def compact_topk_view(spark: SparkSession, view_dir: str, target_mb: int = 128) -> DataFrame:
    """Fold the view's epochs into one ``compact-<gen>`` epoch (ledger
    written before the swap; replays of folded epochs rejected) — pure
    state-row relabeling, since ``read_topk_view`` re-ranks on read."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        _stats_row,
        compact_epochs,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import begin_fold

    _, state_path = _view_paths(view_dir)
    new_epoch, _ = begin_fold(spark, view_dir, state_path)
    stats = compact_epochs(spark, state_path, new_epoch, target_mb=target_mb)
    return _stats_row(spark, [("state", *stats)])
