"""Aggregations (SURVEY §2.D).

The sampler's sufficient statistics are aggregations — Gram matrices
Σ v_j v_jᵀ and weighted sums Σ r_ij v_j per entity instance [paper:BPMF].
All hash aggregates here run partial (map-side) + final — one shuffle on
the group key, which is the minimal data motion for the semantics.

Float determinism: every double sum goes through decimal(38,6) (exact,
order-independent — see functions/exprs.py), so results are identical no
matter how many partial aggregates merge (32 local tasks or 100k cluster
tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dmean, dsum, sql_dmean, sql_dsum
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dmean('l_quantity')} AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("D1",),
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — hash group-by with multi-agg (TPC-H Q1 shape; per-entity
    sufficient-stats shape [paper:BPMF])."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        dmean("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total,
           {sql_dmean('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
    tags=("D2",),
    demoted=True,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — global aggregate, no grouping (the RMSE-readout shape [api])."""
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total"),
        dmean("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("D3",),
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — exact distinct aggregation (#distinct entities observed)."""
    return load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@register(
    "q_agg_approx_distinct",
    oracle=None,  # HLL sketch values are engine-specific → rows-only check
    tags=("D4",),
    demoted=True,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — approximate count-distinct (HLL++). At 100 TB this replaces the
    exact expand+two-phase distinct: one pass, constant memory per group."""
    return load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_agg_rollup_cube",
    oracle=f"""
    SELECT 'rollup' AS op, o_orderstatus AS g1, o_orderpriority AS g2,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS val
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'cube', l_returnflag, l_linestatus,
           COUNT(*), {sql_dsum('l_quantity')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("D5", "D6"),
)
def q_agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5+D6 consolidated (the ``q_set_ops`` pattern): rollup
    (hierarchical subtotals + grand total over orders) and cube (all
    grouping sets over lineitem) as op-tagged legs of one result. Each
    leg is one grouping-sets partial aggregate — keys shrink with the
    grouping, never grow with the data; the UNION ALL is shuffle-free.
    The single forms stay demoted with identical local parity gates."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rollup_leg = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("val"))
        .select(
            F.lit("rollup").alias("op"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "n",
            "val",
        )
    )
    cube_leg = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("val"))
        .select(
            F.lit("cube").alias("op"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "n",
            "val",
        )
    )
    return rollup_leg.unionByName(cube_leg)


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("D5",),
    demoted=True,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — rollup (hierarchical subtotals + grand total)."""
    return load_table(spark, sf_dir, "orders").rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("D6",),
    demoted=True,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — cube (all grouping sets)."""
    return load_table(spark, sf_dir, "lineitem").cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 40
    """,
    tags=("D7",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — post-aggregation filter (min-degree entity selection: entities
    with too few observations fall back to the prior [paper:Macau])."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 40)
    )


@register(
    "q_agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("D8",),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — pivot: long COO → wide matrix view (the dense-matrix export
    shape). Explicit value list so no extra distinct pass is needed."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )


@register(
    "q_agg_vector_sum",
    oracle="""
    SELECT label, pos,
           ROUND(SUM(CAST(v AS DOUBLE)), 4) AS s,
           COUNT(*) AS n,
           ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*), 6) AS c
    FROM (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ) t
    GROUP BY label, pos
    """,
    tags=("D9",),
)
def q_agg_vector_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — element-wise vector aggregate: Σ v per (label, position) — the
    factor-moment accumulation of the Normal–Wishart step [paper:BPMF].

    posexplode + groupBy(pos): fully JVM-side, partial-agg map-side. pos is
    1-based to match SQL ``generate_subscripts``. (The ML path uses a
    grouped-agg pandas UDF for the full Gram matrix; this is the pure-SQL
    moment form.)
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v")
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.sum("v"), 4).alias("s"),
        F.count(F.lit(1)).alias("n"),
        # r12: the J4 centroid readout rides the same aggregate (the
        # demoted q_llm_centroid keeps the standalone form)
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("c"),
    )


@register(
    "q_agg_approx_quantile",
    oracle=None,  # sketch values are engine-specific → rows-only check;
    # the measured rel_err column IS the quality gate (asserted in tests)
    tags=("D4", "sketch"),
    demoted=True,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna via ``percentile_approx``)
    vs the exact answer, with the measured relative error as an output
    column — the same honesty convention as the HLL ratio row in
    q_llm_scale_suite.

    At 100 TB the exact ``percentile`` is the non-starter (it buffers the
    full per-group value multiset); the GK sketch is one pass, bounded
    memory, mergeable across partitions (map-side partial agg). Here both
    run so the error is measured, exactly as a production pipeline would
    validate a sketch before trusting it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.5, 0.9, 0.99]
    agg = li.agg(
        F.percentile("l_extendedprice", qs).alias("exact"),
        F.percentile_approx("l_extendedprice", qs, 10_000).alias("approx"),
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qs]).alias("q"),
        F.col("exact").alias("exact"),
        F.col("approx").alias("approx"),
    )
    row = agg.select(F.explode(pairs).alias("r")).select(
        F.col("r.q").alias("q"),
        F.col("r.exact").alias("exact"),
        F.col("r.approx").cast("double").alias("approx"),
    )
    return row.select(
        "q",
        "exact",
        "approx",
        F.round(F.abs(F.col("approx") - F.col("exact")) / F.col("exact"), 6).alias(
            "rel_err"
        ),
    )


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact batch counts into a Misra-Gries summary of ≤ k counters
    (Agarwal et al. 2012 mergeable-summaries procedure: add, then subtract
    the (k+1)-th largest count from all and keep positives). Invariant
    (hypothesis-pinned in tests/test_properties.py): after any sequence of
    merges over a stream of total length n, every item with true frequency
    > n/(k+1) is present in the summary."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + c
    if len(counters) > k:
        thresh = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - thresh for key, c in counters.items() if c > thresh}
    return counters


def heavy_hitters(
    items: DataFrame, item_col: str, phi: float
) -> DataFrame:
    """EXACT frequency-threshold heavy hitters (all items with frequency
    ≥ phi·N) without ever shuffling the full item vocabulary — the classic
    two-pass Misra–Gries construction:

    1. **Candidate pass (map-only)**: each partition runs a Misra–Gries
       summary with k = ⌈1/phi⌉ counters over its local stream
       (``mapInPandas`` — per-partition imperative state is exactly what
       the sketch is; Arrow-batched, bounded k counters per partition).
       MG guarantees any item with LOCAL frequency > n_p/k survives its
       partition's summary; an item with GLOBAL frequency ≥ N/k must
       exceed n_p/k in at least one partition, so the union of partition
       summaries is a SUPERSET of the true heavy hitters — recall 1.0 by
       construction.
    2. **Verify pass (exact)**: the candidate set (≤ k·P ids, broadcast)
       semi-joins the stream; only candidate rows enter the count
       aggregate, so the shuffle is bounded by k·P distinct keys, not the
       vocabulary. False candidates are dropped by the exact ≥ phi·N
       filter — precision 1.0.

    Net: output identical to the full groupBy-count (SQL-oracle-able!),
    while the only full-data operations are two linear scans and one
    scalar count. At 100 TB with a trillion-term vocabulary, the full
    groupBy shuffles the vocabulary; this shuffles ⌈1/phi⌉·P keys.

    Returns (item_col, cnt, frac) sorted nowhere — order-insensitive.

    NULL items are EXCLUDED — from the candidates, the counts, and the
    total (pandas value_counts drops them and NULL doubles as the
    summary's total-marker row, so counting them would silently break the
    exactness contract; a SQL GROUP BY would instead count NULL as a
    group). Pre-fill a sentinel if NULL frequency matters.
    """
    if not (0 < phi <= 1):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    # undercount of a merged MG summary is ≤ n/(k+1) (Agarwal et al. 2012,
    # mergeable summaries), so k+1 > 1/phi keeps every true heavy hitter's
    # residual count positive; int()+1 gives that with margin
    k = max(2, int(1 / phi) + 1)

    import pandas as pd

    def mg(batches):
        # per-batch exact value_counts merged into the MG summary —
        # vectorized, never a per-token Python loop. The partition's row
        # count rides along as one extra (NULL item) row so the stream
        # total needs no separate counting pass.
        counters: dict = {}
        n_local = 0
        for pdf in batches:
            n_local += len(pdf)
            counters = _mg_merge(
                counters, {v: int(c) for v, c in pdf[item_col].value_counts().items()}, k
            )
        yield pd.DataFrame(
            {
                item_col: list(counters.keys()) + [None],
                "__n": [0] * len(counters) + [n_local],
            }
        )

    src = items.select(item_col).filter(F.col(item_col).isNotNull())
    item_type = src.schema[item_col].dataType.simpleString()
    # summary is tiny (≤ (k+1)·P rows) but feeds two consumers (candidate
    # set + total); checkpoint so the candidate PASS runs once
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    summary = checkpoint_df(
        src.mapInPandas(mg, schema=f"{item_col} {item_type}, __n long")
    )
    cands = summary.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    total = F.broadcast(summary.agg(F.sum("__n").alias("__total")))
    counted = (
        src.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") >= phi * F.col("__total"))
    )
    return counted.select(
        item_col,
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(F.col("cnt") / F.col("__total"), 6).alias("frac"),
    )


_HH_PHI = 0.002


@register(
    "q_agg_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(string_split(LOWER(text), ' ')) AS token FROM documents
    ),
    n AS (SELECT COUNT(*) AS total FROM tok)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(COUNT(*) / (SELECT CAST(total AS DOUBLE) FROM n), 6) AS frac
    FROM tok GROUP BY token
    HAVING COUNT(*) >= {_HH_PHI} * (SELECT total FROM n)
    """,
    tags=("D4", "sketch", "J5"),
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens occupying ≥ 0.2% of the corpus token stream, via the
    Misra-Gries candidate pass + exact verify. Output is EXACTLY the full
    groupBy-count answer (the oracle), but the plan never shuffles the
    vocabulary — the scale story is the plan, not an approximation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    return heavy_hitters(toks, "token", _HH_PHI)


def _cms_dims(eps: float, delta: float) -> tuple[int, int]:
    """Count-min sketch dimensions (Cormode & Muthukrishnan 2005): width
    w = ⌈e/ε⌉ columns, depth d = ⌈ln(1/δ)⌉ rows give, for every item,
    estimate ∈ [true, true + ε·N] with probability ≥ 1−δ."""
    import math

    if not (0 < eps < 1):
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if not (0 < delta < 1):
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    return math.ceil(math.e / eps), math.ceil(math.log(1 / delta))


def _cms_cells(item_col: str, w: int, d: int):
    """The d (row, col) cell coordinates of an item: row i's hash is
    xxhash64 seeded by i — d pairwise-independent-enough hash functions
    from the one JVM-side hash family, zero Python in the path.

    The item is hashed AS ITS STRING FORM: xxhash64 is type-sensitive
    (an INT 5 and a BIGINT 5 hash differently), and sketch and estimate
    are separate calls over frames whose column types the caller may
    not have aligned — hashing the canonical string makes est ≥ true
    hold whenever the VALUES agree, which is the contract a frequency
    sketch is trusted for."""
    item = F.col(item_col).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(F.xxhash64(F.lit(i), item), F.lit(w)).alias("c"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(
    items: DataFrame, item_col: str, eps: float = 1e-3, delta: float = 0.01
) -> DataFrame:
    """Count-min frequency sketch as a SPARSE DataFrame (r, c, cnt) —
    zero-count cells omitted.

    Spark-first construction — no UDF, no per-partition state: each item
    emits its d cells (array of structs + one explode, whole-stage
    codegen), and ``groupBy(r, c).count()`` IS the sketch. Map-side
    partial aggregation means each task ships at most d·w cells no matter
    how many rows it scanned, and the final shuffle moves ≤ d·w distinct
    keys — the sketch's mergeability is exactly Spark's partial-agg
    contract, so at 100 TB the data motion is the sketch size, not the
    stream. The result is deterministic (xxhash64 is seeded, counts are
    exact integers), so unlike a sampled sketch it needs no checkpoint.

    Any single row r sums to N (the stream length) — total count rides in
    the sketch for free. NULL items are excluded, same contract as
    ``heavy_hitters``.

    d·w rows bound the sketch: eps=1e-3, delta=0.01 → 5×2719 ≈ 13.6k
    cells regardless of corpus size.
    """
    w, d = _cms_dims(eps, delta)
    cells = (
        items.filter(F.col(item_col).isNotNull())
        .select(F.explode(_cms_cells(item_col, w, d)).alias("cell"))
        .select("cell.r", "cell.c")
    )
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    eps: float = 1e-3,
    delta: float = 0.01,
) -> DataFrame:
    """Point-query frequency estimates: est(x) = min over the item's d
    cells (missing sparse cell = 0). Overestimate-only by construction —
    est ≥ true always; est ≤ true + ε·N w.p. ≥ 1−δ.

    Pass the SAME (eps, delta) the sketch was built with — the hash
    family is derived from them. The query side explodes to d rows per
    query and joins the sketch on (r, c); the sketch's post-agg size
    (≤ d·w) is known to AQE, which broadcasts it for any practical ε, so
    an arbitrarily large query batch never shuffles.

    Returns (item_col, est).
    """
    w, d = _cms_dims(eps, delta)
    qcells = (
        queries.filter(F.col(item_col).isNotNull())
        .select(item_col, F.explode(_cms_cells(item_col, w, d)).alias("cell"))
        .select(item_col, "cell.r", "cell.c")
    )
    joined = qcells.join(F.broadcast(sketch), ["r", "c"], "left").select(
        item_col, F.coalesce("cnt", F.lit(0)).alias("cell_cnt")
    )
    return joined.groupBy(item_col).agg(
        F.min("cell_cnt").cast("bigint").alias("est")
    )


_CMS_EPS, _CMS_DELTA = 1e-3, 0.01


@register(
    "q_agg_cms",
    oracle=None,  # cell layout is xxhash64-specific → rows-only check; the
    # overestimate-only invariant and the ε·N bound are pytest-gated, and
    # the measured overcount is an output column (same honesty convention
    # as q_agg_approx_quantile's rel_err)
    tags=("D4", "sketch", "J5"),
    demoted=True,
)
def q_agg_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the documents token stream, validated against
    the exact counts of the 20 most frequent tokens: (token, exact, est,
    overcount, within_bound). At 100 TB the exact groupBy shuffles the
    vocabulary; the sketch ships ≤ d·w cells per task and answers any
    point query — the trade this query measures instead of assuming."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    sketch = cms_sketch(toks, "token", _CMS_EPS, _CMS_DELTA)
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    # sketch feeds the estimate join AND the N readout; one materialization
    sketch = checkpoint_df(sketch)
    n_total = F.broadcast(
        sketch.filter(F.col("r") == 0).agg(F.sum("cnt").alias("__n"))
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), F.asc("token"))
        .limit(20)
    )
    est = cms_estimate(sketch, top.select("token"), "token", _CMS_EPS, _CMS_DELTA)
    return (
        top.join(est, "token")
        .crossJoin(n_total)
        .select(
            "token",
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("overcount"),
            (F.col("est") - F.col("exact") <= _CMS_EPS * F.col("__n")).alias(
                "within_bound"
            ),
        )
        .orderBy(F.desc("exact"), F.asc("token"))
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    clamp: bool = True,
) -> DataFrame:
    """Equi-width histogram: (bucket, lo_edge, hi_edge, cnt) with EVERY
    bucket present (empty ones emit cnt=0 — a histogram with silent holes
    misleads every consumer that plots or diffs it).

    Map-side bucket arithmetic (``floor((x-lo)/width)``, clamped to the
    edge buckets so out-of-range values land in the first/last bin rather
    than vanishing) + ONE groupBy over exactly n_buckets keys; the
    dense-bucket completion is a broadcast join against a generated
    ``spark.range(n_buckets)`` — nothing here scales with the data except
    the single linear scan. Deterministic: the bucket id is one IEEE
    double subtract/divide/floor, reproducible across engines (the SQL
    oracle runs the same arithmetic). NULLs are excluded (no value, no
    bucket); ``clamp=False`` drops out-of-range rows instead.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_buckets
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("bigint")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    # NaN passes isNotNull but has no bucket — excluded like NULL (the
    # clamp path would otherwise silently fold NaN rows into bucket 0
    # while the drop path rejects them: two modes disagreeing about NaN
    # beyond their documented difference)
    src = df.filter(x.isNotNull() & ~F.isnan(x))
    if not clamp:
        src = src.filter((x >= lo) & (x < hi))
    counts = src.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spark = df.sparkSession
    all_b = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        all_b.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi_edge"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("bucket")
    )


_HIST_LO, _HIST_HI, _HIST_N = 0.0, 110_000.0, 22


@register(
    "q_agg_histogram",
    oracle=f"""
        WITH counts AS (
            SELECT LEAST(GREATEST(CAST(FLOOR((l_extendedprice - {_HIST_LO})
                         / {(_HIST_HI - _HIST_LO) / _HIST_N}) AS BIGINT), 0),
                         {_HIST_N - 1}) AS bucket,
                   COUNT(*) AS cnt
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
            GROUP BY 1
        )
        SELECT g.bucket AS bucket,
               {_HIST_LO} + g.bucket * {(_HIST_HI - _HIST_LO) / _HIST_N} AS lo_edge,
               {_HIST_LO} + (g.bucket + 1) * {(_HIST_HI - _HIST_LO) / _HIST_N} AS hi_edge,
               COALESCE(c.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(0, {_HIST_N - 1})) AS bucket) g
        LEFT JOIN counts c ON g.bucket = c.bucket
        ORDER BY bucket
    """,
    tags=("D1", "histogram", "olap"),
    demoted=True,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 (OLAP profile form) — 22-bin equi-width histogram of
    l_extendedprice with dense (zero-filled) buckets; full DuckDB oracle
    running the identical IEEE bucket arithmetic. One linear scan +
    a groupBy over 22 keys — the data-profiling primitive."""
    li = load_table(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice", _HIST_LO, _HIST_HI, _HIST_N)


def profile_numeric(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """ONE-scan numeric profile: per column (col_name, n_rows, n_nulls,
    n_distinct, min_v, max_v, mean_v) — the pre-training data audit every
    pipeline runs before trusting a new table drop.

    All metrics for all columns ride ONE aggregation over ONE scan (a
    wide single-row agg unpivoted with ``stack``); the only multi-pass
    cost is the exact ``countDistinct``, which Spark plans as an Expand
    (the scan's rows duplicated once per column inside the exchange —
    still one SCAN). ``approx_distinct=True`` is the 100 TB form (r12):
    ``approx_count_distinct`` (HLL++, ±~2%) replaces the Expand with a
    plain partial-agg — no row duplication, one narrow sketch per
    column crosses the exchange. The column list, not the data, bounds
    the output. Mean uses the exact decimal accumulation (exprs.dmean)
    so the numbers are engine-reproducible.
    """
    if not cols:
        raise ValueError("profile_numeric needs at least one column")
    from bayesiandatafusion_jl_spark.functions.exprs import dmean

    nd = F.approx_count_distinct if approx_distinct else F.countDistinct
    n_all = F.count(F.lit(1))
    aggs = [n_all.alias("__n")]
    for c in cols:
        x = F.col(c)
        aggs += [
            F.sum(x.isNull().cast("bigint")).alias(f"__null_{c}"),
            nd(x).alias(f"__nd_{c}"),
            F.min(x).cast("double").alias(f"__min_{c}"),
            F.max(x).cast("double").alias(f"__max_{c}"),
            dmean(x).alias(f"__mean_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}, __mean_{c}"
        for c in cols
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args})"
        " as (col_name, n_nulls, n_distinct, min_v, max_v, mean_v)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v", "mean_v"
    ).orderBy("col_name")


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q_profile_numeric",
    oracle=f"""
        WITH wide AS (
            SELECT COUNT(*) AS n_rows,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c},"
                       f" COUNT(DISTINCT {c}) AS nd_{c},"
                       f" CAST(MIN({c}) AS DOUBLE) AS min_{c},"
                       f" CAST(MAX({c}) AS DOUBLE) AS max_{c},"
                       f" CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
                       f" / COUNT({c}) AS mean_{c}"
                       for c in _PROFILE_COLS
                   )}
            FROM lineitem
        )
        SELECT u.col_name AS col_name, w.n_rows AS n_rows,
               u.n_nulls AS n_nulls, u.n_distinct AS n_distinct,
               u.min_v AS min_v, u.max_v AS max_v, u.mean_v AS mean_v
        FROM wide w, LATERAL (
            {" UNION ALL ".join(
                f"SELECT '{c}' AS col_name, null_{c} AS n_nulls,"
                f" nd_{c} AS n_distinct, min_{c} AS min_v,"
                f" max_{c} AS max_v, mean_{c} AS mean_v"
                for c in _PROFILE_COLS
            )}
        ) u
        ORDER BY col_name
    """,
    tags=("D2", "profile", "olap"),
    demoted=True,
)
def q_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (profile form) — one-scan numeric audit of the four lineitem
    measure columns; full DuckDB oracle (identical decimal-exact means)."""
    li = load_table(spark, sf_dir, "lineitem")
    return profile_numeric(li, _PROFILE_COLS)


def profile_histograms(
    df: DataFrame, cols: list[str], n_buckets: int = 20
) -> DataFrame:
    """Per-column equi-width histograms with PROFILED bounds — the
    composition the "audit a new table drop" workflow actually runs
    (``histogram`` alone needs caller-supplied lo/hi per column):
    (col_name, bucket, lo_edge, hi_edge, cnt) with every bucket present
    per column (zero-filled — same no-silent-holes rule as
    ``histogram``).

    Exactly TWO linear scans regardless of |cols|: one min/max agg for
    all columns together (a bounded 1-row collect — the bounds must
    reach the driver to become bucket literals), then one counting scan
    where each row emits an array of (col, bucket) structs that explode
    into a groupBy over |cols|·n_buckets keys (map-side partial agg —
    the shuffle carries only the key grid, never the data). The dense
    completion is a driver-built |cols|·n_buckets grid frame carrying
    each column's (lo, width), so edges need no second lookup.

    NULL/NaN values are excluded per column (no value, no bucket); an
    all-NULL/NaN column raises by name (``profile_numeric`` is the tool
    that reports null counts). A constant column widens its range to
    [v, v+1) so every row lands in bucket 0 instead of dividing by zero.
    """
    if not cols:
        raise ValueError("profile_histograms needs at least one column")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession

    def _clean(c: str):
        x = F.col(c).cast("double")
        return F.when(~F.isnan(x), x)

    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(_clean(c)).alias(f"__lo_{c}"),
                F.max(_clean(c)).alias(f"__hi_{c}"),
            )
        ]
    ).collect()[0]
    meta: dict[str, tuple[float, float]] = {}
    for c in cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        if lo is None:
            raise ValueError(
                f"column {c!r} is entirely NULL/NaN — no distribution to"
                " profile; exclude it (profile_numeric reports null counts)"
            )
        if not hi > lo:
            hi = lo + 1.0  # constant column: single-point distribution
        meta[c] = (float(lo), (float(hi) - float(lo)) / n_buckets)

    entries = []
    for c in cols:
        x = F.col(c).cast("double")
        lo, width = meta[c]
        raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("bigint")
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
        entries.append(
            F.when(
                x.isNotNull() & ~F.isnan(x),
                F.struct(F.lit(c).alias("col_name"), b.alias("bucket")),
            )
        )
    counts = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .filter(F.col("e").isNotNull())
        .select("e.col_name", "e.bucket")
        .groupBy("col_name", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = spark.createDataFrame(
        [
            (c, b, meta[c][0], meta[c][1])
            for c in cols
            for b in range(n_buckets)
        ],
        "col_name string, bucket bigint, __lo double, __width double",
    )
    return (
        grid.join(F.broadcast(counts), ["col_name", "bucket"], "left")
        .select(
            "col_name",
            "bucket",
            (F.col("__lo") + F.col("bucket") * F.col("__width")).alias(
                "lo_edge"
            ),
            (F.col("__lo") + (F.col("bucket") + 1) * F.col("__width")).alias(
                "hi_edge"
            ),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("col_name", "bucket")
    )


_PH_COLS = ["l_discount", "l_quantity"]
_PH_N = 10


def _ph_oracle() -> str:
    counts = " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               LEAST(GREATEST(CAST(FLOOR((CAST({c} AS DOUBLE) - b.lo_{c})
                     / ((b.hi_{c} - b.lo_{c}) / {_PH_N})) AS BIGINT), 0),
                     {_PH_N - 1}) AS bucket,
               COUNT(*) AS cnt
        FROM lineitem, bounds b
        WHERE {c} IS NOT NULL AND NOT isnan(CAST({c} AS DOUBLE))
        GROUP BY 1, 2"""
        for c in _PH_COLS
    )
    lo = " ".join(
        f"WHEN '{c}' THEN b.lo_{c} + g.bucket * ((b.hi_{c} - b.lo_{c}) / {_PH_N})"
        for c in _PH_COLS
    )
    hi = " ".join(
        f"WHEN '{c}' THEN b.lo_{c} + (g.bucket + 1) * ((b.hi_{c} - b.lo_{c}) / {_PH_N})"
        for c in _PH_COLS
    )
    vals = ", ".join(f"('{c}')" for c in _PH_COLS)
    bounds_cols = ", ".join(
        f"CAST(MIN(CASE WHEN NOT isnan(CAST({c} AS DOUBLE))"
        f" THEN CAST({c} AS DOUBLE) END) AS DOUBLE) AS lo_{c},"
        f" CAST(MAX(CASE WHEN NOT isnan(CAST({c} AS DOUBLE))"
        f" THEN CAST({c} AS DOUBLE) END) AS DOUBLE) AS hi_{c}"
        for c in _PH_COLS
    )
    return f"""
        WITH bounds AS (SELECT {bounds_cols} FROM lineitem),
        counts AS ({counts}),
        grid AS (
            SELECT c.col_name, g.bucket
            FROM (VALUES {vals}) c(col_name),
                 (SELECT unnest(generate_series(0, {_PH_N - 1})) AS bucket) g
        )
        SELECT g.col_name AS col_name, g.bucket AS bucket,
               CASE g.col_name {lo} END AS lo_edge,
               CASE g.col_name {hi} END AS hi_edge,
               COALESCE(cn.cnt, 0) AS cnt
        FROM grid g
        CROSS JOIN bounds b
        LEFT JOIN counts cn
          ON g.col_name = cn.col_name AND g.bucket = cn.bucket
        ORDER BY col_name, bucket
    """


@register(
    "q_profile_histograms",
    oracle=_ph_oracle(),
    tags=("D1", "D2", "profile", "histogram", "olap"),
    demoted=True,
)
def q_profile_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile→histogram composition (r12, closing the two-op gap): the
    per-column bounds come from the data itself (one min/max scan), then
    ONE more scan yields dense 10-bin histograms for every column —
    identical IEEE bucket arithmetic replicated in the DuckDB oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return profile_histograms(li, _PH_COLS, _PH_N)
