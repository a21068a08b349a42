"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is rarely consumed whole: experiments run on reproducible
subsets ("the same 1% every time, on any cluster, at any partitioning"),
and dataset mixes are built by stratified quotas ("exactly N documents per
source/language"). Spark's built-in ``df.sample`` / ``sampleBy`` are
seeded per-partition, so their output changes with the physical split —
useless as a contract. These operators hash the ROW IDENTITY instead,
with pure int64 arithmetic that any engine reproduces (same convention as
ml/relation.py's ``split_train_test`` — sampling and train/test splitting
are the same primitive with a different quota rule):

- ``hash_sample`` — Bernoulli(p) by hash bucket: map-only, zero shuffle,
  zero state; composes with any downstream plan and prunes at the scan
  when the id columns are all that's read.
- ``stratified_fixed_n`` — EXACTLY n rows per stratum, smallest hash
  first: one shuffle on the strata key; the per-stratum sort is a top-n
  (rank ≤ n never materializes a full sort at the executor — Spark's
  window TopN pushdown keeps a bounded heap per stratum). For pathological
  mega-strata, pre-filter with ``hash_sample`` at a safe over-sampling
  rate first, then take the exact n — the two-phase trick keeps the heap
  bounds tight.

Both are driver-oracle-checkable (registered below): the hash is plain
``(Σ id_k · P^k) mod M`` so DuckDB computes bit-identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

# Mixing runs mod a ~1e6 PRIME, and only the final reduction lands in
# [0, MOD): pre-mod'ing ids by MOD itself (the split-hash shortcut in
# ml/queries.py, which only needs 10 coarse buckets) would make the bucket
# a function of the id's LAST FOUR DECIMAL DIGITS — sharded/type-coded ids
# whose low digits are constant would then co-sample all-or-nothing. With
# the prime stage, ids agreeing mod 10⁴ spread over ~5k distinct buckets
# (measured), and every intermediate stays < 1e12 ≪ 2⁶³ under ANSI
# arithmetic for arbitrary 63-bit ids. Deliberately NOT unified with
# split_train_test's hash: that one is seeded (needs a degenerate-base
# guard) and coarse; this one is fixed-constant and fine-grained.
_PRIME, _MULT, _MOD = 999_983, 736_787, 10_000


def _bucket(id_cols: list[str]) -> F.Column:
    """Deterministic bucket in [0, _MOD): partition-independent, engine-
    independent (plain int64 arithmetic any engine reproduces)."""
    mix = F.lit(0).cast("long")
    for k, c in enumerate(id_cols):
        p = pow(_MULT, k + 1, _PRIME)
        mix = mix + F.pmod(F.col(c).cast("long"), F.lit(_PRIME)) * F.lit(p)
    return F.pmod(F.pmod(mix, F.lit(_PRIME).cast("long")), F.lit(_MOD).cast("long"))


def _sql_bucket(id_cols: list[str]) -> str:
    terms = " + ".join(
        f"((({c} % {_PRIME}) + {_PRIME}) % {_PRIME} * {pow(_MULT, k + 1, _PRIME)})"
        for k, c in enumerate(id_cols)
    )
    return f"(((({terms}) % {_PRIME}) + {_PRIME}) % {_PRIME}) % {_MOD}"


def hash_sample(df: DataFrame, id_cols: list[str], frac: float) -> DataFrame:
    """Deterministic Bernoulli(frac) sample keyed on row identity.

    Map-only (one filter expression, no shuffle, no RNG state); the same
    rows are selected on any cluster at any partitioning, and samples at
    different rates NEST (frac 0.01 ⊂ frac 0.1), which is what experiment
    ladders need."""
    return df.filter(_bucket(id_cols) < int(frac * _MOD))


def stratified_fixed_n(
    df: DataFrame, strata_cols: list[str], id_cols: list[str], n: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, smallest hash first.

    One shuffle on the strata key; ``row_number ≤ n`` compiles to a
    bounded per-stratum top-n. Deterministic total order: the id columns
    break hash ties."""
    w = W.partitionBy(*strata_cols).orderBy(
        _bucket(id_cols).asc(), *[F.col(c).asc() for c in id_cols]
    )
    # uniquified temp name: a caller frame already carrying __rn must not
    # have its column silently overwritten and dropped
    rn = "__rn"
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n)
        .drop(rn)
    )


@register(
    "q_sample_bernoulli",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    WHERE {_sql_bucket(['l_orderkey', 'l_linenumber'])} < 2000
    """,
    tags=("sampling",),
    demoted=True,
)
def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% Bernoulli sample of lineitem keyed on
    (l_orderkey, l_linenumber) — partition-independent, oracle-identical.
    Demoted: the driver surface is capped at 50; the same hash arithmetic
    is driver-checked via q_ml_traintest_split (I1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return hash_sample(li, ["l_orderkey", "l_linenumber"], 0.2).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT c_custkey, c_nationkey, c_mktsegment
    FROM (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY {_sql_bucket(['c_custkey'])}, c_custkey
             ) AS rn
      FROM customer
    )
    WHERE rn <= 20
    """,
    tags=("sampling",),
    demoted=True,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 customers per nation, smallest identity-hash first —
    the quota-per-stratum dataset-mix primitive. Demoted: see
    q_sample_bernoulli."""
    c = load_table(spark, sf_dir, "customer")
    return stratified_fixed_n(c, ["c_nationkey"], ["c_custkey"], 20).select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )


def mixture_sample(
    df: DataFrame,
    id_cols: list[str],
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli rates — the dataset-MIXING
    primitive: "80% of wiki, 50% of books, 5% of web" as one map-only
    filter. Same identity-hash contract as ``hash_sample`` (partition-
    independent, engine-reproducible, and rate-NESTED per stratum: a
    stratum's 0.25 sample is a subset of its 0.5 sample), so re-weighting
    a mixture never churns the rows kept at lower rates.

    The rate lookup compiles to a literal CASE over the stratum column —
    zero joins, zero shuffles, prunes to a scan-level filter."""
    thresholds = {k: int(r * _MOD) for k, r in rates.items()}
    thr: F.Column = F.lit(int(default_rate * _MOD))
    for k in sorted(thresholds):
        thr = F.when(F.col(strata_col) == k, F.lit(thresholds[k])).otherwise(thr)
    return df.filter(_bucket(id_cols) < thr)


_MIX_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.05
_MIX_CASE = " ".join(
    f"WHEN source = '{k}' THEN {int(r * _MOD)}" for k, r in sorted(_MIX_RATES.items())
)


@register(
    "q_sample_mixture",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_sql_bucket(['doc_id'])} <
          (CASE {_MIX_CASE} ELSE {int(_MIX_DEFAULT * _MOD)} END)
    """,
    tags=("sampling",),
    demoted=True,
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture: per-source sampling rates over documents
    (src0 80%, src1 50%, src2 25%, everything else 5%) as one
    deterministic map-only filter. Demoted: see q_sample_bernoulli."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs, ["doc_id"], "source", _MIX_RATES, _MIX_DEFAULT
    ).select("doc_id", "source")


# --- deterministic training-shard shuffle ----------------------------------


def _shuffle_pos(id_cols: list[str], seed: int) -> F.Column:
    """Seeded pseudo-random position in [0, _PRIME): the _bucket mix plus
    the seed folded in as one extra virtual column term, reduced mod the
    PRIME only (fine grain — ~1e6 distinct positions, vs _bucket's 1e4
    display buckets)."""
    mix = F.lit(((seed % _PRIME) + 1) * pow(_MULT, len(id_cols) + 1, _PRIME)).cast(
        "long"
    )
    for k, c in enumerate(id_cols):
        p = pow(_MULT, k + 1, _PRIME)
        mix = mix + F.pmod(F.col(c).cast("long"), F.lit(_PRIME)) * F.lit(p)
    return F.pmod(mix, F.lit(_PRIME).cast("long"))


def _sql_shuffle_pos(id_cols: list[str], seed: int) -> str:
    terms = " + ".join(
        f"((({c} % {_PRIME}) + {_PRIME}) % {_PRIME} * {pow(_MULT, k + 1, _PRIME)})"
        for k, c in enumerate(id_cols)
    )
    const = ((seed % _PRIME) + 1) * pow(_MULT, len(id_cols) + 1, _PRIME)
    return f"((({const} + {terms}) % {_PRIME}) + {_PRIME}) % {_PRIME}"


def shuffle_shards(
    df: DataFrame, id_cols: list[str], n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle for training-data serving: every row
    gets a pseudo-random ``pos`` (seeded identity hash, [0, ~1e6)) and a
    ``shard`` = pos mod n_shards.

    The trainer's "shuffle the corpus, split into shards, read each shard
    in order" step WITHOUT a global sort-by-rand(): assignment is map-only
    (no shuffle, no RNG state, partition-independent), reproducible across
    reruns/engines from (id_cols, seed) alone, and re-seeding is a new
    epoch-order permutation at zero storage cost. Within-shard ordering by
    (pos, id_cols) is deterministic; pos collisions (~birthday at 1e6)
    only tie-break, never bias. ``write_shuffled_shards``
    (sources/io.py) persists the layout one file per shard."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    pos = _shuffle_pos(id_cols, seed)
    return df.withColumn("pos", pos).withColumn(
        "shard", F.pmod(F.col("pos"), F.lit(n_shards)).cast("int")
    )


_SHUF_N, _SHUF_SEED = 8, 42


@register(
    "q_shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           CAST({_sql_shuffle_pos(['doc_id'], _SHUF_SEED)} AS BIGINT) AS pos,
           CAST(({_sql_shuffle_pos(['doc_id'], _SHUF_SEED)}) % {_SHUF_N} AS INT)
             AS shard
    FROM documents
    """,
    tags=("sampling", "serving"),
    demoted=True,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-deterministic corpus shuffle: documents → (pos, shard) under
    seed 42 / 8 shards (see ``shuffle_shards``). Demoted: see
    q_sample_bernoulli."""
    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, ["doc_id"], _SHUF_N, _SHUF_SEED).select(
        "doc_id", "pos", "shard"
    )


def weighted_sample_k(
    df: DataFrame,
    id_cols: list[str],
    weight_col: str,
    k: int,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Exactly min(k, eligible) rows drawn WITHOUT replacement with
    probability proportional to weight — the Efraimidis–Spirakis A-ES
    reservoir scheme (Inf. Proc. Letters 2006), derandomized: each row's
    uniform draw is the identity-hash ``_bucket`` (u = (bucket+0.5)/MOD),
    its sort key is u^(1/w), and the k largest keys win. One expression
    per row plus ONE global sort-limit (TakeOrdered — never a full sort)
    or, with ``strata_cols``, a per-stratum window top-k: the standard
    map-reduce shape for weighted data selection (e.g. picking k
    documents proportional to a quality score).

    Deterministic, partition-independent, engine-reproducible — the same
    properties as every sampler in this module, and what makes the op
    fully SQL-oracle-able. Rows with NULL or non-positive weight are
    EXCLUDED (a zero-weight row has selection probability zero; a
    negative weight is meaningless in A-ES). Ties (astronomically rare —
    keys differ in the 10th+ digit) break toward the smaller ids for a
    total order.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (_bucket(id_cols).cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
    )
    if strata_cols:
        w = W.partitionBy(*strata_cols).orderBy(
            key.desc(), *[F.col(c).asc() for c in id_cols]
        )
        rn = "__rn"
        while rn in df.columns:
            rn += "_"
        return (
            eligible.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= k)
            .drop(rn)
        )
    return eligible.orderBy(
        key.desc(), *[F.col(c).asc() for c in id_cols]
    ).limit(k)


_WSAMPLE_K = 50


@register(
    "q_sample_weighted",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ORDER BY POWER(({_sql_bucket(['o_orderkey'])} + 0.5) / {_MOD}.0,
                   1.0 / o_totalprice) DESC,
             o_orderkey ASC
    LIMIT {_WSAMPLE_K}
    """,
    tags=("sampling", "weighted"),
    demoted=True,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sample: 50 orders drawn proportional to
    o_totalprice, derandomized via the identity-hash uniform — the
    quality-weighted data-selection primitive (DSIR-style pipelines
    sample training docs by importance weight with exactly this shape).
    Full oracle: the same key formula in SQL selects the same rows.
    Demoted: see q_sample_bernoulli."""
    o = load_table(spark, sf_dir, "orders")
    return weighted_sample_k(o, ["o_orderkey"], "o_totalprice", _WSAMPLE_K).select(
        "o_orderkey", "o_totalprice"
    )


def token_budget_sample(
    df: DataFrame,
    budget: int | dict,
    len_col: str,
    id_cols: list[str],
    by: list[str] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Fill a TOKEN budget (not a row count) per group: rows enter in
    the deterministic identity-hash order (``_bucket`` — the same
    partition- and engine-independent contract as ``hash_sample``) and
    are kept while the group's inclusive running token total stays
    ≤ ``budget``. The selection a mixture recipe actually specifies —
    "200B tokens of web, 30B of code" — where doc-count sampling
    over-represents short documents.

    Scale shape: the naive form is one window per group, which ships an
    ENTIRE source to one task. This uses the ``pack_sequences`` two-phase
    prefix scan instead, generalized by the group key: range-partition on
    (group, hash-order), pid-local running sums, one bounded
    (pid × group) totals collect, exclusive group prefixes rejoined by
    broadcast. Exact and bit-identical at any partition count; no task
    ever sees more than its range slice.

    Keeps hash_sample's nesting property per group (a smaller budget's
    selection ⊂ a larger one's) because the order is budget-independent.

    ``budget`` may be a dict keyed by the group value (single ``by``
    column) or by a tuple of group values (multi-column ``by``) — the
    literal shape of a mixture recipe ("200B of web, 30B of code");
    groups absent from the dict contribute NOTHING (budget 0), which is
    the recipe semantics (an unlisted source is not in the mixture).
    """
    from bayesiandatafusion_jl_spark.session import (
        checkpoint_df,
        shuffle_partitions,
    )

    sess = df.sparkSession
    grp = list(by or [])
    if isinstance(budget, dict):
        if not grp:
            raise ValueError("a budget dict needs `by` group columns")
        if any(int(v) < 0 for v in budget.values()):
            raise ValueError(f"budgets must be >= 0, got {budget}")
    elif budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if n_partitions is None:
        n_partitions = shuffle_partitions(sess)
    staged = df.select("*", _bucket(id_cols).alias("__ord")).repartitionByRange(
        n_partitions, *grp, F.col("__ord"), *[F.col(c) for c in id_cols]
    )
    # materialize ONCE: the totals collect and the returned plan must
    # read the same sampled range boundaries (pack_sequences discipline)
    pid = checkpoint_df(staged.withColumn("__pid", F.spark_partition_id()))
    w = (
        W.partitionBy("__pid", *grp)
        .orderBy(F.col("__ord").asc(), *[F.col(c).asc() for c in id_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = pid.withColumn(
        "__cum_local", F.sum(F.col(len_col)).over(w).cast("long")
    )
    # bounded collect: n_partitions × |groups| rows (mixture sources are
    # few by construction)
    totals = (
        pid.groupBy("__pid", *grp)
        .agg(F.sum(F.col(len_col)).cast("long").alias("t"))
        .collect()
    )
    prefix_rows = []
    acc: dict = {}
    for r in sorted(totals, key=lambda r: (tuple(str(r[g]) for g in grp), r["__pid"])):
        key = tuple(r[g] for g in grp)
        prefix_rows.append((*key, r["__pid"], acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + r["t"]
    schema_parts = [f"{g} {dict(df.dtypes)[g]}" for g in grp]
    offsets = sess.createDataFrame(
        prefix_rows, ", ".join(schema_parts + ["__pid int", "__prefix long"])
    )
    if isinstance(budget, dict):
        rows = [
            ((k,) if len(grp) == 1 else tuple(k)) + (int(v),)
            for k, v in budget.items()
        ]
        budgets = sess.createDataFrame(
            rows, ", ".join([f"{g} {dict(df.dtypes)[g]}" for g in grp])
            + ", __budget long",
        )
        # inner join: unlisted groups get no budget and drop out
        local = local.join(F.broadcast(budgets), grp)
        cap = F.col("__budget")
    else:
        cap = F.lit(int(budget))
    return (
        local.join(F.broadcast(offsets), ["__pid", *grp])
        .filter(F.col("__prefix") + F.col("__cum_local") <= cap)
        .drop("__ord", "__pid", "__cum_local", "__prefix", "__budget")
    )


@register(
    "q_llm_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             doc_id % 3 AS source,
             len(string_split(text, ' ')) AS n_tokens,
             {_sql_bucket(['doc_id'])} AS ord
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM d
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_taken,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM c WHERE cum <= 5000
    GROUP BY source
    """,
    tags=("llm-sampling", "mixture"),
    demoted=True,
)
def q_llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture fill over documents: 5k whitespace tokens
    per synthetic source (doc_id % 3), identity-hash order — per-source
    doc counts, tokens taken (always ≤ budget), and id-range readout,
    hash-exact vs the oracle's window formulation."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 3).alias("source"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    kept = token_budget_sample(
        docs, budget=5000, len_col="n_tokens", id_cols=["doc_id"], by=["source"]
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_taken"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
