"""Bloom-filter join pruning (semi-join pushdown), DataFrame-native.

The 100 TB join problem this solves: fact ⋈ filtered-dim where the dim's
surviving KEY SET is too large to broadcast-hash-join the dim itself,
but the join is still selective — most fact rows match nothing. A plain
sort-merge join shuffles the ENTIRE fact table on the key first and
discards most of it after the fact. A Bloom filter over the dim keys,
broadcast to the fact scan, drops non-matching fact rows MAP-SIDE,
before the shuffle — the standard runtime-row-filter / sideways
information passing technique (Spark's own AQE has an injected version
behind ``spark.sql.optimizer.runtime.bloomFilter.enabled``; this is the
explicit, composable operator form, usable when the injected rule does
not fire and from any query built here).

Everything stays in whole-stage codegen, with no Python and no driver
collect at any size:

- build: each dim key emits its k bit positions (seeded ``xxhash64``,
  one explode), ``groupBy(word).bit_or(bit)`` packs them into ≤ m/64
  sparse 64-bit words, and ONE ``map_from_entries(collect_list(...))``
  aggregation folds the words into a single-row map<word_idx, word> —
  the filter as DATA, sized by m (the false-positive budget), never by
  the corpus.
- probe: ``crossJoin(broadcast(bloom_row))`` attaches the map to the
  fact side (a one-row broadcast is a map-side operation), and the
  membership test is k static ``element_at`` + bitwise-AND terms — all
  codegen, evaluated at the scan, BEFORE any exchange.

``bloom_pruned_join`` composes prune + real join, so its result is
EXACTLY the plain join (false positives die in the join) — which makes
the operator fully oracle-checkable even though the filter itself is
probabilistic. ``bloom_semi_join`` exposes the raw prune (superset of
the true semi-join, FP rate ≤ fpp) for pipelines that tolerate it.

Standard sizing (Bloom 1970): m = ⌈n·ln(1/p)/ln²2⌉ bits,
k = max(1, round(m/n·ln 2)) hashes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_items`` keys at false-positive rate
    ``fpp``. m is rounded up to a multiple of 64 (whole words)."""
    if not (0 < fpp < 1):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(key: Column, m: int, k: int) -> list[Column]:
    """The k bit positions of a key: seeded xxhash64 mod m — the same
    one-JVM-hash-family construction as the count-min sketch cells."""
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(m)) for i in range(k)]


def _bit(pos: Column) -> Column:
    """1L << (pos % 64) — via call_function because the Python
    ``F.shiftleft`` wrapper only accepts a literal int shift amount."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
    )


def bloom_build(
    keys: DataFrame, key_col: str, fpp: float = 0.01, n_items: int | None = None
) -> tuple[DataFrame, int, int]:
    """Build a Bloom filter over ``keys[key_col]`` → (one-row frame with
    a ``__bloom`` map<bigint,bigint> column, m, k).

    NULL keys are excluded (a NULL never equi-joins, so pruning it is
    correct). ``n_items`` sizes the filter; when omitted, one
    count() action over the (column-pruned) key frame derives it — at
    100 TB pass the known/estimated distinct count instead. The whole
    build is two linear passes (count + explode/agg) and the result is a
    single row whose size is m/8 bytes + map overhead — broadcastable by
    construction since m is chosen, not data-scaled.
    """
    kf = keys.filter(F.col(key_col).isNotNull())
    if n_items is None:
        n_items = kf.count()
    m, k = _bloom_params(n_items, fpp)
    words = (
        kf.select(F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("p"))
        .select(
            (F.col("p") / 64).cast("bigint").alias("w"),
            _bit(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )
    row = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("word")))
        ).alias("__bloom")
    )
    return row, m, k


def bloom_might_contain(key: Column, bloom_col: Column, m: int, k: int) -> Column:
    """Membership predicate: all k bits set. k static element_at +
    bitwise-AND terms — pure codegen, no join, no Python."""
    pred = F.lit(True)
    for p in _positions(key, m, k):
        word = F.coalesce(
            F.element_at(bloom_col, (p / 64).cast("bigint")), F.lit(0).cast("bigint")
        )
        pred = pred & (word.bitwiseAND(_bit(p)) != 0)
    return pred


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """Fact rows whose key PASSES the Bloom filter over the dim keys —
    a superset of the true left-semi join (false-positive rate ≤ fpp;
    NULL fact keys never pass, matching semi-join semantics). The
    filter is attached by a one-row broadcast crossJoin and evaluated
    at the fact scan, before any exchange.
    """
    dim_key = dim_key or fact_key
    row, m, k = bloom_build(dim_keys.select(dim_key), dim_key, fpp, n_items)
    pruned = fact.crossJoin(F.broadcast(row)).filter(
        bloom_might_contain(F.col(fact_key), F.col("__bloom"), m, k)
    )
    return pruned.drop("__bloom")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "inner",
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side Bloom-pruned BEFORE the join's
    shuffle. Result is EXACTLY the plain join — false positives are
    eliminated by the real join; the filter only reduces what reaches
    the exchange (by ~the join's selectivity, minus fpp). Supported
    ``how``: inner / left_semi — the joins where dropping non-matching
    fact rows early is semantics-preserving.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(f"bloom pruning preserves inner/left_semi only, got {how}")
    dim_key = dim_key or fact_key
    pruned = bloom_semi_join(fact, dim.select(dim_key), fact_key, dim_key, fpp, n_items)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


@register(
    "q_join_bloom_pruned",
    oracle="""
        SELECT l.l_orderkey AS orderkey,
               l.l_linenumber AS linenumber,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
               o.o_orderpriority AS orderpriority
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        ORDER BY orderkey, linenumber
    """,
    tags=("C1", "bloom", "scale"),
    demoted=True,
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (scale path) — lineitem ⋈ urgent orders with the lineitem side
    Bloom-pruned before the shuffle. Full DuckDB oracle: the pruned join
    is bit-identical to the plain join, only the plan differs (the
    probabilistic filter can only ADD rows that the real join then
    removes). At 100 TB: ~80% of lineitem dies at the scan instead of
    crossing the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = bloom_pruned_join(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        orders.select("o_orderkey", "o_orderpriority"),
        fact_key="l_orderkey",
        dim_key="o_orderkey",
    )
    return joined.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("o_orderpriority").alias("orderpriority"),
    ).orderBy("orderkey", "linenumber")
