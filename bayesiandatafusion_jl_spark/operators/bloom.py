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
  sparse 64-bit words — two linear passes whose output is sized by m
  (the false-positive budget), never by the corpus. The sparse words
  are collected ONCE (bounded by the filter size — the m/8-byte filter
  must live somewhere by definition) and densified on the driver.
- probe: the dense bitmap is embedded as a LITERAL array in the
  membership predicate — the scalar-subquery shape Spark's own injected
  runtime filter uses. k static O(1) ``element_at`` + bitwise-AND
  terms, a plain ``filter`` over the fact scan: no join, no broadcast
  row, no per-row copy of the bitmap, evaluated BEFORE any exchange.
  (Two rejected alternatives, measured on a 600k-row probe at sf0.1:
  a one-row broadcast map<word,bits> — map ``element_at`` is a linear
  key scan per lookup, 6.7 s; a one-row broadcast dense array — the
  nested-loop join copies the bitmap bytes into every probe row,
  2.6 s; the literal predicate runs at scan speed, ~0.6 s.)

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


# Size rails (r12). Below the literal cap the bitmap is embedded as a
# plan literal (scan-speed codegen — the measured-best design); above it
# the probe falls back to a SparkContext-broadcast bitmap consumed by an
# Arrow-batched lookup (hashing stays JVM-side; only the k bit tests go
# through numpy), so the driver never parses a multi-MB expression
# string and the plan never serializes the bitmap per task. Beyond the
# hard cap the build REFUSES with the sizing math — a 1B-key dim at 1%
# fpp wants a ~1.2 GB bitmap, which is a partitioning problem, not a
# driver-literal one.
_BLOOM_LITERAL_MAX_WORDS = 1 << 18  # 2 MiB bitmap ≈ 1.7M keys @ 1%
_BLOOM_MAX_WORDS = 1 << 27  # 1 GiB bitmap ≈ 900M keys @ 1%


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_items`` keys at false-positive rate
    ``fpp``. m is rounded up to a multiple of 64 (whole words). Raises
    (with the sizing arithmetic spelled out) when the bitmap would
    exceed the hard cap — the guard that turns a cluster-killer into a
    config message."""
    if not (0 < fpp < 1):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    if m // 64 > _BLOOM_MAX_WORDS:
        raise ValueError(
            f"bloom filter too large: n_items={n_items} at fpp={fpp} sizes"
            f" m = ceil(n*ln(1/p)/ln^2 2) = {m} bits ="
            f" {m // 8 / 1024 / 1024:.0f} MiB, over the"
            f" {_BLOOM_MAX_WORDS * 8 // (1024 * 1024)} MiB cap — raise fpp,"
            " pre-aggregate/partition the dim keys, or use a partitioned"
            " filter per join bucket"
        )
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
) -> tuple[list, int, int]:
    """Build a Bloom filter over ``keys[key_col]`` → (dense word list of
    exactly m/64 ints, m, k).

    NULL keys are excluded (a NULL never equi-joins, so pruning it is
    correct). ``n_items`` sizes the filter; when omitted, one
    count() action over the (column-pruned) key frame derives it — at
    100 TB pass the known/estimated distinct count instead. The build is
    two linear passes (count + explode/agg); the collect is the filter
    itself — m/8 bytes, sized by the fpp budget, never by the corpus
    (10M keys at 1% ≈ 12 MB). Sizing is guard-railed (r12): the probe
    auto-switches to a broadcast bitmap above the plan-literal
    threshold, and a bitmap over the hard cap refuses with the sizing
    math (see the module-level rails).
    """
    kf = keys.filter(F.col(key_col).isNotNull())
    if n_items is None:
        n_items = kf.count()
    m, k = _bloom_params(n_items, fpp)
    sparse = (
        kf.select(F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("p"))
        .select(
            (F.col("p") / 64).cast("bigint").alias("w"),
            _bit(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    dense = [0] * (m // 64)
    for r in sparse:
        dense[r["w"]] = r["word"]
    return dense, m, k


def bloom_might_contain(key: Column, bloom: list, m: int, k: int) -> Column:
    """Membership predicate: all k bits set in the dense bitmap. NULL
    keys never pass (semi-join semantics, structural — not left to hash
    behavior on NULL).

    Small bitmaps (≤ ``_BLOOM_LITERAL_MAX_WORDS``) embed as a LITERAL:
    k static O(1) ``element_at`` + bitwise-AND terms over a constant
    array — pure codegen, no join, no per-row data movement. Large
    bitmaps switch to a SparkContext broadcast consumed by an
    Arrow-batched lookup: the k positions are STILL computed JVM-side
    (``xxhash64`` — Python cannot replicate Spark's internal-row
    hashing), and only the k bit tests run in numpy against the
    per-executor broadcast array — the bitmap ships once per executor,
    never through the expression tree."""
    if len(bloom) <= _BLOOM_LITERAL_MAX_WORDS:
        # ONE expr-string parse instead of len(bloom) individual F.lit py4j
        # round-trips: predicate construction drops from ~2.2 s to ~50 ms
        # for a 4.5k-word bitmap (the JVM parses the array literal in one
        # call); Catalyst constant-folds it to a single array Literal. The
        # k terms fold into ONE ``forall`` over the positions array so the
        # bitmap literal appears once in the tree, not k times — k-fold
        # smaller plan to fold/serialize/codegen.
        lit_words = F.expr("array(" + ",".join(f"{w}L" for w in bloom) + ")")
        hit = lambda p: (  # noqa: E731
            F.element_at(lit_words, ((p / 64).cast("bigint") + 1).cast("int"))
            .bitwiseAND(_bit(p)) != 0
        )
        return key.isNotNull() & F.forall(
            F.array(*_positions(key, m, k)), hit
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = SparkSession.getActiveSession()
    # int64 view first: the words are SIGNED 64-bit (Spark bigint), and
    # numpy refuses negative Python ints straight into uint64
    bc = spark.sparkContext.broadcast(
        np.array(bloom, dtype=np.int64).view(np.uint64)
    )

    def _member(positions):
        words = bc.value
        out = np.zeros(len(positions), dtype=bool)
        for i, ps in enumerate(positions):
            if ps is None:
                continue
            p = np.asarray(ps, dtype=np.int64)
            out[i] = bool(
                ((words[p // 64] >> (p % 64).astype(np.uint64)) & 1).all()
            )
        return pd.Series(out)

    # annotations as OBJECTS (q_udaf_group_median precedent)
    _member.__annotations__ = {"positions": pd.Series, "return": pd.Series}
    member = pandas_udf(_member, "boolean")
    return key.isNotNull() & member(F.array(*_positions(key, m, k)))


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
    filter is a literal predicate evaluated at the fact scan, before
    any exchange — the plan is scan + filter, nothing else.

    ``xxhash64`` is TYPE-sensitive (an INT 5 and a BIGINT 5 hash
    differently), so the fact key is try_cast to the dim key's exact
    dtype before hashing — otherwise a cross-type equi-join (which SQL
    coerces) would silently lose every true match. try_cast (never a
    plain cast: ANSI mode throws on overflow) can only err SAFE: a fact
    value outside the dim type's range can never equi-join a dim row,
    so the NULL it becomes is correctly dropped — no true match is
    losable, and any mangling short of NULL is at worst a false
    positive the real join removes.
    """
    dim_key = dim_key or fact_key
    dim_type = dim_keys.schema[dim_key].dataType
    words, m, k = bloom_build(dim_keys.select(dim_key), dim_key, fpp, n_items)
    return fact.filter(
        bloom_might_contain(F.col(fact_key).try_cast(dim_type), words, m, k)
    )


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
    if fact_key == dim_key:
        # name-list join form coalesces the shared key column — matching
        # fact.join(dim, [key]) exactly; the expression form would keep
        # TWO same-named key columns and poison downstream references
        return pruned.join(dim, [fact_key], how)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


@register(
    "q_join_bloom_pruned",
    oracle="""
        SELECT l.l_orderkey AS orderkey,
               l.l_linenumber AS linenumber,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS extendedprice_cents,
               o.o_orderpriority AS orderpriority
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        ORDER BY orderkey, linenumber
    """,
    tags=("C1", "bloom", "scale"),
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
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("extendedprice_cents"),
        F.col("o_orderpriority").alias("orderpriority"),
    ).orderBy("orderkey", "linenumber")
