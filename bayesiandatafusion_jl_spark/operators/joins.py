"""Joins (SURVEY §2.C).

The Gibbs sweep's core data motion is "join observations with the opposing
entity's factors" [paper:BPMF]; the reference does it via per-entity index
lookups (IndexedDF [upstream:src/RelationData.jl — UNVERIFIED]), the engine
does it as real joins and lets Catalyst pick the physical strategy.

Scale notes:
- dim tables (region/nation/supplier/part at TPC-H ratios) are broadcast —
  no shuffle of the fact side;
- fact⋈fact joins (orders⋈lineitem) shuffle on the key; AQE handles skew;
- the flagship plan is verified broadcast-heavy via .explain (see
  tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dsum, sql_dsum
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_join_inner_left",
    oracle=f"""
    SELECT 'inner' AS op, o_orderkey AS k1, CAST(NULL AS BIGINT) AS k2,
           o_totalprice AS dval, c_name AS sv1, c_mktsegment AS sv2
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'left_agg', c_custkey, COUNT(o_orderkey),
           COALESCE({sql_dsum('o_totalprice')}, 0.0), c_name,
           CAST(NULL AS VARCHAR)
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("C1", "C4"),
)
def q_join_inner_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C4 consolidated (the ``q_set_ops`` pattern), op-tagged:

    - ``inner``: equi-join (obs ⋈ factors shape [paper:BPMF]), high-value
      orders against their customers — row grain;
    - ``left_agg``: left outer join keeping ALL entities including
      unobserved ones (the pred-all full-matrix shape [api]), folded to
      per-customer order counts and decimal-exact spend.

    Each leg shuffles once on its join key (the left leg's groupBy reuses
    the join partitioning); the UNION ALL is shuffle-free. Single forms
    stay demoted with identical local parity gates."""
    null_b = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    inner_leg = (
        o.filter(F.col("o_totalprice") > 400000)
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select(
            F.lit("inner").alias("op"),
            F.col("o_orderkey").alias("k1"),
            null_b.alias("k2"),
            F.col("o_totalprice").alias("dval"),
            F.col("c_name").alias("sv1"),
            F.col("c_mktsegment").alias("sv2"),
        )
    )
    left_leg = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
        .select(
            F.lit("left_agg").alias("op"),
            F.col("c_custkey").alias("k1"),
            F.col("n_orders").alias("k2"),
            F.col("total_spend").alias("dval"),
            F.col("c_name").alias("sv1"),
            null_s.alias("sv2"),
        )
    )
    return inner_leg.unionByName(left_leg)


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
    tags=("C1",),
    demoted=True,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — inner equi-join (obs ⋈ factors shape [paper:BPMF])."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q_join_multiway",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
    tags=("C2", "flagship"),
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (flagship) — 5-way multi-relational join + revenue rollup.

    The multi-relational shape of the reference (a relation joins ≥2 entity
    tables [api]) as a star-schema query. region/nation/customer broadcast;
    orders⋈lineitem is the only shuffle pair; the date + segment filters
    push below the joins.
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        F.broadcast(r.join(n, n.n_regionkey == r.r_regionkey))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand, s_name,
           {sql_dsum('l_extendedprice')} AS gross,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size <= 10
    GROUP BY p_brand, s_name
    """,
    tags=("C3",),
    demoted=True,
    # r12: demoted to free a driver slot for q_llm_bm25_index — C3 stays
    # driver-hash-covered by q_join_multiway, whose star plan carries 3
    # BroadcastHashJoins (SCALE_AUDIT row); this explicit form keeps the
    # identical local parity gate
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — explicit broadcast joins: small dims (the 346-target side of the
    ChEMBL example [api]) broadcast against the large COO fact table; the
    fact side never shuffles for the joins."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(dsum("l_extendedprice").alias("gross"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_join_left",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({sql_dsum('o_totalprice')}, 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("C4",),
    demoted=True,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — left outer join: keep *all* entities incl. unobserved ones
    (the pred-all full-matrix prediction shape [api])."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "q_join_semi_anti",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name, c_acctbal,
           CAST(NULL AS BIGINT) AS c_nationkey
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    UNION ALL
    SELECT 'anti', c_custkey, c_name, CAST(NULL AS DOUBLE),
           CAST(c_nationkey AS BIGINT)
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    tags=("C5", "C6"),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5+C6 consolidated (the ``q_set_ops`` pattern): left-semi
    (active-set restriction — entities with ≥1 training observation) and
    left-anti (cold-start entities predicted from side info only
    [paper:Macau]) in one op-tagged result. Each leg pushes its orders
    filter below the join (PushedFilters) and runs one hash semi/anti
    join; the UNION ALL is shuffle-free. The single-join forms stay
    demoted with identical local parity gates."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")),
            c.c_custkey == F.col("o_custkey"),
            "left_semi",
        )
        .select(
            F.lit("semi").alias("op"),
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.lit(None).cast("bigint").alias("c_nationkey"),
        )
    )
    anti = (
        c.join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select(
            F.lit("anti").alias("op"),
            "c_custkey",
            "c_name",
            F.lit(None).cast("double").alias("c_acctbal"),
            F.col("c_nationkey").cast("bigint"),
        )
    )
    return semi.unionByName(anti)


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    tags=("C5",),
    demoted=True,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — left semi join: active-set restriction (entities having ≥1
    observation in the sweep's training set)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    tags=("C6",),
    demoted=True,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — left anti join: cold-start entities with zero observations,
    predicted from side info only [paper:Macau].

    The right side is restricted to urgent-priority orders so the result
    is NON-EMPTY at every test SF (every customer has *some* order in the
    synthetic data, so the unrestricted anti-join hash-matched on an empty
    frame — zero-row evidence). The filter lands below the join on the
    orders scan (PushedFilters), the anti-join shape is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


def _hashable_type(dt) -> bool:
    """xxhash64 rejects MapType at any nesting depth (maps are unordered,
    no canonical hash) — walk the type tree."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable_type(f.dataType) for f in dt.fields)
    return True


def detect_heavy_keys(fact: DataFrame, key: str, phi: float = 0.001) -> list:
    """Join keys holding ≥ phi·N of the fact rows, via the exact bounded
    Misra–Gries two-pass (aggregates.heavy_hitters) — the shuffle is
    ⌈1/phi⌉·P candidate keys and the collect ≤ 1/phi values by
    construction (phi=0.001 → ≤ 1000 keys), never data-scaled. Feeds
    ``salted_join(..., heavy_keys=...)``; a pipeline profiles once and
    reuses the list across joins on the same fact."""
    from bayesiandatafusion_jl_spark.operators.aggregates import heavy_hitters

    return [r[key] for r in heavy_hitters(fact.select(key), key, phi).collect()]


def salted_join(
    fact: DataFrame,
    mid: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
    heavy_keys: list | None = None,
    phi: float | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: pre-salt a hot-keyed fact side.

    For the middle ground AQE's skew-join can't always fix: ``mid`` is too
    big to broadcast, and the fact side's key distribution has a handful of
    hot keys (one compound/user holding 10⁷ observations is the factor-model
    case [paper:Macau §ChEMBL]) so a plain shuffle join lands one reducer
    with the whole hot key. Each fact row is routed to one of ``n_salt``
    sub-keys by a deterministic row hash (retry-stable — no ``rand()``/
    ``monotonically_increasing_id``), and ``mid`` is replicated ``n_salt``×
    via a single in-task ``explode`` — a hot key's rows now spread over
    ``n_salt`` reducers at the cost of shuffling ``n_salt``× the mid side.

    **Selective salting** (r11): pass ``heavy_keys`` (a known hot-key
    list) or ``phi`` (run ``detect_heavy_keys`` at that threshold) and
    only those keys salt and replicate — light fact rows keep salt 0 and
    light mid rows stay single-copy, so the mid inflation is
    |heavy mid rows|·(n_salt−1) instead of |mid|·(n_salt−1). Single-key
    ``on`` only (heavy detection is per-column). With an empty detected
    list the join degrades to the plain join — zero overhead.

    Row-identical to ``fact.join(mid, on, how)``: salting changes WHERE rows
    meet, never WHICH rows match. Only fact-preserving join types are legal
    — inner/left (mid replication can't duplicate fact rows: each fact row
    carries exactly one salt) and semi/anti (existence of a (key, salt)
    match ≡ existence of a key match: every salt replica of a heavy mid
    row exists, and light/NULL fact rows carry salt 0 which is always the
    replica a light mid row keeps); ``mid``-preserving types (right/full)
    would emit one unmatched row per replica. The same two-phase idea,
    fused with partial aggregation, drives the trainer's ``skew_salt``
    path (ml/bpmf.py, ml/kernels.py).
    """
    allowed = (
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti",
    )
    if how not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins "
            f"(inner/left/semi/anti), not {how!r}: replicating the mid side "
            "would duplicate its unmatched rows"
        )
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    selective = heavy_keys is not None or phi is not None
    if selective and len(keys) != 1:
        raise ValueError("selective salting supports a single join key")
    if selective and heavy_keys is None:
        heavy_keys = detect_heavy_keys(fact, keys[0], phi)
    if selective and not heavy_keys:
        return fact.join(mid, keys, how)
    salt = "__salt"
    while salt in fact.columns or salt in mid.columns:
        salt += "_"
    # whole-row hash: deterministic under retries, and spreads a hot key's
    # rows because the NON-key columns differ row to row. Map-typed
    # columns are excluded — xxhash64 rejects MapType (unordered, no
    # canonical hash) and the salt only needs SOME per-row entropy; the
    # always-hashable join keys keep the list non-empty.
    hashable = [
        f.name for f in fact.schema.fields if _hashable_type(f.dataType)
    ]
    row_salt = F.pmod(F.xxhash64(*hashable), F.lit(n_salt)).cast("int")
    all_salts = F.array(*[F.lit(i) for i in range(n_salt)])
    if selective:
        is_heavy = F.array_contains(
            F.array(*[F.lit(k) for k in heavy_keys]), F.col(keys[0])
        )
        salted_fact = fact.withColumn(
            salt, F.when(is_heavy, row_salt).otherwise(F.lit(0))
        )
        replicated_mid = mid.withColumn(
            salt,
            F.explode(F.when(is_heavy, all_salts).otherwise(F.array(F.lit(0)))),
        )
    else:
        salted_fact = fact.withColumn(salt, row_salt)
        replicated_mid = mid.withColumn(salt, F.explode(all_salts))
    return salted_fact.join(replicated_mid, keys + [salt], how).drop(salt)


@register(
    "q_join_salted",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('l_extendedprice')} AS gross,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("C1", "skew"),
    demoted=True,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (skew-resistant variant) — the same orders⋈lineitem equi-join
    executed through ``salted_join``; the oracle is the PLAIN join, proving
    salting is result-invisible. Demoted: the physical shape is an internal
    strategy choice, driver slots go to distinct semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey", n_salt=4)
        .groupBy("o_orderpriority")
        .agg(
            dsum("l_extendedprice").alias("gross"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_salted_heavy",
    oracle="""
        WITH type_stats AS (
            SELECT event_type AS t_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(value) AS type_avg
            FROM events GROUP BY event_type
        )
        SELECT e.event_id AS event_id,
               e.event_type AS event_type,
               CAST(e.value - ts.type_avg AS DECIMAL(18,6)) AS value_delta
        FROM events e
        JOIN type_stats ts ON e.event_type = ts.t_type
        ORDER BY event_id
    """,
    tags=("C1", "skew", "scale"),
    demoted=True,
)
def q_join_salted_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (selective-salting path, r11) — events ⋈ per-type stats on
    event_type, the canonical skewed key (5 values covering every row:
    each is a Misra–Gries heavy hitter at phi=0.05, so detection routes
    ALL of them through the salted path). The full DuckDB oracle
    certifies the physical rewrite is exact. At 100 TB the hot key's
    reducer shrinks n_salt-fold while a long-tail dim would stay
    single-copy."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    stats = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("value")
        ).alias("type_avg")
    )
    joined = salted_join(ev, stats, "event_type", phi=0.05)
    return joined.select(
        "event_id",
        "event_type",
        (F.col("value") - F.col("type_avg"))
        .cast("decimal(18,6)")
        .alias("value_delta"),
    ).orderBy("event_id")


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, seg
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) segs
    """,
    tags=("C9",),
    demoted=True,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 — cross join: the dense candidate grid (all entity combos) used
    for tensor-mode prediction [paper:Macau §tensor]. Only ever small×small
    or broadcast-nested-loop.

    Demoted from the driver surface: the same crossJoin physical op is
    exercised driver-side inside q_llm_tfidf (scalar crossJoin) and the
    tensor candidate grid of the ML suite; this narrow form stays under
    the local parity gate."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    segs = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg")
    ).distinct()
    return r.crossJoin(segs)
