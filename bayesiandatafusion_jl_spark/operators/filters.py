"""Projections / filters / predicates (SURVEY §2.B).

Reference capability: test/train cell selection, value clamping, derived
transforms (log-IC50) before factorization ([api] macau options). All pure
Catalyst expressions — whole-stage codegen, full pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_filter_suite",
    oracle="""
    SELECT 'range' AS op,
           l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2,
           l_quantity AS dv1, l_extendedprice AS dv2,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS dv3,
           CAST(CAST(LN(1 + l_quantity) AS REAL) AS DOUBLE) AS dv4,
           CAST(NULL AS VARCHAR) AS sv1, CAST(NULL AS VARCHAR) AS sv2
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity < 20
      AND l_discount BETWEEN 0.01 AND 0.05
    UNION ALL
    SELECT 'in_like_null', c_custkey, CAST(NULL AS BIGINT),
           c_acctbal, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_name LIKE '%5%'
      AND c_acctbal IS NOT NULL
      AND NOT (c_acctbal < 0)
    UNION ALL
    SELECT 'scan_project', l_orderkey, CAST(l_linenumber AS BIGINT),
           CAST(l_partkey AS DOUBLE), l_extendedprice, CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM lineitem
    WHERE l_discount > 0.02 AND l_quantity < 45
    """,
    tags=("A1", "A2", "B1", "B2", "B3"),
)
def q_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+B1+B2+B3 consolidated (the ``q_set_ops`` pattern), op-tagged:

    - ``range``: range predicates (train/test cell selection shape) +
      computed projection (the IC50 log-transform [api]) over lineitem —
      charge parenthesization matches the oracle exactly (bit-identical
      double arithmetic), ln float32-cast to absorb libm ulps;
    - ``in_like_null``: compound IN / LIKE / IS NULL / NOT predicate
      algebra over customer;
    - ``scan_project`` (r12, absorbs q_scan_project): parquet scan +
      column projection + pushed predicates — ReadSchema lists exactly
      the referenced columns, both filters land in PushedFilters, and
      the surviving row count doubles as the A2 filtered-count check.

    All legs are map-only filter+project with the predicates pushed to
    the scans; the UNION ALL is shuffle-free. Wide single forms stay
    demoted with identical local parity gates."""
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    li = load_table(spark, sf_dir, "lineitem")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * (
        1 + F.col("l_tax")
    )
    range_leg = li.filter(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 20)
        & F.col("l_discount").between(0.01, 0.05)
    ).select(
        F.lit("range").alias("op"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        F.col("l_quantity").alias("dv1"),
        F.col("l_extendedprice").alias("dv2"),
        charge.alias("dv3"),
        F.log(1 + F.col("l_quantity")).cast("float").cast("double").alias("dv4"),
        null_s.alias("sv1"),
        null_s.alias("sv2"),
    )
    c = load_table(spark, sf_dir, "customer")
    in_leg = c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").like("%5%")
        & F.col("c_acctbal").isNotNull()
        & ~(F.col("c_acctbal") < 0)
    ).select(
        F.lit("in_like_null").alias("op"),
        F.col("c_custkey").alias("k1"),
        F.lit(None).cast("bigint").alias("k2"),
        F.col("c_acctbal").alias("dv1"),
        null_d.alias("dv2"),
        null_d.alias("dv3"),
        null_d.alias("dv4"),
        F.col("c_name").alias("sv1"),
        F.col("c_mktsegment").alias("sv2"),
    )
    scan_leg = li.filter(
        (F.col("l_discount") > 0.02) & (F.col("l_quantity") < 45)
    ).select(
        F.lit("scan_project").alias("op"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        F.col("l_partkey").cast("double").alias("dv1"),
        F.col("l_extendedprice").alias("dv2"),
        null_d.alias("dv3"),
        null_d.alias("dv4"),
        null_s.alias("sv1"),
        null_s.alias("sv2"),
    )
    return range_leg.unionByName(in_leg).unionByName(scan_leg)


@register(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
           CAST(LN(1 + l_quantity) AS REAL) AS log_qty
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity < 20
      AND l_discount BETWEEN 0.01 AND 0.05
    """,
    tags=("B1", "B3"),
    demoted=True,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+B3 — range predicates (train/test cell selection shape) plus
    computed projection (the log-transform applied to IC50 values before
    factorization [api]).

    Determinism: parenthesization of ``charge`` matches the oracle exactly
    → the pure double arithmetic is bit-identical, unrounded. ln() is cast
    to float32 to absorb last-ulp libm vs java.lang.Math differences."""
    li = load_table(spark, sf_dir, "lineitem")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * (1 + F.col("l_tax"))
    return li.filter(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 20)
        & F.col("l_discount").between(0.01, 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        charge.alias("charge"),
        F.log(1 + F.col("l_quantity")).cast("float").alias("log_qty"),
    )


@register(
    "q_filter_in_like_null",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_name LIKE '%5%'
      AND c_acctbal IS NOT NULL
      AND NOT (c_acctbal < 0)
    """,
    tags=("B2",),
    demoted=True,
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — compound IN / LIKE / IS NULL / NOT predicate algebra
    (entity subsetting by id-list, generalized)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").like("%5%")
        & F.col("c_acctbal").isNotNull()
        & ~(F.col("c_acctbal") < 0)
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
           CAST(LN(1 + l_quantity) AS REAL) AS log_qty
    FROM lineitem
    """,
    tags=("B3",),
    demoted=True,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — computed projection (the log-transform shape used on IC50
    values before factorization [api]).

    Determinism: parenthesization matches the oracle exactly → the pure
    double arithmetic is bit-identical, *unrounded*. The ln() result is
    cast to float32: libm vs java.lang.Math may differ in the last double
    ulp, and float truncation absorbs it (cross-engine ROUND on doubles is
    NOT reliable — verified mismatch at ~1e-3 rate).
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * (1 + F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge.alias("charge"),
        F.log(1 + F.col("l_quantity")).cast("float").alias("log_qty"),
    )


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    """,
    tags=("B4",),
    demoted=True,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — exact duplicate elimination (duplicate-cell cleanup before
    training). Partial-aggregate dedup map-side, then one shuffle on the
    key — the scale-correct plan Catalyst already picks."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
