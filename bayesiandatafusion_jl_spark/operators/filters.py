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
