"""Set operations (SURVEY §2.G).

Reference capability: stacking relations over the same entity pair
(multi-relation fusion [api]) and train/test reconstitution
(``assignToTest!`` splits cells [api]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_set_ops",
    oracle="""
    SELECT 'union' AS op, o_orderkey AS key FROM (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION
      SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    )
    UNION ALL
    SELECT 'intersect' AS op, o_custkey AS key FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey AS key FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders
    )
    """,
    tags=("G1", "G2", "G3"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G2+G3 — union-distinct, intersect and except in one result,
    tagged by ``op``:

    - ``union``: urgent ∪ high-value orders (relation stacking / fusion
      shape [api]);
    - ``intersect``: customers active in both 1996 and 1997 (overlap of
      observed cell sets between two relations);
    - ``except``: customers minus those with orders (the
      ``assignToTest!`` complement, train = all − test [api]).

    Each leg is a key-only set op — partial-aggregate dedup map-side,
    then one shuffle per leg; the final UNION ALL is shuffle-free."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    union_leg = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("key"))
        .unionByName(o.filter(F.col("o_totalprice") > 400000).select(F.col("o_orderkey").alias("key")))
        .distinct()
        .select(F.lit("union").alias("op"), "key")
    )
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("key"))
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("key"))
    intersect_leg = y96.intersect(y97).select(F.lit("intersect").alias("op"), "key")
    except_leg = (
        c.select(F.col("c_custkey").alias("key"))
        .subtract(o.select(F.col("o_custkey").alias("key")))
        .select(F.lit("except").alias("op"), "key")
    )
    return union_leg.unionByName(intersect_leg).unionByName(except_leg)


@register(
    "q_set_union",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
    """,
    tags=("G1",),
    demoted=True,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — union + distinct (relation stacking / fusion shape)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    tags=("G2",),
    demoted=True,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — intersect: entities observed in both periods (overlap of
    observed cell sets between two relations)."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    return y96.intersect(y97)


@register(
    "q_set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("G3",),
    demoted=True,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — except: train = all − test (the ``assignToTest!`` complement
    [api]); here: customers minus those with orders."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)  # EXCEPT (distinct) semantics, matches the oracle
