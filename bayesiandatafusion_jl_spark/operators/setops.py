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
    "q_set_union",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
    """,
    tags=("G1",),
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
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — except: train = all − test (the ``assignToTest!`` complement
    [api]); here: customers minus those with orders."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)  # EXCEPT (distinct) semantics, matches the oracle
