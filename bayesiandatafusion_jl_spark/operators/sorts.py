"""Sorts / limits / top-k (SURVEY §2.F).

Global ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each
partition keeps its local top-k, the driver merges k·P candidates — no
global sort materializes. That is exactly the 100 TB-safe plan for the
reference's top-predictions readout [api].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
    tags=("F1", "F2"),
    demoted=True,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2 — global top-k over a multi-column mixed-direction sort with
    full tiebreak keys (deterministic row *selection*, which is what the
    order-insensitive hash checks). Demoted r12: driver coverage moved
    into q_win_rank_topk_per_group's ``global_topk`` leg to free a
    driver slot; identical local parity gate."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(100)
    )


@register(
    "q_sort_multicol",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
    tags=("F2",),
    demoted=True,
)
def q_sort_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — multi-column mixed-direction sort (deterministic via PK)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )
