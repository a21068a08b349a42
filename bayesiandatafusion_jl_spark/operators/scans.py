"""Scans / sources (SURVEY §2.A).

Reference capability: relations load from delimited / sparse files and
in-memory arrays into COO cells ([api]; [upstream:src/BayesianDataFusion.jl
— UNVERIFIED]). Engine sources are Parquet: the scan is a Catalyst leaf, so
projection and predicates push into the parquet reader (check
``PushedFilters`` / ``ReadSchema`` in ``.explain``) — at 100 TB this is the
difference between reading 3 columns and reading 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_discount > 0.02 AND l_quantity < 45
    """,
    tags=("A1", "A2"),
    demoted=True,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 — parquet scan + column projection + pushed predicates.

    Column pruning reaches the reader (ReadSchema lists exactly the six
    referenced columns) and both filters land in PushedFilters; the
    driver's row-count check is the A2 filtered-count assertion.
    Demoted r12: driver coverage moved into q_filter_suite's
    ``scan_project`` leg to free a driver slot; identical local parity
    gate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") > 0.02) & (F.col("l_quantity") < 45)).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )


@register(
    "q_scan_filter_count",
    oracle="""
    SELECT COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_discount > 0.02 AND l_quantity < 45
    """,
    tags=("A2",),
    demoted=True,
)
def q_scan_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — scan + filtered count; both predicates push down to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") > 0.02) & (F.col("l_quantity") < 45))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "q_csv_json_source",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
    tags=("A4",),
    demoted=True,
)
def q_csv_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — semi-structured source: parse the JSON ``props`` payload with a
    declared schema (``from_json`` stays JVM-side; no Python UDF)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
    return parsed.filter(F.col("k").isNotNull()).select("event_id", "event_type", "k")
