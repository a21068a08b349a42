"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``bayesiandatafusion_jl_spark``: the registry binds every
implemented operator from SURVEY.md §2 to a (Spark callable, DuckDB oracle
SQL) pair; this module just exposes the three driver hooks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bayesiandatafusion_jl_spark.registry import all_oracles, all_queries, get_query


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2 C2: 5-way star join revenue rollup) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return get_query("q_join_multiway").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; rows-only
    operators (randomized/sketch/streaming) are intentionally absent."""
    return all_oracles()
