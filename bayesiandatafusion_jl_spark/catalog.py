"""Table catalog: parquet loaders + temp-view registration.

The reference loads relations from sparse files / in-memory arrays into a
``RelationData`` registry ([api] ``RelationData(...)``, ``addRelation!``;
[upstream:src/RelationData.jl — UNVERIFIED]). The engine's equivalent is a
thin catalog over parquet: ``spark.read.parquet`` produces a lazy Catalyst
plan, so predicate pushdown / column pruning / partition pruning are free —
no hand-built per-entity index is needed (SURVEY §4: IndexedDF maps to
co-partitioning, not a data structure).

Scale notes (100 TB):

- Loaders return *unmaterialized* DataFrames — the scan only reads the
  columns/row-groups the final plan needs.
- The events ns-timestamp fix is arithmetic on the scan output (no UDF,
  stays in whole-stage codegen).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table; normalizes the events timestamp.

    events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects by default;
    with ``nanosAsLong`` it arrives as long nanoseconds. ``ts div 1000``
    (integer division — ``/`` would round through double and be off by up to
    1 µs at 2024 epochs) then ``timestamp_micros`` matches DuckDB's native
    µs truncation exactly (verified).
    """
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(f"{name}{suffix}")
    return dfs
