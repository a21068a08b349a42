"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; the config below is written so
the same code is correct on a 1000-executor cluster reading 100 TB:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — at 100 TB, static shuffle-partition counts are always wrong;
  AQE re-plans from runtime statistics.
- Arrow on — every pandas-UDF kernel (the ML path) transfers via Arrow
  batches, not pickled rows.
- shuffle.partitions sized for the local box; on a real cluster this is
  overridden per-deploy (or left to AQE's coalescing from a high initial
  number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "bayesiandatafusion_jl_spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # iterative ML loops create thousands of broadcasts/persists per run;
        # default 30-min periodic GC lets dead broadcast blocks pile up until
        # the storage memory pool rejects new ones
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def checkpoint_df(df):
    """persist → eager localCheckpoint → release the pre-checkpoint cache.

    The one sanctioned way to pin a nondeterministic subplan (sampled
    range-partition boundaries, seeded draws, fresh RDD ids) so that two
    consumers of the same frame are guaranteed to read the SAME
    materialization — Spark does NOT dedupe identical subplans across
    actions, so without this the subplan executes once per action and a
    nondeterministic stage can produce different rows each time.

    BOTH halves are load-bearing. The persist grounds the checkpointed
    plan's origin statistics in the real materialized size: without it the
    LogicalRDD inherits the default sizeInBytes (2⁶³) and chained
    iterations' join-stats MULTIPLY the previous checkpoint's origin
    stats (observed as a driver heap OOM inside stats estimation in long
    Gibbs runs). The immediate unpersist releases the CacheManager entry
    (safe: the eager checkpoint has already copied the partitions and
    truncated lineage), so long sessions don't accumulate dead caches.
    """
    cached = df.persist()
    out = cached.localCheckpoint()
    cached.unpersist()
    return out


def shuffle_partitions(spark: SparkSession, default: int = 32) -> int:
    """The session's shuffle-partition count as an int, tolerating non-numeric
    values like ``"auto"`` (AQE auto-optimized shuffle on some distros) by
    falling back to ``default``. Every operator that sizes its parallelism
    from this conf must go through here — a raw ``int(conf.get(...))``
    crashes on exactly the sessions whose parallelism we most want to track.
    """
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except ValueError:
        return default


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs the engine depends on.

    Called on every entry point because the driver may hand us a session we
    did not build. All of these are dynamic SQL confs (verified runtime-
    settable on Spark 4.1.2).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    return spark
