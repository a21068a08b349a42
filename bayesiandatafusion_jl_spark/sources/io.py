"""Readers/writers.

The reference reads delimited sparse files and custom sparse-binary
matrices ([upstream:src/sbm.jl — UNVERIFIED]); the engine's canonical
at-rest format is Parquet COO (columnar, predicate-pushdown-able,
splittable — everything the bespoke binary format existed for, natively).
CSV/JSON readers cover the delimited-input capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bayesiandatafusion_jl_spark.session import configure_runtime


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    configure_runtime(spark)
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    """Delimited source. Always pass an explicit schema in production —
    inference is a full extra pass over 100 TB."""
    configure_runtime(spark)
    reader = spark.read.options(header="true", **options)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    configure_runtime(spark)
    reader = spark.read.options(**options)
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (r12) — the other columnar at-rest format Spark ships
    natively (vectorized reader, predicate pushdown, column pruning —
    the same scan contract as parquet, so every operator here consumes
    it unchanged). Exists for interop with ORC-resident warehouses; new
    data should keep landing in parquet."""
    configure_runtime(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (r12) — interop twin of ``read_orc``."""
    df.write.mode(mode).orc(path)


def read_coo(spark: SparkSession, path: str) -> DataFrame:
    """Sparse COO relation from parquet: (i1, i2[, i3…], value) long format
    — the engine's representation of the reference's Relation cells."""
    return read_parquet(spark, path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Parquet sink. ``partition_by`` for partition pruning on read;
    ``bucket_by`` (requires ``table_name``, saveAsTable) to persist a
    co-partitioned layout that joins without a shuffle across sweeps."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketed writes need table_name (saveAsTable)")
        writer.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(
            table_name
        )
        return
    writer.parquet(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on ``cols``
    then ``sortWithinPartitions`` before writing.

    Each output file then covers a narrow, disjoint slice of the key space
    (range partitioning samples exact split points), so parquet footer
    min/max stats let a selective range predicate skip whole files and
    row groups — the layout that turns a 100 TB full scan into a
    few-files read. The 1-D analogue of Z-ordering; for multi-column
    locality pass the columns major-first. One shuffle at WRITE time,
    amortized over every subsequent pruned read."""
    if n_partitions is not None and n_partitions < 1:
        raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
    part = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions is not None
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_partitions: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet layout over 2+ numeric
    columns — the multi-dimensional complement to ``write_range_sorted``:
    a 1-D range sort gives one column tight per-file min/max spans and
    leaves every OTHER column's span at ~full range per file; interleaving
    the columns' bit representations orders by a space-filling curve, so
    EVERY clustered column gets a narrow span in every file and selective
    predicates on ANY of them skip files on footer stats (the same
    mechanism Delta/Iceberg OPTIMIZE ZORDER uses).

    Construction (all map-side except the one clustering shuffle):

    1. one scalar agg for per-column min/max (bounded collect);
    2. each column scaled to a ``bits``-bit integer rank (double math —
       rank quality only affects locality, never correctness: the data
       itself is written unmodified);
    3. ranks bit-interleaved into the Morton value as a plain
       shiftleft/and expression sum (whole-stage codegen);
    4. ``repartitionByRange`` + ``sortWithinPartitions`` on the Morton
       value, which is then dropped before write.

    ``bits`` × len(cols) must fit in a long (≤ 62); 16 bits per dimension
    distinguishes 65k quantiles per column — far finer than file count.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_range_sorted")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) must be <= 62, got {bits * len(cols)}")
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]

    top = (1 << bits) - 1
    ranks = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"z-order column {c!r} is entirely NULL — cannot derive a "
                "rank range; drop it from cols or fill it first"
            )
        span = (mx - mn) or 1.0
        # NULL values rank 0 (cluster at the curve origin, deterministic)
        # rather than poisoning the Morton key to NULL
        r = F.coalesce(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ),
            F.lit(0),
        ).cast("long")
        ranks.append(r)
    k = len(cols)
    z = F.lit(0).cast("long")
    for j, r in enumerate(ranks):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(r, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("long")

    staged = df.withColumn("__z", z)
    part = (
        staged.repartitionByRange(n_partitions, "__z")
        if n_partitions is not None
        else staged.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def write_shuffled_shards(
    df,
    path: str,
    id_cols: list[str],
    n_shards: int,
    seed: int = 0,
    mode: str = "overwrite",
):
    """Persist a deterministic epoch shuffle (``shuffle_shards``,
    operators/sampling.py) as ``path/shard=K/`` parquet, one file per
    shard, rows pos-sorted within the file — the trainer reads shard
    directories round-robin and gets a reproducible global permutation
    without any sort-by-rand() total shuffle.

    One hash-repartition on ``shard`` (each shard lands wholly in one
    task, so each directory holds exactly one file whose row order IS the
    serving order); re-seeding rewrites layout only, data unmodified.

    The repartition over-provisions partitions 16× (r16, guide §2.5):
    hashing n_shards DISTINCT key values into exactly n_shards
    partitions collides ~1/e of them — tasks carrying two shards
    straggle the write while their neighbours idle. 16·n_shards
    partitions make collisions rare (expected colliding shards ≈
    n/32); empty partitions schedule as no-op tasks. Each shard still
    lands wholly in ONE task and ``partitionBy`` still emits one
    pos-sorted file per shard directory — the layout contract is
    byte-identical, only the task-to-shard packing changes."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.operators.sampling import shuffle_shards

    staged = shuffle_shards(df, id_cols, n_shards, seed)
    (
        staged.repartition(16 * n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos", *id_cols)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
