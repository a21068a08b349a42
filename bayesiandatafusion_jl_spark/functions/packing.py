"""Sequence packing: GPT-style concat-then-chunk placement of documents
into fixed-capacity context windows.

Every LLM pretraining pipeline ends with this step: the tokenized corpus
is laid out as one deterministic stream, and each document receives the
context-window ("bin") and offset where it starts; a document whose
tokens straddle a window boundary simply spills into the next one. The
hard part at 100 TB is the GLOBAL exclusive prefix sum over the token
counts — a naive ``Window.orderBy(...)`` with no partition key funnels
the entire corpus through ONE task.

``pack_sequences`` implements the classic two-phase distributed scan
instead:

1. range-repartition on the deterministic stream order (the identity
   hash from ``operators.sampling``, so the layout is reproducible on
   any cluster and any prior partitioning, with the unique id columns as
   range keys so no tie ever straddles a boundary);
2. per-partition exclusive cumsum under a ``partitionBy(partition_id)``
   window — parallel across partitions;
3. per-partition totals (ONE row per partition — bounded by the
   partition count, never by the data) collected, prefix-summed on the
   driver, and joined back as a broadcast offset table.

The global position of a row = its partition's prefix offset + its local
exclusive cumsum; ``bin_id = pos div capacity``, ``offset = pos mod
capacity``. The result is bit-identical to the single-task window (the
oracle below IS that single global window, in DuckDB) at any partition
count, which ``tests/test_packing.py::test_partition_count_invariance``
pins at n_partitions ∈ {1, 3, 7, 32}.

Execution-determinism note: ``repartitionByRange`` SAMPLES its boundaries
per execution, so the staged frame is ``checkpoint_df``-materialized ONCE
before anything reads ``spark_partition_id()`` — the per-partition totals
collect and the returned plan must see the SAME partition assignment, and
Spark does not dedupe identical subplans across actions. The checkpoint
also removes 2 of the 3 redundant executions of the range shuffle the
naive plan would run (totals leg, output leg, caller's action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.operators.sampling import _bucket, _sql_bucket
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import checkpoint_df, shuffle_partitions


def pack_sequences(
    df: DataFrame,
    id_cols: list[str],
    len_col: str,
    capacity: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a (bin_id, offset) under concat-then-chunk packing.

    The stream order is (identity_hash, *id_cols) — deterministic and
    partition-independent. Output adds ``bin_id`` (the fixed-capacity
    window in which the row STARTS) and ``offset`` (token position inside
    that window); rows longer than ``capacity - offset`` conceptually
    spill into subsequent windows, exactly like a training-data writer
    would chunk the concatenated token stream.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    sess = df.sparkSession
    if n_partitions is None:
        n_partitions = shuffle_partitions(sess)

    order_cols = [_bucket(id_cols).alias("__ord")] + [F.col(c) for c in id_cols]
    staged = df.select("*", order_cols[0]).repartitionByRange(
        n_partitions, F.col("__ord"), *id_cols
    )
    # repartitionByRange samples its boundaries per EXECUTION; materialize
    # once so the totals collect below and the returned plan read the SAME
    # __pid assignment (Spark never dedupes identical subplans across
    # actions — an uncheckpointed two-leg read is a latent wrong answer).
    pid = checkpoint_df(staged.withColumn("__pid", F.spark_partition_id()))

    w = (
        W.partitionBy("__pid")
        .orderBy(F.col("__ord").asc(), *[F.col(c).asc() for c in id_cols])
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = pid.withColumn(
        "__local", F.coalesce(F.sum(F.col(len_col)).over(w), F.lit(0)).cast("long")
    )
    # one row per partition — bounded by the partition count by
    # construction, the sanctioned collect shape (same discipline as the
    # k-means centers / CG readouts elsewhere in this repo)
    totals = {
        r["__pid"]: r["t"]
        for r in pid.groupBy("__pid")
        .agg(F.sum(F.col(len_col)).cast("long").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for p in range(n_partitions):
        prefix[p] = acc
        acc += totals.get(p, 0)
    offsets = sess.createDataFrame(
        [(p, prefix[p]) for p in range(n_partitions)], "__pid int, __prefix long"
    )
    # integer `div`, never float division: cumulative positions in a 100 TB
    # token stream exceed 2^53, where a double round-trip loses exactness
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__pos", (F.col("__prefix") + F.col("__local")).cast("long"))
        .withColumn("bin_id", F.expr(f"__pos div {int(capacity)}"))
        .withColumn("offset", F.pmod(F.col("__pos"), F.lit(capacity)).cast("long"))
        .drop("__ord", "__pid", "__local", "__prefix", "__pos")
    )


_PACK_CAPACITY = 256


@register(
    "q_llm_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(LOWER(text), ' ')) AS n_tokens,
             {_sql_bucket(['doc_id'])} AS ord
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS p
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(p // {_PACK_CAPACITY} AS BIGINT) AS bin_id,
           CAST(p % {_PACK_CAPACITY} AS BIGINT) AS offset
    FROM pos
    """,
    tags=("J5", "packing"),
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents table into {capacity}-token context windows:
    per doc, the window and offset where it starts under deterministic
    concat-then-chunk layout. The DuckDB oracle is the single global
    window this two-phase scan must equal bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_sequences(
        sized, ["doc_id"], "n_tokens", _PACK_CAPACITY
    ).select("doc_id", "n_tokens", "bin_id", "offset")


def pack_chunks(
    df: DataFrame,
    id_cols: list[str],
    len_col: str,
    capacity: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Chunk-level packing output — what the training-data WRITER emits:
    one row per (document, context window) intersection, so a document
    straddling window boundaries appears once per window it touches.

    Adds to ``id_cols``: ``bin_id`` (the window), ``bin_offset`` (where
    the chunk starts inside the window), ``doc_offset`` (where the chunk
    starts inside the document), ``chunk_len``. Invariants (pytest-pinned):
    chunk lengths per document sum to the document length and are
    contiguous in ``doc_offset``; every window except the stream's last is
    filled to exactly ``capacity`` tokens.

    Derivation is a map-side explode over ``pack_sequences``' placement
    (global position = bin_id·capacity + offset): per doc, one row per
    spanned window via ``sequence``; all arithmetic integer (`div`), so
    positions stay exact past 2^53. Zero-length documents span no window
    and emit no chunk.
    """
    placed = pack_sequences(df, id_cols, len_col, capacity, n_partitions)
    cap = int(capacity)
    pos = f"(bin_id * {cap} + offset)"
    last = f"({pos} + {len_col} - 1) div {cap}"
    return (
        placed.filter(F.col(len_col) > 0)
        .select(
            *id_cols,
            len_col,
            F.expr(f"{pos}").alias("__pos"),
            F.explode(F.expr(f"sequence(bin_id, {last})")).alias("bin_id"),
        )
        .select(
            *id_cols,
            "bin_id",
            (F.greatest(F.col("__pos"), F.col("bin_id") * cap) - F.col("bin_id") * cap)
            .cast("long")
            .alias("bin_offset"),
            (F.greatest(F.col("__pos"), F.col("bin_id") * cap) - F.col("__pos"))
            .cast("long")
            .alias("doc_offset"),
            (
                F.least(F.col("__pos") + F.col(len_col), (F.col("bin_id") + 1) * cap)
                - F.greatest(F.col("__pos"), F.col("bin_id") * cap)
            )
            .cast("long")
            .alias("chunk_len"),
        )
    )


@register(
    "q_llm_pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(LOWER(text), ' ')) AS n_tokens,
             {_sql_bucket(['doc_id'])} AS ord
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS p
      FROM t
    ),
    spans AS (
      SELECT doc_id, p, n_tokens,
             UNNEST(range(CAST(p // {_PACK_CAPACITY} AS BIGINT),
                          CAST((p + n_tokens - 1) // {_PACK_CAPACITY} + 1
                               AS BIGINT))) AS bin_id
      FROM pos WHERE n_tokens > 0
    )
    SELECT doc_id, CAST(bin_id AS BIGINT) AS bin_id,
           CAST(GREATEST(p, bin_id * {_PACK_CAPACITY})
                - bin_id * {_PACK_CAPACITY} AS BIGINT) AS bin_offset,
           CAST(GREATEST(p, bin_id * {_PACK_CAPACITY}) - p AS BIGINT)
             AS doc_offset,
           CAST(LEAST(p + n_tokens, (bin_id + 1) * {_PACK_CAPACITY})
                - GREATEST(p, bin_id * {_PACK_CAPACITY}) AS BIGINT)
             AS chunk_len
    FROM spans
    """,
    tags=("J5", "packing"),
    demoted=True,
)
def q_llm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-grain packing: one row per (doc, context-window) chunk under
    the same deterministic layout as ``q_llm_pack_sequences``; the oracle
    re-derives every chunk from the single global window."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_chunks(sized, ["doc_id"], "n_tokens", _PACK_CAPACITY).select(
        "doc_id", "bin_id", "bin_offset", "doc_offset", "chunk_len"
    )
