"""Document chunking: overlapping token windows per document — the
context-window preprocessor every RAG / long-context training pipeline
runs (split each document into chunks of ≤ chunk_tokens with
overlap-token continuity between neighbors, keep (doc_id, chunk_id)
lineage for retrieval provenance).

Spark-first shape: the whole operator is ONE map-side expression chain
over the text scan — tokenize (split), derive the chunk count
arithmetically, explode a ``sequence`` of chunk ids, and ``slice`` the
token array per chunk — all inside whole-stage codegen, zero exchanges,
zero Python. Output grain is (doc, chunk); downstream embedding /
indexing (vector_pq, vector_index) consumes it directly. At 100 TB the
cost is exactly one linear read of the text column with a bounded
fan-out factor of ⌈len/stride⌉ rows per doc.

Chunk-boundary rule (the standard sliding window): starts at
0, stride, 2·stride, … with stride = chunk_tokens − overlap; a document
emits 1 chunk if it fits, else 1 + ⌈(n − chunk_tokens)/stride⌉, so
every token is covered, consecutive chunks share exactly ``overlap``
tokens, and the final chunk may run short (never empty — each start
introduces ≥ 1 new token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, chunk_id, chunk_text, n_tokens) — overlapping
    whitespace-token windows over ``text_col``.

    Whitespace tokens keep the op oracle-checkable and cheap; for
    trainer-grain budgets run the output through ``bpe.bpe_encode`` (the
    chunk boundary is a retrieval choice, the token budget a trainer
    one — pipelines legitimately mix grains). NULL texts are dropped
    (no content to chunk)."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
            ).cast("bigint").alias("n_tokens"),
        )
    )


_CHUNK, _OVERLAP = 32, 8
_STRIDE = _CHUNK - _OVERLAP


@register(
    "q_llm_chunk_docs",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   CASE WHEN len(string_split(text, ' ')) <= {_CHUNK} THEN 1
                        ELSE 1 + CAST(CEIL((len(string_split(text, ' ')) - {_CHUNK})
                                           / {_STRIDE}.0) AS INT)
                   END AS nc
            FROM documents WHERE text IS NOT NULL
        ), ids AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, nc - 1)) AS chunk_id
            FROM base
        )
        SELECT doc_id,
               chunk_id,
               array_to_string(
                   list_slice(toks, chunk_id * {_STRIDE} + 1,
                              chunk_id * {_STRIDE} + {_CHUNK}), ' ') AS chunk_text,
               len(list_slice(toks, chunk_id * {_STRIDE} + 1,
                              chunk_id * {_STRIDE} + {_CHUNK})) AS n_tokens
        FROM ids
        ORDER BY doc_id, chunk_id
    """,
    tags=("J5", "chunking", "rag"),
)
def q_llm_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (RAG-prep form) — overlapping 32-token windows with 8-token
    overlap over documents; full DuckDB oracle (window arithmetic and
    slicing replicated in SQL). Map-only, zero exchanges (plan-asserted
    in tests/test_chunking.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, _CHUNK, _OVERLAP).orderBy("doc_id", "chunk_id")
