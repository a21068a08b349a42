"""RAG retrieval pipeline: chunk → feature-hash embed → ANN retrieve.

Ties the r11 pieces into the end-to-end shape a retrieval corpus build
actually runs: documents are windowed into overlapping chunks
(functions/chunking.py), every chunk is embedded, and queries retrieve
their top-k chunks through the IVF ANN path (functions/vector.py) —
chunk lineage (doc_id, chunk_id) preserved throughout so a hit resolves
back to its source document.

The embedder is the FEATURE-HASHING trick (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009 — public paper),
not a stub: token → ``xxhash64`` bucket in [0, dim), a second hash bit
gives the ±1 sign (the signed construction that makes collisions cancel
in expectation), per-bucket signed counts become the vector, L2
normalized. It is deterministic, partition-invariant, needs no model
weights, and produces genuinely-useful lexical embeddings (a one-token
edit moves the vector O(1/√len)); swap in a neural encoder behind the
same (id, embedding) contract when one is available.

Plan shape: chunking is map-only; embedding is two shrinking-key
shuffles (token explode → (chunk, bucket) counts → per-chunk map) plus
a map-side densify/normalize; retrieval is the IVF path's
broadcast-probe candidate join. Nothing data-scaled crosses the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.chunking import chunk_documents
from bayesiandatafusion_jl_spark.functions.exprs import dot
from bayesiandatafusion_jl_spark.registry import register


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """(id_col, out_col): signed feature-hash embedding of the
    whitespace token multiset, L2-normalized (zero vectors — empty
    texts — stay zero rather than dividing by zero).

    Two shuffles, both on shrinking keys: (id, bucket) partial-agg
    counts, then one row per id. The densify is a map-side
    ``transform(sequence(...))`` over the per-id bucket map.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.lower(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = tok.select(
        id_col,
        F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int").alias("bucket"),
        # independent second hash decides the sign: collisions cancel in
        # expectation (the signed construction of Weinberger et al. §3)
        (F.pmod(F.xxhash64(F.lit(1), F.col("tok")), F.lit(2)) * 2 - 1).alias(
            "sign"
        ),
    )
    counts = h.groupBy(id_col, "bucket").agg(F.sum("sign").alias("v"))
    sparse = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("v")))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("bigint")
        ).cast("double"),
    )
    norm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(
        dense, lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
    )
    # left join back so texts with zero tokens keep a (zero) vector —
    # dropping ids silently would break the (id, embedding) contract
    return df.select(id_col).join(sparse, id_col, "left").select(
        id_col,
        F.when(F.col("__m").isNotNull(), unit)
        .otherwise(F.array_repeat(F.lit(0.0), dim))
        .alias(out_col),
    )


def rag_retrieve(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 3,
    chunk_tokens: int = 32,
    overlap: int = 8,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 6,
) -> DataFrame:
    """(qid, nb_id, score, rk, nb_doc_id, nb_chunk_id): top-k corpus
    CHUNKS per query document (the query is its own first chunk's
    embedding), via chunk → hash_embed → IVF ANN. Chunk vec_ids encode
    lineage as doc_id·10000 + chunk_id, decoded back in the output."""
    from bayesiandatafusion_jl_spark.functions.vector import ann_ivf_search

    chunks = chunk_documents(docs, chunk_tokens, overlap)
    cid = (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("doc_id")
    emb = hash_embed(
        chunks.select(cid, F.col("chunk_text").alias("text")),
        dim=dim,
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    q_first = chunk_documents(query_docs, chunk_tokens, overlap).filter(
        F.col("chunk_id") == 0
    )
    q_emb = hash_embed(
        q_first.select("doc_id", F.col("chunk_text").alias("text")), dim=dim
    ).select(F.col("doc_id").alias("qid"), F.col("embedding").alias("qe"))
    hits = ann_ivf_search(
        emb,
        q_emb,
        k=k,
        n_cells=n_cells,
        n_probe=n_probe,
        exclude_self=False,  # query ids live in a different id space
    )
    return hits.select(
        "qid",
        "nb_id",
        "score",
        "rk",
        (F.col("nb_id") / 10_000).cast("bigint").alias("nb_doc_id"),
        F.pmod(F.col("nb_id"), F.lit(10_000)).cast("int").alias("nb_chunk_id"),
    )


@register(
    "q_llm_rag_pipeline",
    oracle=None,  # hash-embedding + IVF are engine-specific; the planted
    # twin top-1 hit rate is measured in tests/test_rag.py and surfaced
    # as the hit column here (rows-only driver check)
    tags=("J3", "J5", "rag", "pipeline"),
    demoted=True,
)
def q_llm_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval over the planted-twin ground truth: the
    corpus is the original documents' chunks; the queries are the
    MUTATED TWINS' first chunks (doc_id % 7 == 0, first token dropped —
    the same ground truth the near-dup ops measure against). A correct
    pipeline retrieves a chunk of the twin's ORIGINAL document at rank
    1: the ``hit`` column records it per query."""
    from bayesiandatafusion_jl_spark.catalog import load_table
    from bayesiandatafusion_jl_spark.functions.dedup import _twin_corpus

    corpus = _twin_corpus(spark, sf_dir)
    docs = corpus.filter(F.col("doc_id") < 1_000_000)
    twins = corpus.filter(F.col("doc_id") >= 1_000_000)
    hits = rag_retrieve(docs, twins)
    return hits.withColumn(
        "hit",
        (F.col("nb_doc_id") == F.col("qid") - 1_000_000) & (F.col("rk") == 1),
    ).orderBy("qid", "rk")
