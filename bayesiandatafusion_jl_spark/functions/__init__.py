"""Function surface: scalar (§2.H), vector/similarity (H4, J3, J4),
text/dedup (J1–J6 + text analysis)."""

from bayesiandatafusion_jl_spark.functions import (  # noqa: F401
    bpe,
    chunking,
    dedup,
    dedup_index,
    fuzzy,
    graph,
    index_compact,
    index_stats,
    mllib_lsh,
    packing,
    pipeline,
    quality_model,
    rag,
    scalar,
    sparse_retrieval,
    text,
    vector,
    vector_index,
    vector_pq,
)
