"""bayesiandatafusion_jl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``jaak-s/BayesianDataFusion.jl`` (BPMF + Macau Bayesian factorization with
side information), re-expressed Spark-first, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required by the north star.

Architecture (SURVEY.md is the blueprint):

- ``session``    — SparkSession factory + scale-aware config.
- ``catalog``    — parquet loaders for the canonical tables, temp-view
                   registration, the events ns-timestamp fix.
- ``registry``   — the QuerySpec registry binding every operator to a
                   (Spark callable, DuckDB oracle SQL) pair; this is what
                   ``__spark_entry__.py`` exposes to the driver.
- ``operators/`` — relational surface (scans, filters, joins, aggregates,
                   windows, sorts, set ops, temporal joins).
- ``functions/`` — scalar/vector/text functions incl. dedup + similarity.
- ``ml/``        — the reference's heart: BPMF/Macau Gibbs samplers built
                   from relational ops + Arrow-vectorized kernels.
- ``streaming/`` — Structured Streaming windows/sessionization/watermark.
- ``multimodal/``— binary-column plumbing (decode stubbed; schema real).

Provenance note: ``/root/reference`` was empty in every session (SURVEY §0);
capabilities derive from the published upstream API and the BPMF (ICML'08)
and Macau (MLSP'17) papers. Citations in docstrings use the
``[upstream:<path> — UNVERIFIED]`` / ``[paper:...]`` convention of SURVEY §0.
"""

__version__ = "0.1.0"

from bayesiandatafusion_jl_spark.registry import all_oracles, all_queries, get_query

# The reference's user-facing names (``macau(rd; ...)``, ``bpmf``,
# ``RelationData``) re-exported at the package root so an upstream user's
# ``using BayesianDataFusion; macau(rd)`` maps to
# ``from bayesiandatafusion_jl_spark import macau; macau(spark, rd)``.
# Lazy (PEP 562): ``import bayesiandatafusion_jl_spark`` must stay cheap —
# the ML stack (numpy kernels, trainer) loads only when first touched.
_LAZY = {
    "macau": ("bayesiandatafusion_jl_spark.ml.bpmf", "macau"),
    "bpmf": ("bayesiandatafusion_jl_spark.ml.bpmf", "bpmf"),
    "MacauTrainer": ("bayesiandatafusion_jl_spark.ml.bpmf", "MacauTrainer"),
    "TrainResult": ("bayesiandatafusion_jl_spark.ml.bpmf", "TrainResult"),
    "RelationData": ("bayesiandatafusion_jl_spark.ml.relation", "RelationData"),
    "get_spark": ("bayesiandatafusion_jl_spark.session", "get_spark"),
    # frame-level similarity search (north-star surface)
    "knn_topk": ("bayesiandatafusion_jl_spark.functions.vector", "knn_topk"),
    "ann_ivf_search": ("bayesiandatafusion_jl_spark.functions.vector", "ann_ivf_search"),
    # end-of-pipeline dedup composition
    "lsh_near_dup_pairs": (
        "bayesiandatafusion_jl_spark.functions.dedup",
        "lsh_near_dup_pairs",
    ),
    "dedup_keep_representatives": (
        "bayesiandatafusion_jl_spark.functions.graph",
        "dedup_keep_representatives",
    ),
    # MCMC convergence diagnostics over stored posterior chains
    "rhat": ("bayesiandatafusion_jl_spark.ml.diagnostics", "rhat"),
    "ess": ("bayesiandatafusion_jl_spark.ml.diagnostics", "ess"),
    # skew-resistant equi-join
    "salted_join": ("bayesiandatafusion_jl_spark.operators.joins", "salted_join"),
    # r8: incremental dedup index + persisted IVF
    "write_signature_index": (
        "bayesiandatafusion_jl_spark.functions.dedup_index",
        "write_signature_index",
    ),
    "dedup_incremental": (
        "bayesiandatafusion_jl_spark.functions.dedup_index",
        "dedup_incremental",
    ),
    "write_ivf_index": (
        "bayesiandatafusion_jl_spark.functions.vector_index",
        "write_ivf_index",
    ),
    "ann_ivf_query_index": (
        "bayesiandatafusion_jl_spark.functions.vector_index",
        "ann_ivf_query_index",
    ),
    # r8: corpus rewrite + packing + exact heavy hitters
    "remove_duplicated_spans": (
        "bayesiandatafusion_jl_spark.functions.text",
        "remove_duplicated_spans",
    ),
    "pack_sequences": ("bayesiandatafusion_jl_spark.functions.packing", "pack_sequences"),
    "pack_chunks": ("bayesiandatafusion_jl_spark.functions.packing", "pack_chunks"),
    "heavy_hitters": (
        "bayesiandatafusion_jl_spark.operators.aggregates",
        "heavy_hitters",
    ),
    # r8: table maintenance + layouts
    "merge_upsert": ("bayesiandatafusion_jl_spark.operators.maintenance", "merge_upsert"),
    "scd2_history": ("bayesiandatafusion_jl_spark.operators.maintenance", "scd2_history"),
    "compact_parquet": (
        "bayesiandatafusion_jl_spark.operators.maintenance",
        "compact_parquet",
    ),
    "write_zordered": ("bayesiandatafusion_jl_spark.sources.io", "write_zordered"),
    "write_range_sorted": (
        "bayesiandatafusion_jl_spark.sources.io",
        "write_range_sorted",
    ),
    # r8: PII scrub + deterministic training-shard shuffle
    "redact_pii": ("bayesiandatafusion_jl_spark.functions.text", "redact_pii"),
    "unigram_nll": ("bayesiandatafusion_jl_spark.functions.text", "unigram_nll"),
    "shuffle_shards": (
        "bayesiandatafusion_jl_spark.operators.sampling",
        "shuffle_shards",
    ),
    "write_shuffled_shards": (
        "bayesiandatafusion_jl_spark.sources.io",
        "write_shuffled_shards",
    ),
    # r8: data-selection + semantic dedup
    "dsir_logweights": (
        "bayesiandatafusion_jl_spark.functions.text",
        "dsir_logweights",
    ),
    "semdedup": ("bayesiandatafusion_jl_spark.functions.vector", "semdedup"),
    "bigram_nll": ("bayesiandatafusion_jl_spark.functions.text", "bigram_nll"),
    # r14: persisted pipeline lifecycle + quality-model artifact +
    # live anomaly scoring
    "build_pipeline": (
        "bayesiandatafusion_jl_spark.functions.pipeline_store",
        "build_pipeline",
    ),
    "read_pipeline_manifest": (
        "bayesiandatafusion_jl_spark.functions.pipeline_store",
        "read_pipeline_manifest",
    ),
    "read_shards": (
        "bayesiandatafusion_jl_spark.functions.pipeline_store",
        "read_shards",
    ),
    "append_pipeline_shard": (
        "bayesiandatafusion_jl_spark.functions.pipeline_store",
        "append_pipeline_shard",
    ),
    "verify_pipeline": (
        "bayesiandatafusion_jl_spark.functions.pipeline_store",
        "verify_pipeline",
    ),
    "pipeline_ingest_stream": (
        "bayesiandatafusion_jl_spark.streaming.pipelines",
        "pipeline_ingest_stream",
    ),
    "save_quality_model": (
        "bayesiandatafusion_jl_spark.functions.quality_model",
        "save_quality_model",
    ),
    "load_quality_model": (
        "bayesiandatafusion_jl_spark.functions.quality_model",
        "load_quality_model",
    ),
    "anomaly_stream": (
        "bayesiandatafusion_jl_spark.streaming.pipelines",
        "anomaly_stream",
    ),
    "kl_drift_stream": (
        "bayesiandatafusion_jl_spark.streaming.pipelines",
        "kl_drift_stream",
    ),
    "quality_stream": (
        "bayesiandatafusion_jl_spark.streaming.pipelines",
        "quality_stream",
    ),
    "set_similarity_join": (
        "bayesiandatafusion_jl_spark.functions.fuzzy",
        "set_similarity_join",
    ),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))


__all__ = [
    "all_oracles", "all_queries", "get_query", "__version__",
    "macau", "bpmf", "MacauTrainer", "TrainResult", "RelationData", "get_spark",
    "knn_topk", "ann_ivf_search", "lsh_near_dup_pairs", "dedup_keep_representatives",
    "rhat", "ess", "salted_join",
    "write_signature_index", "dedup_incremental",
    "write_ivf_index", "ann_ivf_query_index",
    "remove_duplicated_spans", "pack_sequences", "pack_chunks", "heavy_hitters",
    "merge_upsert", "scd2_history", "compact_parquet",
    "write_zordered", "write_range_sorted",
    "redact_pii", "shuffle_shards", "write_shuffled_shards", "unigram_nll",
    "dsir_logweights", "semdedup", "bigram_nll",
    "build_pipeline", "read_pipeline_manifest", "read_shards",
    "append_pipeline_shard", "verify_pipeline", "pipeline_ingest_stream",
    "save_quality_model", "load_quality_model", "anomaly_stream",
    "kl_drift_stream", "quality_stream",
    "set_similarity_join",
]
