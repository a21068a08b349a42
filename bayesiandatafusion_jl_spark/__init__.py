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

__all__ = ["all_oracles", "all_queries", "get_query", "__version__"]
