"""Multimodal binary-column operators.

No binary testdata table exists, so blobs are materialized from
``documents.text`` (utf-8 encode) — the point is the *plumbing*: binary
columns flow through scans, filters and pandas-UDF batches with typed
metadata alongside. The decode step (image/audio codecs) is stubbed behind
``decode_stub`` with a deterministic fake, clearly marked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

# Schema of the "media" table the plumbing operates on: opaque payload +
# typed metadata — the layout a 100 TB multimodal lake would use (payload
# in parquet binary columns or pointers to object-store blobs).
MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "n_bytes BIGINT, meta_lang STRING"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "feat0 DOUBLE, feat1 DOUBLE, feat2 DOUBLE"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the binary media table from documents (utf-8 payloads)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
        F.col("lang").alias("meta_lang"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """STUB decode/feature-extract (deterministic fake).

    Real deployments plug an image/audio decoder here (PIL/librosa/ffmpeg —
    not installed in this container). The fake derives three stable
    features from the raw bytes so the pipeline is end-to-end testable:
    byte mean, byte max, length mod 251.
    """
    if not payload:
        return [0.0, 0.0, 0.0]
    return [
        float(sum(payload)) / len(payload),
        float(max(payload)),
        float(len(payload) % 251),
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds the binary payloads of ~10k rows;
    the decode runs vectorized per batch. At 100 TB this is the canonical
    shape — partition by storage locality, decode in-place, never collect.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat0": feats.map(lambda f: f[0]),
                    "feat1": feats.map(lambda f: f[1]),
                    "feat2": feats.map(lambda f: f[2]),
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           lang AS meta_lang
    FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: payload sizes + typed metadata, fully
    relational (the blob itself never leaves the executors)."""
    return media_table(spark, sf_dir).select(
        "doc_id", "media_type", "n_bytes", "meta_lang"
    )


@register("q_multimodal_features", oracle=None, tags=("multimodal",))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode → feature extraction over binary payloads via
    mapInPandas (rows-only check; deterministic fake features)."""
    return extract_features(media_table(spark, sf_dir))
