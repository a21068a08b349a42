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
    "q_multimodal_pipeline",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id, 'text/plain' AS media_type,
             octet_length(encode(text)) AS n_bytes,
             lang AS meta_lang, text
      FROM documents
    ),
    f AS (
      SELECT doc_id, media_type, n_bytes, meta_lang, text,
             UNNEST(range(0, length(text) // {64})) AS frame_idx
      FROM meta
    )
    SELECT doc_id, media_type, n_bytes, meta_lang, frame_idx,
           md5(substr(text, frame_idx * {64} + 1, {64})) AS frame_md5
    FROM f
    WHERE frame_idx % {2} = 0
    """,
    tags=("multimodal",),
)
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline, driver-checked end-to-end: binary media table
    (opaque payload + typed metadata) → frame sampling via mapInPandas
    (one-to-many Arrow batches; video-style fixed-length frames, every
    2nd kept) → per-frame checksum joined with the typed metadata.

    Covers the metadata-scan capability (q_multimodal_meta, demoted) and
    the one-to-many mapInPandas shape (q_multimodal_framesample, demoted)
    in one oracle row. The decode/resize steps remain demoted rows-only
    specs with pytest coverage — REAL codecs for the uncompressed
    formats (q_multimodal_decode / q_multimodal_thumbnail over WAV/BMP,
    multimodal/codecs.py), deterministic byte-fakes only where a format
    genuinely needs absent libraries (JPEG/MP3). The join is on doc_id against a
    map-only metadata projection — at scale both sides are co-partitioned
    reads of the same table, so AQE plans a local join."""
    frames = q_multimodal_framesample(spark, sf_dir)
    meta = media_table(spark, sf_dir).select(
        "doc_id", "media_type", "n_bytes", "meta_lang"
    )
    return frames.join(meta, "doc_id").select(
        "doc_id", "media_type", "n_bytes", "meta_lang", "frame_idx", "frame_md5"
    )


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           lang AS meta_lang
    FROM documents
    """,
    tags=("multimodal",),
    demoted=True,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: payload sizes + typed metadata, fully
    relational (the blob itself never leaves the executors)."""
    return media_table(spark, sf_dir).select(
        "doc_id", "media_type", "n_bytes", "meta_lang"
    )


@register("q_multimodal_features", oracle=None, tags=("multimodal",), demoted=True)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode → feature extraction over binary payloads via
    mapInPandas (rows-only check; deterministic fake features)."""
    return extract_features(media_table(spark, sf_dir))


FRAME_LEN, FRAME_STRIDE = 64, 2  # chars per frame; sample every 2nd frame


@register(
    "q_multimodal_framesample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             UNNEST(range(0, length(text) // {FRAME_LEN})) AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, frame_idx * {FRAME_LEN} + 1, {FRAME_LEN})) AS frame_md5
    FROM f
    WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
    tags=("multimodal",),
    demoted=True,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: a video-style payload decomposed into fixed-length
    frames, keeping every ``FRAME_STRIDE``-th — the one-to-many mapInPandas
    shape (each input row yields 0..n output rows).

    Frames are *character* slices so the DuckDB oracle can replicate with
    substr (DuckDB 1.0 has no BLOB substring); a real video pipeline slices
    bytes at container boundaries with the identical batch shape. md5 of
    each frame is the cross-engine checksum.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_frame = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = len(text) // FRAME_LEN
                for fi in range(0, n_frames, FRAME_STRIDE):
                    out_id.append(doc_id)
                    out_idx.append(fi)
                    out_frame.append(text[fi * FRAME_LEN:(fi + 1) * FRAME_LEN])
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    frames = docs.mapInPandas(
        _frames, schema="doc_id bigint, frame_idx bigint, frame string"
    )
    return frames.select(
        "doc_id", "frame_idx", F.md5(F.encode("frame", "utf-8")).alias("frame_md5")
    )


RESIZE_W, RESIZE_FACTOR = 64, 2  # byte-grid width; 2x2 block-mean downsample


@register("q_multimodal_resize", oracle=None, tags=("multimodal",), demoted=True)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style resize: payload bytes as an H×{RESIZE_W} grid, 2×2
    block-mean downsampled (numpy, Arrow-batched). Rows-only check — the
    deterministic output is summarized as (doc_id, in/out dims, checksum).

    Real deployments put PIL/opencv where the numpy block-mean is; the
    batch shape (binary in → binary out + dims) is the production one.
    """
    import numpy as np

    media = media_table(spark, sf_dir)

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, f = RESIZE_W, RESIZE_FACTOR
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                h = len(buf) // w
                if h < f:
                    rows.append((doc_id, h, w, 0, 0, b""))
                    continue
                img = buf[: h * w].reshape(h, w)
                h2, w2 = (h // f) * f, (w // f) * f
                small = (
                    img[:h2, :w2]
                    .reshape(h2 // f, f, w2 // f, f)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                rows.append(
                    (doc_id, h, w, small.shape[0], small.shape[1], small.tobytes())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "in_h", "in_w", "out_h", "out_w", "resized"],
            )

    out = media.mapInPandas(
        _resize,
        schema=(
            "doc_id bigint, in_h int, in_w int, out_h int, out_w int, "
            "resized binary"
        ),
    )
    return out.select(
        "doc_id", "in_h", "in_w", "out_h", "out_w",
        F.md5("resized").alias("resized_md5"),
        F.octet_length("resized").alias("resized_bytes"),
    )


def synth_media(spark: SparkSession, sf_dir: str, n: int = 200) -> DataFrame:
    """Deterministic REAL-format media table: per doc_id, a PCM16 WAV
    tone and a 24-bit BMP gradient (multimodal/codecs.py — pure-numpy
    encoders running executor-side in mapInPandas; parameters keyed on
    doc_id so every payload is reproducible and every feature has a
    closed form)."""
    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        synth_bmp,
        synth_wav,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id").limit(n)

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                rows.append((int(d), "audio/wav", synth_wav(int(d))))
                rows.append((int(d), "image/bmp", synth_bmp(int(d))))
            out = pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])
            out["n_bytes"] = out["payload"].map(len)
            yield out

    return ids.mapInPandas(
        _gen, "doc_id bigint, media_type string, payload binary, n_bytes bigint"
    )


@register(
    "q_multimodal_decode",
    oracle=None,  # WAV/BMP parsing is not SQL-expressible; features are
    # verified against closed forms (sine RMS, gradient luma) and
    # byte-exact round-trips in tests/test_codecs.py — rows-only check
    tags=("multimodal", "codecs"),
    demoted=True,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode over real formats: the synthetic WAV/BMP media table
    decoded executor-side (mapInPandas, Arrow batches) into typed
    features — duration/RMS/peak/zero-crossings for audio, dimensions/
    luminance/contrast for images. The compressed-format decode
    (JPEG/MP3) stays stubbed (no codec libs in this container); THIS
    path exercises genuine header parsing, padding arithmetic, and
    malformed-input rejection on formats that need none."""
    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        bmp_features,
        wav_features,
    )

    media = synth_media(spark, sf_dir)

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt == "audio/wav":
                    f = wav_features(bytes(payload))
                    rows.append(
                        (int(d), mt, f["duration_s"], f["rms"], f["peak"],
                         f["zcr"], None, None)
                    )
                else:
                    f = bmp_features(bytes(payload))
                    rows.append(
                        (int(d), mt, None, None, None, None,
                         float(f["width"] * f["height"]), f["mean_luma"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "duration_s", "rms",
                         "peak", "zcr", "pixels", "mean_luma"],
            )

    return media.mapInPandas(
        _decode,
        "doc_id bigint, media_type string, duration_s double, rms double,"
        " peak double, zcr double, pixels double, mean_luma double",
    )


@register(
    "q_multimodal_thumbnail",
    oracle=None,  # real BMP decode/re-encode is not SQL-expressible;
    # executor≡driver agreement + round-trip exactness in tests
    tags=("multimodal", "codecs"),
    demoted=True,
)
def q_multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL thumbnailing over real images: decode each synthetic BMP
    (multimodal/codecs.py), nearest-neighbor resize to 16×16, re-encode
    as a valid BMP — the bandwidth-bound preprocessing step a
    multimodal lake runs before feature extraction, here with genuine
    header parsing and padding arithmetic on both sides of the resize.
    Output: source dims + thumbnail checksum/bytes (every thumbnail is
    itself a decodable BMP — pinned in tests)."""
    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    media = synth_media(spark, sf_dir).filter(
        F.col("media_type") == "image/bmp"
    )

    def _thumb(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                thumb = encode_bmp(resize_nearest(img, 16, 16))
                rows.append(
                    (int(d), img.shape[0], img.shape[1], len(thumb), thumb)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "in_h", "in_w", "thumb_bytes", "thumb"]
            )

    out = media.mapInPandas(
        _thumb,
        "doc_id bigint, in_h int, in_w int, thumb_bytes bigint, thumb binary",
    )
    return out.select(
        "doc_id", "in_h", "in_w", "thumb_bytes",
        F.md5("thumb").alias("thumb_md5"),
    )
