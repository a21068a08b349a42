"""Media-lake file ingestion: the ``binaryFile`` source path.

queries.py covers the IN-TABLE shape (payloads already in a binary
column). Real media corpora start as FILES — millions of .wav/.bmp/.npy
objects in a bucket — and Spark's built-in ``binaryFile`` source is the
idiomatic reader: one row per file carrying (path, modificationTime,
length, content), scanned partition-parallel with ``pathGlobFilter`` /
``recursiveFileLookup`` pushdown, so listing and reading distribute
without any custom code. This module is that ingestion seam:

- ``read_media_dir``     — binaryFile scan + media_id/kind columns
- ``media_file_features``— per-kind decode dispatch through ONE
  mapInPandas (Arrow batches of payloads; decoded arrays never cross a
  shuffle — only the fixed-width feature row comes out)
- ``write_sample_media_dir`` — deterministic .wav/.bmp/.npy fixture tree

At 100 TB: binary files are never split (a row = a file), so parallelism
is file-count-grain — exactly right for media; tiny-file pathology is
handled UPSTREAM by the same compaction discipline as everything else
(pack small payloads into parquet via queries.media_table's layout and
use the in-table path). ``spark.sql.files.maxPartitionBytes`` governs
how many small files coalesce into one task.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.registry import register

_FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, ndim int,"
    " shape string, dtype string, n_elems bigint, f_mean double,"
    " f_std double"
)


def write_sample_media_dir(base_dir: str, n_per_kind: int = 24) -> str:
    """Deterministic media fixture tree under ``base_dir``:
    ``{wav,bmp,npy}/<id>.<ext>`` — real encoded payloads from the
    codecs, so the ingest path decodes genuinely. Idempotent (same ids →
    same bytes); returns ``base_dir``."""
    from bayesiandatafusion_jl_spark.multimodal.codecs import (
        synth_bmp,
        synth_npy,
        synth_wav,
    )

    for kind, synth in (("wav", synth_wav), ("bmp", synth_bmp), ("npy", synth_npy)):
        d = os.path.join(base_dir, kind)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_kind):
            p = os.path.join(d, f"{i:06d}.{kind}")
            if not os.path.exists(p):
                with open(p, "wb") as fh:
                    fh.write(synth(i))
    return base_dir


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """(media_id, kind, path, n_bytes, content): recursive binaryFile
    scan. media_id is the path hash (stable across re-lists); kind is
    the lowercased extension. ``glob`` pushes a pathGlobFilter into the
    listing so non-media objects are never opened."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.lower(F.element_at(F.split("path", r"\."), -1)).alias("kind"),
        "path",
        F.col("length").cast("bigint").alias("n_bytes"),
        "content",
    )


def media_file_features(media: DataFrame) -> DataFrame:
    """Per-kind decode + feature extraction in ONE mapInPandas pass:
    WAV → (duration-bearing) sample moments, BMP → pixel moments,
    NPY → tensor shape/dtype/moments; unknown kinds pass through with
    null decode fields (never dropped silently — the row count is the
    ingest audit)."""
    import pandas as pd

    def _extract(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        from bayesiandatafusion_jl_spark.multimodal.codecs import (
            bmp_features,
            decode_bmp,
            decode_wav,
            npy_features,
        )

        for pdf in it:
            rows = []
            for mid, kind, nb, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["n_bytes"], pdf["content"]
            ):
                base = {
                    "media_id": int(mid),
                    "kind": kind,
                    "n_bytes": int(nb),
                    "ndim": None,
                    "shape": None,
                    "dtype": None,
                    "n_elems": None,
                    "f_mean": None,
                    "f_std": None,
                }
                buf = bytes(payload)
                if kind == "npy":
                    base.update(
                        {
                            k if k in ("ndim", "shape", "dtype", "n_elems") else f"f_{k}": v
                            for k, v in npy_features(buf).items()
                        }
                    )
                elif kind == "wav":
                    _, samples = decode_wav(buf)
                    flat = samples.astype(np.float64).ravel()
                    base.update(
                        ndim=samples.ndim,
                        shape="x".join(str(s) for s in samples.shape),
                        dtype=str(samples.dtype),
                        n_elems=int(samples.size),
                        f_mean=float(flat.mean()) if samples.size else 0.0,
                        f_std=float(flat.std()) if samples.size else 0.0,
                    )
                elif kind == "bmp":
                    img = decode_bmp(buf)
                    feats = bmp_features(buf)
                    base.update(
                        ndim=img.ndim,
                        shape="x".join(str(s) for s in img.shape),
                        dtype=str(img.dtype),
                        n_elems=int(img.size),
                        f_mean=float(feats["mean_luma"]),
                        f_std=float(feats["contrast"]),
                    )
                rows.append(base)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "ndim", "shape",
                    "dtype", "n_elems", "f_mean", "f_std",
                ],
            )

    return media.select(
        "media_id", "kind", "n_bytes", "content"
    ).mapInPandas(_extract, _FEATURE_SCHEMA)


@register(
    "q_multimodal_ingest",
    oracle=None,  # binaryFile listing order / path hashes are
    # engine-specific; decode correctness is pytest-gated byte-exactly
    tags=("multimodal", "ingest", "binaryFile"),
    demoted=True,
)
def q_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-grain media ingest end-to-end: a deterministic
    .wav/.bmp/.npy fixture tree (written once per sf under /tmp) is
    scanned via the binaryFile source, every payload decoded by its
    real codec, and the per-kind feature summary returned — the shape a
    media-lake onboarding job has."""
    base = f"/tmp/bdf_media_dir/{sf_dir.strip('/').replace('/', '_')}"
    write_sample_media_dir(base)
    feats = media_file_features(read_media_dir(spark, base))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("n_elems").cast("bigint").alias("total_elems"),
            F.round(F.avg("f_std"), 4).alias("mean_std"),
        )
        .orderBy("kind")
    )
