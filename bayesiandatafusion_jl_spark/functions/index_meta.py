"""Shared layout + meta-validation helpers for persisted indexes
(``dedup_index``'s signature index, ``vector_index``'s inverted file).

An index directory is a set of named parquet frames plus a one-row
``meta`` frame pinning the build parameters; any query or append against
the index validates its own parameters against ``meta`` so an index
written under one configuration can never be silently probed or extended
under another.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def index_paths(index_dir: str, *names: str) -> tuple[str, ...]:
    d = index_dir.rstrip("/")
    return tuple(f"{d}/{n}" for n in names)


def write_meta(spark: SparkSession, meta_path: str, mode: str, **params: int) -> None:
    cols = sorted(params)
    spark.createDataFrame(
        [tuple(int(params[c]) for c in cols)],
        ", ".join(f"{c} int" for c in cols),
    ).write.mode(mode).parquet(meta_path)


def check_meta(
    spark: SparkSession, meta_path: str, consequence: str, **expected: int
) -> None:
    """Raise ValueError naming the stored vs requested parameters when the
    index's meta row disagrees with ``expected``."""
    got = spark.read.parquet(meta_path).collect()[0]
    cols = sorted(expected)
    have = tuple(got[c] for c in cols)
    want = tuple(int(expected[c]) for c in cols)
    if have != want:
        names = ", ".join(cols)
        raise ValueError(
            f"index at {meta_path} was written with ({names})={have}, "
            f"request asked for {want} — {consequence}"
        )


def read_meta(spark: SparkSession, meta_path: str):
    return spark.read.parquet(meta_path).collect()[0]
