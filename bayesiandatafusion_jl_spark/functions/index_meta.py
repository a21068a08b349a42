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


# --- tombstones (r12): shared logical-delete primitive ---------------------
#
# An index's ``tombstones`` dataset holds the ids of logically-deleted
# entries (vec_id for the IVF postings, doc_id for the signature index).
# Probes anti-join it (broadcast — bounded by deletes since the last
# physical apply); a rebuild applies it physically and clears AFTER the
# successful write (crash direction: keep hiding, never resurface).


def tombstones_path(index_dir: str) -> str:
    (p,) = index_paths(index_dir, "tombstones")
    return p


def append_tombstones(spark: SparkSession, index_dir: str, ids) -> None:
    """Append deleted ids (list of ints, or a 1-column DataFrame — the
    frame form never routes ids through the driver). Re-appending the
    same ids is harmless: consumers read DISTINCT."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    if isinstance(ids, DataFrame):
        frame = ids.toDF("id").select(F.col("id").cast("bigint"))
    else:
        rows = [(int(v),) for v in ids]
        if not rows:
            return
        frame = spark.createDataFrame(rows, "id bigint")
    frame.write.mode("append").parquet(tombstones_path(index_dir))


def anti_join_tombstones(
    spark: SparkSession, index_dir: str, df, on_col: str
):
    """``df`` minus rows whose ``on_col`` is tombstoned; no-op when the
    index has none."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    path = tombstones_path(index_dir)
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return df
    tombs = spark.read.parquet(path).select("id").distinct()
    return df.join(
        F.broadcast(tombs), df[on_col] == tombs["id"], "left_anti"
    )


def has_tombstones(spark: SparkSession, index_dir: str) -> bool:
    """Whether the index carries logical deletes awaiting a physical
    apply (compaction / rebuild)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    path = tombstones_path(index_dir)
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def tombstone_purge(spark: SparkSession, index_dir: str, on_col: str):
    """A frame→frame transform that drops tombstoned rows — the
    ``compact_epochs(transform=...)`` seam. Returns None when the index
    has no tombstones, so callers can branch on "will this compaction
    change content" in one place."""
    if not has_tombstones(spark, index_dir):
        return None

    def _purge(df):
        return anti_join_tombstones(spark, index_dir, df, on_col)

    return _purge


def clear_tombstones(spark: SparkSession, index_dir: str) -> None:
    """Drop the tombstone set — call AFTER a successful rebuild whose
    input already excluded the ids (or a fresh build starting a new id
    namespace). Clearing after, not before, keeps the safe crash
    direction: mid-rebuild the tombstones still filter the live old
    data; post-rebuild they name ids that no longer exist (no-op)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    path = tombstones_path(index_dir)
    fs, hpath, _ = _fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)
