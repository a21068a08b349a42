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


# --- shared epoch store (r14) ----------------------------------------------
#
# Every persisted family (matview, top-k view, signature/IVF/BM25
# indexes, streaming ingests) carries the same three lifecycle moves:
# write one ``__epoch`` partition (static wipe on a fresh build, dynamic
# self-overwrite on append — the idempotent-replay primitive), guard an
# append against folded/reserved epoch names, and open a compaction
# (allocate the next generation, record the ledger BEFORE any rewrite —
# the conservative crash direction: a replay of a folded shard is
# spuriously rejected, never silently duplicated). r13 shipped four
# near-identical copies of each; these are THE implementations, and the
# families keep only their schemas and merge math.


def write_epoch(
    df,
    data_path: str,
    epoch: str,
    fresh: bool,
    outer_cols: tuple[str, ...] = (),
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as the ``__epoch=<epoch>`` partition of
    ``data_path``. ``fresh=True`` wipes the whole directory (a new
    incarnation); otherwise a DYNAMIC partition overwrite replaces only
    this epoch, so replaying the same (shard, epoch) is byte-idempotent.
    The mode is set explicitly both ways: a session configured with
    partitionOverwriteMode=dynamic would otherwise turn a fresh build
    into a partial overwrite that leaves stale epoch partitions (ghost
    rows) in place. ``outer_cols`` are partition levels OUTSIDE
    ``__epoch`` (the IVF cell_id / BM25 tok_bucket pruning contracts);
    ``sort_cols`` range-sorts the rewrite for footer-stats pruning."""
    from pyspark.sql import functions as F

    staged = df.withColumn("__epoch", F.lit(epoch))
    if sort_cols:
        staged = staged.repartitionByRange(
            *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    staged.write.mode("overwrite").partitionBy(*outer_cols, "__epoch").option(
        "partitionOverwriteMode", "static" if fresh else "dynamic"
    ).parquet(data_path)


def guard_append(
    spark: SparkSession,
    store_dir: str,
    epoch: str,
    reserved: tuple[str, ...] = (),
) -> None:
    """Reject an append under a reserved epoch name (e.g. the view
    families' ``base`` build epoch) or one a past compaction folded
    (``check_not_folded`` — replaying it would duplicate its rows)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        check_not_folded,
    )

    if epoch in reserved:
        raise ValueError(
            f"epoch {epoch!r} is reserved for the initial build; append"
            " under a batch-specific name"
        )
    check_not_folded(spark, store_dir, epoch)


def begin_fold(
    spark: SparkSession,
    store_dir: str,
    data_path: str,
    force: bool = False,
) -> tuple[str, list[str]]:
    """Open a compaction: list the current epochs, allocate the next
    ``compact-<gen>`` name, and record the folded epochs in the ledger
    BEFORE any rewrite touches the data. Nothing is recorded when a
    single epoch would merely be relabeled (``force=True`` when the
    rewrite changes CONTENT — a tombstone purge or stats collapse — so
    even a lone epoch must not be replayable). Returns
    (new_epoch, epochs); the caller performs its own rewrite/swap."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        COMPACT_PREFIX,
        _next_gen,
        record_folded,
    )

    epochs = sorted(
        r["__epoch"]
        for r in spark.read.parquet(data_path)
        .select("__epoch")
        .distinct()
        .collect()
    )
    gen = _next_gen(spark, store_dir)
    new_epoch = f"{COMPACT_PREFIX}{gen}"
    if len(epochs) > 1 or force:
        record_folded(
            spark,
            store_dir,
            [e for e in epochs if not e.startswith(COMPACT_PREFIX)],
            gen,
        )
    return new_epoch, epochs


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
