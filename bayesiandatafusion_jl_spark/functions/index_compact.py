"""Epoch compaction for the persisted indexes (small-file maintenance).

Both persisted indexes append one ``__epoch=<shard>`` partition per
ingested shard (``dedup_index`` sigs/buckets, ``vector_index`` postings).
That is what makes appends replay-idempotent — but after a year of daily
shards each index directory holds hundreds of epoch subdirectories of
small files, and at 100 TB the per-file open/footer overhead plus the
file-listing cost of every probe starts to dominate (the same failure
mode ``compact_parquet`` exists for, multiplied by the epoch count).

``compact_epochs`` folds ALL current epochs of one index frame into a
single fresh ``compact-<gen>`` epoch, preserving content exactly:

- file count is sized from the directory's ACTUAL bytes via the Hadoop
  FileSystem API (local/HDFS/object stores alike), never guessed;
- layout contracts survive: the IVF postings keep ``cell_id`` as the
  OUTER partition level (probe-time partition pruning unchanged), the
  bucket frame is re-range-sorted on (band, bucket) so footer-stats
  pruning of probe slices IMPROVES (one sorted run instead of one per
  epoch);
- the rewrite lands in a sibling ``<path>.__compact_tmp`` directory and
  swaps in via FileSystem delete+rename — the index is never rewritten
  in place under a reader. (The delete→rename window is the same
  non-atomicity ``compact_parquet`` documents; a production deployment
  swaps a manifest/catalog pointer above this layer.)

Replay safety is the subtle part. Append idempotence works by
re-overwriting the shard's own epoch partition — but once an epoch has
been FOLDED, its directory no longer exists, so a replayed append would
re-create it and every row in it would now exist twice (once inside the
compacted epoch, once in the re-created one). The index therefore keeps
a ``folded`` ledger frame (one row per folded epoch — bounded by the
number of shards ever appended, a few KB/year) and every append path
rejects an epoch found in it: after compaction, a replay of a folded
shard is an ERROR naming the compaction that folded it, not a silent
duplication. The ledger is written BEFORE the swap: if the job dies
between the two, appends of those epochs are rejected although the data
was not yet folded — the conservative direction (a spurious rejection
is recoverable; silent duplication is not).

Engine-maintenance op: side-effecting, stats-row output, rows-only in
the registry; content preservation, file-count reduction, probe
invariance, and the replay guard are pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.index_meta import index_paths
from bayesiandatafusion_jl_spark.registry import register

COMPACT_PREFIX = "compact-"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _dir_bytes(spark: SparkSession, path: str) -> int:
    fs, hpath, _ = _fs(spark, path)
    return int(fs.getContentSummary(hpath).getLength())


def _swap_dir(spark: SparkSession, tmp_path: str, final_path: str) -> None:
    fs, final_h, jvm = _fs(spark, final_path)
    tmp_h = jvm.org.apache.hadoop.fs.Path(tmp_path)
    if not fs.delete(final_h, True):
        raise IOError(f"compaction swap: could not delete {final_path}")
    if not fs.rename(tmp_h, final_h):
        raise IOError(
            f"compaction swap: could not rename {tmp_path} -> {final_path}"
        )


def folded_epochs(spark: SparkSession, index_dir: str) -> dict[str, int]:
    """The index's folded-epoch ledger as {epoch: generation}; empty if the
    index has never been compacted. Bounded by the number of shards ever
    appended — a driver-side dict is the intended shape."""
    (ledger_path,) = index_paths(index_dir, "folded")
    fs, hpath, _ = _fs(spark, ledger_path)
    if not fs.exists(hpath):
        return {}
    rows = spark.read.parquet(ledger_path).collect()
    return {r["epoch"]: r["gen"] for r in rows}


def reset_ledger(spark: SparkSession, index_dir: str) -> None:
    """Delete the folded-epoch ledger — a FRESH build (overwrite) starts a
    new index incarnation with a new epoch namespace, so the old
    incarnation's fold history must not reject its epochs. Rebuilds over
    the SAME data (``refit_ivf_index``) instead re-record the old epochs
    BEFORE the fresh write via ``rewrite_ledger``, because replaying one
    of those shards against the rebuilt index WOULD duplicate its rows."""
    (ledger_path,) = index_paths(index_dir, "folded")
    fs, hpath, _ = _fs(spark, ledger_path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def record_folded(
    spark: SparkSession, index_dir: str, epochs: list[str], gen: int
) -> None:
    """Append entries to the folded-epoch ledger (compaction and refit use
    this; appends only ever read it)."""
    if not epochs:
        return
    (ledger_path,) = index_paths(index_dir, "folded")
    spark.createDataFrame(
        [(e, gen) for e in sorted(set(epochs))], "epoch string, gen int"
    ).write.mode("append").parquet(ledger_path)


def rewrite_ledger(
    spark: SparkSession, index_dir: str, epochs: list[str], gen: int
) -> None:
    """Replace the ledger with exactly ``epochs`` at ``gen`` in ONE
    overwrite write — the refit crash-ordering contract: the rebased
    epochs must be on disk BEFORE the postings rebuild destroys the old
    layout, so a crash anywhere between the two leaves replayed shards
    REJECTED (the spurious-rejection direction this module prefers),
    never silently accepted as duplicates. An empty list degenerates to
    the fresh-incarnation reset (delete)."""
    if not epochs:
        reset_ledger(spark, index_dir)
        return
    (ledger_path,) = index_paths(index_dir, "folded")
    spark.createDataFrame(
        [(e, gen) for e in sorted(set(epochs))], "epoch string, gen int"
    ).write.mode("overwrite").parquet(ledger_path)


def check_not_folded(spark: SparkSession, index_dir: str, epoch: str) -> None:
    """Raise if ``epoch`` was folded by a past compaction (replaying it
    would duplicate every one of its rows) or impersonates a compacted
    epoch. Every index append path calls this."""
    if epoch.startswith(COMPACT_PREFIX):
        raise ValueError(
            f"shard epoch {epoch!r} uses the reserved {COMPACT_PREFIX!r}"
            " prefix (compaction output epochs); pick another name"
        )
    folded = folded_epochs(spark, index_dir)
    if epoch in folded:
        raise ValueError(
            f"shard epoch {epoch!r} was folded into"
            f" {COMPACT_PREFIX}{folded[epoch]} by a past compaction of"
            f" {index_dir}; replaying it would duplicate its rows —"
            " re-ingest the data under a NEW epoch if it truly is new"
        )


def compact_epochs(
    spark: SparkSession,
    data_path: str,
    new_epoch: str,
    outer_cols: tuple[str, ...] = (),
    sort_cols: tuple[str, ...] = (),
    target_mb: int = 128,
    transform=None,
) -> tuple[list[str], int, int, int]:
    """Fold every ``__epoch`` partition under ``data_path`` into the single
    ``new_epoch``, preserving rows exactly. Returns
    (folded_epochs, files_before, files_after, bytes).

    ``outer_cols`` are partition levels OUTSIDE ``__epoch`` (the IVF
    ``cell_id``) — they are preserved so partition pruning contracts
    survive. ``sort_cols`` re-range-sorts the rewrite (the bucket frame's
    footer-stats layout). File count targets ``target_mb`` per file from
    the directory's actual bytes; with outer partition columns each task
    holds a hash slice of (outer, id) rows, so a huge cell splits across
    tasks instead of producing one monolithic file.

    ``transform`` (r13): optional frame→frame hook applied to the folded
    body before the rewrite — the tombstone-purge seam. Compaction is
    exactly the moment a physical delete is free (every row is being
    rewritten anyway), so the index compactors pass an anti-join here.
    A non-None transform FORCES the rewrite even for a single epoch
    (content is changing, not just layout).
    """
    df = spark.read.parquet(data_path)
    epochs = sorted(
        r["__epoch"] for r in df.select("__epoch").distinct().collect()
    )
    files_before = len(df.inputFiles())
    total_bytes = _dir_bytes(spark, data_path)
    if len(epochs) <= 1 and transform is None:
        # nothing to fold — keep the existing (possibly already compacted)
        # layout rather than churn files
        return [], files_before, files_before, total_bytes

    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    body = df.drop("__epoch")
    if transform is not None:
        body = transform(body)
    body = body.withColumn("__epoch", F.lit(new_epoch))
    if sort_cols:
        body = body.repartitionByRange(
            n_files, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    elif outer_cols:
        # hash on the outer partition cols plus the remaining payload
        # columns: rows for one outer value stay routed to its directory by
        # partitionBy below, while oversized outer values still spread
        # across tasks (bounded file sizes) instead of one file per cell
        spread = [F.col(c) for c in outer_cols] + [
            F.col(c) for c in body.columns if c not in outer_cols
        ]
        body = body.repartition(max(n_files, 1), *spread)
    else:
        body = body.repartition(n_files)

    tmp_path = data_path.rstrip("/") + ".__compact_tmp"
    body.write.mode("overwrite").partitionBy(*outer_cols, "__epoch").parquet(
        tmp_path
    )
    _swap_dir(spark, tmp_path, data_path)
    files_after = len(spark.read.parquet(data_path).inputFiles())
    return epochs, files_before, files_after, total_bytes


def _next_gen(spark: SparkSession, index_dir: str) -> int:
    folded = folded_epochs(spark, index_dir)
    return (max(folded.values()) + 1) if folded else 0


def _stats_row(
    spark: SparkSession,
    frames: list[tuple[str, list[str], int, int, int]],
) -> DataFrame:
    return spark.createDataFrame(
        [
            (name, len(eps), files_b, files_a, int(b))
            for name, eps, files_b, files_a, b in frames
        ],
        "frame string, epochs_folded int, files_before int,"
        " files_after int, bytes long",
    )


_TMP_SUFFIXES = (".__compact_tmp", ".__migrate_tmp")


def vacuum_store(spark: SparkSession, index_dir: str) -> DataFrame:
    """Delete crashed-maintenance residue from a persisted store
    (VERDICT r14 #8): sibling ``.__compact_tmp`` / ``.__migrate_tmp``
    directories a killed compaction/migration left behind (they
    otherwise self-heal only when the NEXT maintenance op of the same
    dataset overwrites them), and ``_temporary`` output-committer
    leftovers a killed write abandoned at its target directory — found
    by a depth-bounded walk, because epoch-targeted writes (e.g. the
    pipeline's ``shards/__epoch=<e>``) leave their residue BELOW the
    dataset root. Returns one row per deleted path with its reclaimed
    bytes (empty frame = the store was clean).

    Single-writer discipline, same as compaction itself: never run a
    vacuum concurrently with a live maintenance op on this store — the
    tmp dir IS that op's in-flight output. Ledgered data directories are
    never touched (the suffix/_temporary allowlist is the whole delete
    surface), so a vacuum of a healthy store is a no-op."""
    fs, root_h, _ = _fs(spark, index_dir)
    deleted: list[tuple[str, int]] = []

    def _reclaim(path, rel: str) -> None:
        nbytes = int(fs.getContentSummary(path).getLength())
        fs.delete(path, True)
        deleted.append((rel, nbytes))

    def _walk(dir_h, rel: str, depth: int) -> None:
        # bounded walk: committer residue sits at a write's TARGET dir,
        # which for epoch/partitioned writes is one or two levels below
        # the dataset (e.g. shards/__epoch=<e>/_temporary) — depth 3
        # covers every current family layout without a full-tree crawl
        for st in fs.listStatus(dir_h):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            child_rel = f"{rel}/{name}" if rel else name
            if name == "_temporary":
                _reclaim(st.getPath(), child_rel)
            elif depth == 0 and name.endswith(_TMP_SUFFIXES):
                _reclaim(st.getPath(), child_rel)
            elif depth < 3:
                _walk(st.getPath(), child_rel, depth + 1)

    if fs.exists(root_h):
        _walk(root_h, "", 0)
    return spark.createDataFrame(
        deleted, "path string, bytes bigint"
    )


def compact_ivf_index(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> DataFrame:
    """Fold the IVF postings' epochs into one ``compact-<gen>`` epoch.
    ``cell_id`` stays the outer partition level, so probe-time partition
    pruning (``cell_id IN (probed)``) is untouched. Returns the per-frame
    stats frame; records the folded epochs in the ledger BEFORE the swap
    (see module docstring for the crash-ordering rationale).

    Tombstones are applied PHYSICALLY during the rewrite (r13): the data
    is being rewritten anyway, so the purge is free — deleted vec_ids
    leave the postings and the tombstone set is cleared AFTER the swap
    (crash between the two: rows already gone, the anti-join no-ops —
    the safe direction). Probes are unchanged (they already excluded
    tombstoned ids); ``ivf_index_stats`` stops counting them."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        begin_fold,
        clear_tombstones,
        tombstone_purge,
    )

    (post_path,) = index_paths(index_dir, "postings")
    purge = tombstone_purge(spark, index_dir, "vec_id")
    # force on purge: the rewrite changes content even for a lone epoch,
    # and a replay of it would resurrect the purged rows
    new_epoch, _ = begin_fold(
        spark, index_dir, post_path, force=purge is not None
    )
    stats = compact_epochs(
        spark, post_path, new_epoch, outer_cols=("cell_id",),
        target_mb=target_mb, transform=purge,
    )
    if purge is not None:
        clear_tombstones(spark, index_dir)
    return _stats_row(spark, [("postings", *stats)])


def compact_signature_index(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> DataFrame:
    """Fold the signature index's epochs (both frames share the epoch set)
    into one ``compact-<gen>`` epoch. The bucket frame is re-range-sorted
    on (band, bucket), so after compaction a probe slice prunes against
    ONE sorted run instead of one per epoch. Ledger written before the
    swap, same rationale as the IVF path.

    Tombstoned doc_ids are purged physically from BOTH frames during the
    rewrite; the tombstone set is cleared only after both swaps (a crash
    between them leaves the ids still masked — never resurfaced)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        begin_fold,
        clear_tombstones,
        tombstone_purge,
    )

    sig_path, bucket_path = index_paths(index_dir, "sigs", "buckets")
    purge = tombstone_purge(spark, index_dir, "doc_id")
    new_epoch, _ = begin_fold(
        spark, index_dir, sig_path, force=purge is not None
    )
    sig_stats = compact_epochs(
        spark, sig_path, new_epoch, target_mb=target_mb, transform=purge
    )
    bucket_stats = compact_epochs(
        spark, bucket_path, new_epoch, sort_cols=("band", "bucket"),
        target_mb=target_mb, transform=purge,
    )
    if purge is not None:
        clear_tombstones(spark, index_dir)
    return _stats_row(
        spark, [("sigs", *sig_stats), ("buckets", *bucket_stats)]
    )


@register(
    "q_index_compact",
    oracle=None,  # side-effecting maintenance op over engine-specific
    # indexes; content preservation, probe invariance, and the folded-epoch
    # replay guard are pytest-gated
    tags=("maintenance", "incremental"),
    demoted=True,
)
def q_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance: build the signature index, append two shard epochs,
    compact, and return the stats frame (one row per index frame). The
    rows-only driver check pins the end-to-end path; tests assert content
    equality, file-count reduction, probe invariance, and the replay
    guard."""
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        write_signature_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    s1 = docs.filter(F.col("doc_id") % 3 == 1)
    s2 = docs.filter(F.col("doc_id") % 3 == 2)
    index_dir = f"/tmp/bdf_compact_index/{sf_dir.strip('/').replace('/', '_')}"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    write_signature_index(base, index_dir)
    write_signature_index(s1, index_dir, mode="append", epoch="shard-1")
    write_signature_index(s2, index_dir, mode="append", epoch="shard-2")
    return compact_signature_index(spark, index_dir)
