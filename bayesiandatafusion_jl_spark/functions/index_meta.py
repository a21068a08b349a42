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


def driver_frame(spark: SparkSession, rows: list, schema: str):
    """One-partition DataFrame from driver-built rows — THE way to write
    a KB-sized artifact as a single parquet file. The naive
    ``createDataFrame(rows).coalesce(1)`` evaluates every one of the
    defaultParallelism pickled slices SEQUENTIALLY inside the single
    post-coalesce task — one Python-worker round-trip per slice,
    measured ~5 s per one-row write at local[32] (vs 0.5 s uncoalesced
    and ~0.27 s for this form); a single parallelize slice keeps the
    one-file layout at ONE worker round-trip."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )


def write_meta(spark: SparkSession, meta_path: str, mode: str, **params: int) -> None:
    cols = sorted(params)
    # one part file: reads faster and keeps the probe-side artifact
    # fingerprint (below) one stat call (guide §6 small files)
    driver_frame(
        spark,
        [tuple(int(params[c]) for c in cols)],
        ", ".join(f"{c} int" for c in cols),
    ).write.mode(mode).parquet(meta_path)


def check_meta(
    spark: SparkSession, meta_path: str, consequence: str, **expected: int
) -> None:
    """Raise ValueError naming the stored vs requested parameters when the
    index's meta row disagrees with ``expected``."""
    got = read_meta(spark, meta_path)
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
    return memo_artifact(
        spark,
        meta_path,
        lambda: spark.read.parquet(meta_path).collect()[0],
    )


# --- bounded-artifact memo (r15 optimization) -------------------------------
#
# Every probe against a persisted index starts by collecting its BOUNDED
# planning artifacts — the one-row meta pin, the IVF centers, the PQ
# codebooks/rotation. Each collect is a full Spark job (measured 0.5-1.2 s
# per artifact on the bench shapes; an IVF-PQ probe paid ~1-2 s of its
# 3.6 s total in these loads), and a serving session replays them
# unchanged on every query batch. This memo keys the loaded value on the
# artifact's FILE LISTING — (path, mtime, size) of every file under the
# artifact directory — so any rewrite (a fresh build, a refit, a
# compaction's tmp+swap, an external writer) changes the fingerprint and
# forces a reload; nothing is ever served from a memo whose files moved.
# Appends never touch these directories (postings/stats only), so the
# memo correctly survives them. Values must be treated as immutable by
# callers (they already are: every consumer copies into numpy/literals).
#
# Staleness bound: two rewrites of the same artifact within one mtime
# granule AND byte-identical sizes could alias — local stat() reports
# nanosecond mtimes and a parquet write takes milliseconds, so the window
# is unreachable in practice (the Hadoop path reports milliseconds, same
# argument). Results caching this is NOT: the memo holds index-build
# artifacts keyed on the artifact's own files, never query results.

_ARTIFACT_MEMO: dict = {}


def _listing_fingerprint(spark: SparkSession, path: str) -> tuple:
    """(path, mtime, size) of every file under ``path``, sorted. Local
    filesystems take the pure-Python ``os.walk``/``stat`` path (ns
    mtimes, microseconds); anything else pays one recursive Hadoop
    listing (the py4j round-trips are ~20 ms per file locally, which is
    why the local fast path exists — on a real cluster the listing is
    one NameNode RPC and still far cheaper than the collect job)."""
    import os

    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    fs, hpath, _ = _fs(spark, path)
    if fs.getScheme() == "file":
        local = hpath.toUri().getPath()
        if not os.path.isdir(local):
            return (path, "absent")
        out = []
        for root, _dirs, files in os.walk(local):
            for f in files:
                st = os.stat(os.path.join(root, f))
                out.append((os.path.join(root, f), st.st_mtime_ns, st.st_size))
        return tuple(sorted(out))
    if not fs.exists(hpath):
        return (path, "absent")
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        out.append(
            (str(st.getPath()), st.getModificationTime(), st.getLen())
        )
    return tuple(sorted(out))


def memo_artifact(spark: SparkSession, path: str, loader):
    """Return ``loader()`` memoized per process under ``path``, keyed on
    the artifact directory's file listing (see block comment above)."""
    fp = _listing_fingerprint(spark, path)
    hit = _ARTIFACT_MEMO.get(path)
    if hit is not None and hit[0] == fp:
        return hit[1]
    val = loader()
    _ARTIFACT_MEMO[path] = (fp, val)
    return val


def epoch_names(
    spark: SparkSession, path: str, nested: bool = False
) -> frozenset | None:
    """The set of ``__epoch=<name>`` partition values under ``path`` —
    ``None`` when the directory is absent. ``nested=True`` looks one
    outer partition level down (the postings layout
    ``tok_bucket=*/__epoch=*``). Local filesystems take the pure-Python
    scandir path (a probe pays this per call; the py4j listing costs
    ~0.1 s it must not); anything else pays ONE Hadoop call — a plain
    ``listStatus`` when flat, a single ``globStatus(path/*/__epoch=*)``
    when nested (r15 ADVICE: the per-bucket listStatus loop was 1 +
    n_buckets RPCs against a remote NameNode/object store, ~130 per
    BM25 probe across its two framesets) — still directory metadata,
    never a data read."""
    import os

    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    fs, hpath, jvm = _fs(spark, path)

    def _epochs_of(names):
        return [
            n.split("=", 1)[1] for n in names if n.startswith("__epoch=")
        ]

    if fs.getScheme() == "file":
        local = hpath.toUri().getPath()
        if not os.path.isdir(local):
            return None
        first = [e.name for e in os.scandir(local) if e.is_dir()]
        if not nested:
            return frozenset(_epochs_of(first))
        out = []
        for d in first:
            out.extend(
                _epochs_of(
                    e.name
                    for e in os.scandir(os.path.join(local, d))
                    if e.is_dir()
                )
            )
        return frozenset(out)
    if not fs.exists(hpath):
        return None
    if not nested:
        return frozenset(
            _epochs_of(
                st.getPath().getName()
                for st in fs.listStatus(hpath)
                if st.isDirectory()
            )
        )
    glob = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/*/__epoch=*"
    )
    sts = fs.globStatus(glob)
    return frozenset(
        _epochs_of(
            st.getPath().getName()
            for st in (sts if sts is not None else [])
            if st.isDirectory()
        )
    )


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
