"""Table-maintenance operators: CDC merge (upsert/delete) and SCD2 history.

Not in the reference (a batch ML library has no mutable tables); required
by any production deployment of this engine — a 100 TB corpus is not
rebuilt from scratch per run, it is *maintained*: a nightly changelog is
merged into the snapshot (MERGE INTO semantics), and slowly-changing
attributes are tracked as validity intervals (SCD type 2) so training
runs can join "the attribute as of the interaction time".

Both operators are pure DataFrame compositions — no UDFs, no driver-side
state — and both are exactly reproducible in ANSI SQL, so they carry full
DuckDB oracles.

Scale notes (the shapes that matter at 100 TB):

- ``merge_upsert`` deduplicates the changelog with ``max_by`` over a
  sequence struct — a HASH AGGREGATE with map-side partial combine, NOT a
  row_number window (a window needs the full per-key sort shuffled to one
  task; max_by folds to one row per key on the map side first, which is
  the difference between shuffling the changelog and shuffling its key
  cardinality). The snapshot is then anti-joined on the touched keys and
  unioned with the surviving change images: snapshot rows move through
  ONE join, never a window.
- ``scd2_history`` is two windows over the SAME (key, seq) partitioning
  and ordering, so Catalyst plans a single exchange + a single sort and
  runs both window frames in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    delete_col: str = "is_delete",
) -> DataFrame:
    """Apply a CDC changelog onto a snapshot (MERGE INTO semantics).

    ``changes`` carries full row images: the snapshot's columns, plus
    ``seq_cols`` (change ordering within a key — e.g. a commit timestamp
    plus a log offset tiebreak) and a boolean ``delete_col``. Per key the
    LATEST change wins; a winning delete removes the key, a winning
    upsert replaces the snapshot row (or inserts a new key). Snapshot
    rows with no change pass through untouched.

    Shape: one map-side-combinable aggregate over the changelog
    (``max_by`` on the sequence struct), one anti-join of the snapshot
    against the touched keys, one union. The changelog of a typical
    incremental load is orders of magnitude smaller than the snapshot,
    so AQE will usually broadcast the touched-keys side of the anti-join;
    the snapshot itself is never windowed, sorted, or shuffled beyond
    that join.
    """
    payload_cols = [c for c in changes.columns if c not in seq_cols]
    latest = (
        changes.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload_cols]),
                F.struct(*[F.col(c) for c in seq_cols]),
            ).alias("__img")
        )
        .select(*[F.col(f"__img.{c}").alias(c) for c in payload_cols])
    )
    touched = latest.select(*key_cols)
    # NULL delete flags are upserts, not deletes: a bare ~col(delete_col)
    # filter silently drops NULL-flagged keys (NULL fails the predicate),
    # turning a malformed changelog row into a data-loss delete
    survivors = latest.filter(
        ~F.coalesce(F.col(delete_col), F.lit(False))
    ).drop(delete_col)
    untouched = snapshot.join(touched, on=key_cols, how="left_anti")
    return untouched.unionByName(survivors)


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] = (),
) -> DataFrame:
    """Build an SCD type-2 validity-interval history from a change stream.

    Consecutive rows with identical ``attr_cols`` collapse into one
    interval; each surviving row gets ``effective_from`` (its own
    sequence value), ``effective_to`` (the next change's, NULL while
    current), a per-key ``version`` counter, and ``is_current``.

    Both windows partition by ``key_cols`` and order by
    (``seq_col``, ``tiebreak_cols``): one exchange, one sort, two window
    frames in a single physical pass.
    """
    order = [F.col(seq_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = W.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    prev = F.lag(attrs).over(w)
    changed = changes.withColumn("__prev", prev).filter(
        F.col("__prev").isNull() | (F.col("__prev") != attrs)
    )
    # re-derive the window over the collapsed frame: effective_to is the
    # NEXT RETAINED change, not the next raw row. Must order by the SAME
    # (seq, tiebreak) as the collapse window — seq alone leaves retained
    # changes sharing (key, seq) with nondeterministic version numbering
    # and interval bounds
    w2 = W.partitionBy(*key_cols).orderBy(*order)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(seq_col).alias("effective_from"),
        F.lead(seq_col).over(w2).alias("effective_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(seq_col).over(w2).isNull().alias("is_current"),
    )


@register(
    "q_cdc_merge",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    latest AS (
      SELECT user_id, value, event_type FROM ranked WHERE rn = 1
    )
    SELECT c_custkey AS cust_id, c_acctbal AS acctbal,
           c_mktsegment AS segment
    FROM customer
    WHERE c_custkey NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id AS cust_id, value AS acctbal,
           'STREAMED' AS segment
    FROM latest
    WHERE event_type <> 'error'
    """,
    tags=("maintenance",),
    demoted=True,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: apply the events stream as a changelog onto the customer
    snapshot. Each user's LATEST event is an upsert of their account
    balance (full row image, segment recoded to 'STREAMED'); a latest
    event of type 'error' is a tombstone that deletes the key. Untouched
    customers pass through.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").alias("cust_id"),
        F.col("value").alias("acctbal"),
        F.lit("STREAMED").alias("segment"),
        (F.col("event_type") == "error").alias("is_delete"),
        "ts",
        "event_id",
    )
    return merge_upsert(
        cust, changes, key_cols=["cust_id"], seq_cols=["ts", "event_id"]
    )


@register(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    chg AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS INTEGER) AS version,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM chg
    """,
    tags=("maintenance",),
    demoted=True,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history: per-user validity intervals of the ``event_type``
    attribute — consecutive same-type events collapse, each retained
    change carries [effective_from, effective_to) and is_current.
    """
    ev = load_table(spark, sf_dir, "events")
    return scd2_history(
        ev,
        key_cols=["user_id"],
        seq_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 512,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_mb`` each — the table-maintenance pass every incremental
    pipeline needs, because CDC appends and streaming sinks accumulate
    thousands of KB-sized files whose per-file open/footer overhead
    eventually dominates scan time (and whose task count explodes the
    scheduler at 100 TB).

    File count is sized from the directory's ACTUAL bytes via the Hadoop
    FileSystem API (works on any FS Spark can read — local, HDFS, object
    stores), not guessed from row counts. With ``sort_cols`` the rewrite
    range-clusters on those columns (``write_range_sorted``), so the
    compaction pass doubles as a layout optimization — footer min/max
    stats then prune selective scans; without them it is a plain
    ``repartition`` (round-robin, evenly sized files).

    Returns a 1-row stats frame (files_before, files_after, bytes,
    target_files) — the shape a maintenance-job log wants. Never
    rewrites in place: compact to a new directory, then swap atomically
    at the catalog/manifest layer above this.
    """
    from bayesiandatafusion_jl_spark.sources.io import write_range_sorted

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-int(total_bytes) // (target_mb * 1024 * 1024)))

    df = spark.read.parquet(in_path)
    files_before = len(df.inputFiles())
    if sort_cols:
        write_range_sorted(df, out_path, sort_cols, n_partitions=n_files, mode=mode)
    else:
        df.repartition(n_files).write.mode(mode).parquet(out_path)
    files_after = len(spark.read.parquet(out_path).inputFiles())
    return spark.createDataFrame(
        [(files_before, files_after, int(total_bytes), n_files)],
        "files_before int, files_after int, bytes long, target_files int",
    )


@register(
    "q_table_compact",
    oracle=None,  # side-effecting maintenance op: rewrites files, returns a
    # stats row; content-preservation + file-count are pytest-gated
    tags=("maintenance",),
    demoted=True,
)
def q_table_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance: fragment the nation table into many tiny files under
    /tmp, compact back to target size, and return the stats row. The
    rows-only driver check pins that the op runs end-to-end; tests assert
    content equality and the file-count contract."""
    frag = f"/tmp/bdf_compact/{sf_dir.strip('/').replace('/', '_')}/frag"
    out = f"/tmp/bdf_compact/{sf_dir.strip('/').replace('/', '_')}/compacted"
    load_table(spark, sf_dir, "nation").repartition(13).write.mode(
        "overwrite"
    ).parquet(frag)
    return compact_parquet(spark, frag, out, target_mb=512)


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Attribute AS-OF the fact's own time: join each fact row to the
    SCD2 interval containing its timestamp (``effective_from <= ts``
    and ``ts < effective_to``, the current interval open-ended) — the
    join a training run does to see "the attribute as it was at the
    interaction", the whole reason the history exists.

    Scale shape: the key equality makes this a sort-merge equi-join on
    ``key_cols`` with the interval bounds as a post-join residual —
    never a cartesian (the ``q_join_range`` argument). The history side
    is versions-per-key (tiny next to facts) so AQE broadcasts it
    outright when it fits. ``how="left"`` keeps facts that predate
    their key's first version (attrs NULL); ``"inner"`` drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    h = history.alias("__h")
    f = facts.alias("__f")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__h.{k}"))
    ts = F.col(f"__f.{ts_col}")
    cond = (
        cond
        & (F.col("__h.effective_from") <= ts)
        & (
            F.col("__h.effective_to").isNull()
            | (ts < F.col("__h.effective_to"))
        )
    )
    attr_cols = [
        c
        for c in history.columns
        if c not in set(key_cols) | {"effective_from", "effective_to"}
    ]
    return f.join(h, cond, how).select(
        "__f.*", *[F.col(f"__h.{c}").alias(c) for c in attr_cols]
    )


@register(
    "q_scd2_asof",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    chg AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    ),
    hist AS (
      SELECT user_id, event_type,
             ts AS effective_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS effective_to,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS version
      FROM chg
    )
    SELECT f.event_id AS purchase_id, f.user_id AS user_id, f.ts AS ts,
           h.event_type AS state_asof, h.version AS version
    FROM events f
    LEFT JOIN hist h
      ON h.user_id = f.user_id
     AND h.effective_from <= f.ts
     AND (h.effective_to IS NULL OR f.ts < h.effective_to)
    WHERE f.event_type = 'purchase'
    """,
    tags=("maintenance", "C7"),
    demoted=True,
)
def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of attribute lookup against the SCD2 history: every purchase
    event joined to the user's state interval containing its timestamp
    (by construction that interval's attribute is 'purchase' — the
    check is that version/interval RESOLUTION matches the oracle
    exactly, ties and interval edges included)."""
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        ev,
        key_cols=["user_id"],
        seq_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    ).drop("is_current")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = scd2_lookup(facts, hist, ["user_id"], "ts")
    return out.select(
        "purchase_id", "user_id", "ts",
        F.col("event_type").alias("state_asof"), "version",
    )
