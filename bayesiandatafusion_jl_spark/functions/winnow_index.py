"""Persisted winnowing-fingerprint index — incremental span-grain
boilerplate/plagiarism detection (r15).

``text.winnow_fingerprints`` / ``text.fingerprint_overlap`` are the
one-shot MOSS operators (Schleimer, Wilkerson & Aiken, SIGMOD'03); this
module is their INCREMENTAL form, completing the family pattern every
other dedup machine already follows (MinHash → dedup_incremental,
exact Jaccard → setsim_incremental): fingerprint the base corpus ONCE,
persist the (doc_id, fp) frame, and let every new shard probe for
span-overlap pairs against ALL history without re-reading a byte of old
text — with results EXACTLY equal to the one-shot overlap join on the
union (the registered query's oracle is the full winnowing + all-pairs
SQL restricted to shard-touching pairs).

Layout under ``index_dir/`` (the shared index-family discipline):

    fps/    ``fp_bucket=<b>/__epoch=<e>/`` rows (id, fp): each
            document's DISTINCT selected fingerprints.
            ``fp_bucket = pmod(xxhash64(fp), n_buckets)`` is the outer
            partition level — a probe prunes the stored scan to its own
            shard's fingerprint buckets, and because a fingerprint's
            posting list lives WHOLLY inside its bucket, per-fp document
            frequencies computed from the pruned scan are exact (the
            BM25 df-from-probed-buckets argument).
    meta/   (k, w, n_buckets) — fingerprints selected under a different
            (k, w) are a different feature space; probes refuse drift.

The ``max_df`` hot-fingerprint rail (``text.fingerprint_overlap``)
applies on the GLOBAL df — stored + shard occurrences per fingerprint —
so the railed incremental result equals the railed one-shot result, not
an approximation of it.

Scale shape: a probe fingerprints ONLY its shard (one scan, one
doc-partitioned window); the stored scan reads (id, fp) rows
partition-pruned to the shard's buckets — never text; pair counting is
one fp-collision join + one (id_a, id_b) aggregate. Appends are
idempotent per-epoch dynamic overwrites with the ``dedup_incremental``
replay-hole guard, live id collisions refuse loudly (the setsim_index
contract), deletes are shared-machinery tombstones, and
``compact_winnow_index`` folds epochs + applies deletes physically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.text import (
    _WINNOW_HEX,
    _WINNOW_K,
    _WINNOW_W,
    winnow_fingerprints,
)
from bayesiandatafusion_jl_spark.registry import register


def _doc_fps(docs: DataFrame, k: int, w: int, n_buckets: int) -> DataFrame:
    """(id, fp, fp_bucket): a corpus's distinct selected fingerprints."""
    return (
        winnow_fingerprints(docs, k, w)
        .select(F.col("doc_id").alias("id"), "fp")
        .distinct()
        .withColumn(
            "fp_bucket",
            F.pmod(F.xxhash64("fp"), F.lit(n_buckets)).cast("int"),
        )
    )


def write_winnow_index(
    corpus: DataFrame,
    index_dir: str,
    k: int = _WINNOW_K,
    w: int = _WINNOW_W,
    n_buckets: int = 16,
) -> None:
    """Build (overwrite) the fingerprint index from a (doc_id, text)
    corpus: one text scan, one doc-partitioned window, one distinct.
    A fresh build starts a new incarnation (tombstones + fold ledger
    reset — the write_bm25_index discipline)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        reset_ledger,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        clear_tombstones,
        index_paths,
        write_epoch,
        write_meta,
    )

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = corpus.sparkSession
    fps_path, meta_path = index_paths(index_dir, "fps", "meta")
    write_epoch(
        _doc_fps(corpus, k, w, n_buckets),
        fps_path,
        "base",
        fresh=True,
        outer_cols=("fp_bucket",),
    )
    write_meta(spark, meta_path, "overwrite", k=k, w=w, n_buckets=n_buckets)
    clear_tombstones(spark, index_dir)
    reset_ledger(spark, index_dir)


def winnow_overlap_incremental(
    new_docs: DataFrame,
    index_dir: str,
    min_shared: int = 2,
    max_df: int | None = None,
    update_index: bool = False,
    epoch: str | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared, pair_type): document pairs sharing ≥
    ``min_shared`` winnowing fingerprints, between a NEW shard and the
    stored index (``new_index``) and within the shard (``new_new``) —
    without re-fingerprinting the old corpus. Results equal the
    one-shot ``fingerprint_overlap`` on the union restricted to
    shard-touching pairs (pytest-pinned; the registered query's oracle
    is the full SQL form).

    ``max_df`` (hot-fingerprint rail): evaluated on the GLOBAL document
    frequency — stored + shard occurrences — so the railed incremental
    output equals the railed one-shot output exactly. The stored df is
    exact despite partition pruning: a fingerprint's rows live wholly
    inside its ``fp_bucket``.

    ``update_index=True`` appends the shard's fingerprints as its own
    ``__epoch`` partition (idempotent dynamic overwrite; probe scans
    exclude the epoch — the replay-hole guard); live id collisions
    refuse loudly (they would merge fingerprint sets across epochs).
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_df is not None and max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    if update_index and not epoch:
        raise ValueError(
            "update_index=True needs a unique epoch per shard (the append"
            " is an idempotent per-epoch overwrite)"
        )
    if epoch == "base":
        raise ValueError("epoch='base' is reserved for write_winnow_index")
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        anti_join_tombstones,
        index_paths,
        read_meta,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    spark = new_docs.sparkSession
    fps_path, meta_path = index_paths(index_dir, "fps", "meta")
    if update_index:
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            check_not_folded,
        )

        check_not_folded(spark, index_dir, epoch)
    meta = read_meta(spark, meta_path).asDict()
    k, w, n_buckets = int(meta["k"]), int(meta["w"]), int(meta["n_buckets"])

    new_fps = checkpoint_df(_doc_fps(new_docs, k, w, n_buckets))
    buckets = sorted(
        r["fp_bucket"] for r in new_fps.select("fp_bucket").distinct().collect()
    )

    def _stored() -> DataFrame:
        scan = spark.read.parquet(fps_path)
        if update_index:
            scan = scan.filter(F.col("__epoch") != epoch)
        return anti_join_tombstones(spark, index_dir, scan, "id")

    if update_index:
        # live-id-collision refusal (the setsim_index contract): a
        # redelivered doc_id under a NEW epoch would merge fingerprint
        # sets across epochs on every later probe
        clash = (
            _stored()
            .select("id")
            .join(new_fps.select("id").distinct(), "id", "left_semi")
            .limit(5)
            .collect()
        )
        if clash:
            ids = sorted(r["id"] for r in clash)
            raise ValueError(
                f"shard doc_ids {ids} are already indexed at {index_dir}"
                " under other epochs — appending them again would merge"
                " fingerprint sets across epochs; delete the old rows"
                " (tombstone + compact) or re-ingest under fresh ids"
            )

    stored = _stored().filter(F.col("fp_bucket").isin(buckets))
    if max_df is not None:
        # GLOBAL df per fingerprint = stored + shard occurrences; exact
        # under pruning because an fp's rows live wholly in its bucket
        dfc = (
            stored.select("fp")
            .unionByName(new_fps.select("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
        )
        hot = dfc.filter(F.col("__df") > max_df).select("fp")
        stored = stored.join(hot, "fp", "left_anti")
        new_fps_cold = new_fps.join(hot, "fp", "left_anti")
    else:
        new_fps_cold = new_fps

    a = new_fps_cold.select(F.col("id").alias("id_a"), "fp")
    b = stored.select(
        F.col("id").alias("id_b"), "fp",
        F.lit("new_index").alias("pair_type"),
    ).unionByName(
        new_fps_cold.select(
            F.col("id").alias("id_b"), "fp",
            F.lit("new_new").alias("pair_type"),
        )
    )
    pairs = (
        a.join(b, "fp")
        .filter(
            F.when(
                F.col("pair_type") == "new_new",
                F.col("id_a") < F.col("id_b"),
            ).otherwise(F.col("id_a") != F.col("id_b"))
        )
        .groupBy("id_a", "id_b", "pair_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "n_shared",
            "pair_type",
        )
    )
    if update_index:
        from bayesiandatafusion_jl_spark.functions.index_meta import (
            write_epoch,
        )

        # materialize the pair frame BEFORE the overwrite deletes files
        # the lazy plan pinned (the dedup_incremental ordering); the
        # append stores the FULL fingerprint set (new_fps, not the
        # rail-filtered new_fps_cold) — the rail is a per-probe verdict,
        # never baked into the artifact
        pairs = checkpoint_df(pairs)
        write_epoch(
            new_fps, fps_path, epoch, fresh=False, outer_cols=("fp_bucket",)
        )
    return pairs


def delete_from_winnow_index(
    spark: SparkSession, index_dir: str, doc_ids
) -> None:
    """Logical deletes (shared tombstone machinery): deleted docs stop
    surfacing as pair partners immediately; ``compact_winnow_index``
    purges them physically."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        append_tombstones,
    )

    append_tombstones(spark, index_dir, doc_ids)


def compact_winnow_index(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> DataFrame:
    """Fold the fingerprint epochs into one compact epoch, applying
    tombstones physically — the setsim/BM25 maintenance shape;
    ``fp_bucket`` stays the outer partition level."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        _stats_row,
        compact_epochs,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        begin_fold,
        clear_tombstones,
        index_paths,
        tombstone_purge,
    )

    (fps_path,) = index_paths(index_dir, "fps")
    purge = tombstone_purge(spark, index_dir, "id")
    new_epoch, epochs = begin_fold(
        spark, index_dir, fps_path, force=purge is not None
    )
    stats = compact_epochs(
        spark, fps_path, new_epoch, outer_cols=("fp_bucket",),
        target_mb=target_mb, transform=purge,
    )
    if purge is not None:
        clear_tombstones(spark, index_dir)
    return _stats_row(spark, [("fps", *stats)])


def winnow_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row health report — the ``index_stats`` discipline: stored
    fingerprint rows, indexed docs, epoch/file counts, the fp-bucket
    hot-spot ratio, and ``max_fp_df`` (the hottest single fingerprint —
    the number an operator picks the probe-time ``max_df`` rail from)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import index_paths

    (fps_path,) = index_paths(index_dir, "fps")
    fps = spark.read.parquet(fps_path)
    per_bucket = fps.groupBy("fp_bucket").agg(F.count(F.lit(1)).alias("c"))
    row = per_bucket.agg(
        F.sum("c").alias("n_fps"),
        (F.max("c") / F.avg("c")).alias("bucket_skew"),
    ).collect()[0]
    more = fps.agg(
        F.countDistinct("id").alias("n_docs"),
        F.countDistinct("__epoch").alias("n_epochs"),
    ).collect()[0]
    max_df = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    return spark.createDataFrame(
        [
            (
                int(row["n_fps"]),
                int(more["n_docs"]),
                int(max_df),
                int(more["n_epochs"]),
                len(fps.inputFiles()),
                float(row["bucket_skew"]),
            )
        ],
        "n_fps bigint, n_docs bigint, max_fp_df bigint, n_epochs int,"
        " n_files int, bucket_skew double",
    )


_WINNOW_INC_BOUNDARY = 200


@register(
    "q_text_winnow_incremental",
    # FULL oracle: the complete winnowing selection + all-pairs overlap
    # join over the same 300 documents, restricted to pairs touching
    # the shard — proving the persisted index loses no pair ACROSS the
    # epoch boundary and counts shared fingerprints exactly.
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t
      FROM documents WHERE doc_id < 300
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             substr(sha256(array_to_string(
               t[i:i+{_WINNOW_K - 1}], ' ')), 1, {_WINNOW_HEX}) AS h
      FROM (SELECT doc_id, t,
                   UNNEST(range(1, len(t) - {_WINNOW_K} + 2)) AS i
            FROM tk WHERE len(t) >= {_WINNOW_K})
    ),
    n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
    win AS (
      SELECT doc_id, UNNEST(range(0, ng - {_WINNOW_W} + 1)) AS s
      FROM n WHERE ng >= {_WINNOW_W}
    ),
    m AS (
      SELECT win.doc_id, win.s, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY win.doc_id, win.s
               ORDER BY g.h ASC, g.pos DESC
             ) AS rk
      FROM win JOIN g ON g.doc_id = win.doc_id
                     AND g.pos BETWEEN win.s AND win.s + {_WINNOW_W - 1}
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM m WHERE rk = 1)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           CASE WHEN a.doc_id < {_WINNOW_INC_BOUNDARY} THEN 'new_index'
                ELSE 'new_new' END AS pair_type
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    WHERE b.doc_id >= {_WINNOW_INC_BOUNDARY}
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    ORDER BY id_a, id_b
    """,
    tags=("J2", "J5", "text", "fingerprint", "incremental"),
    demoted=True,
)
def q_text_winnow_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-grain overlap of the 200..299 document shard against a
    persisted fingerprint index of documents < 200, plus within itself
    — every pair the one-shot ``fingerprint_overlap`` would emit for
    the shard, without re-fingerprinting the base corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300
    )
    base = docs.filter(F.col("doc_id") < _WINNOW_INC_BOUNDARY)
    shard = docs.filter(F.col("doc_id") >= _WINNOW_INC_BOUNDARY)
    index_dir = f"/tmp/bdf_winnow_index/{sf_dir.strip('/').replace('/', '_')}"
    write_winnow_index(base, index_dir)
    return winnow_overlap_incremental(shard, index_dir, min_shared=2).orderBy(
        "id_a", "id_b"
    )
