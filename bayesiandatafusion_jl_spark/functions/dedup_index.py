"""Incremental near-dup against a PERSISTED MinHash signature index.

A daily 100 TB pipeline does not re-dedup the whole corpus per run: it
dedups the NEW shard against yesterday's index. The index is two parquet
frames under ``index_dir``:

- ``sigs``   — (doc_id, sig: array<long>) MinHash signatures;
- ``buckets`` — (doc_id, band, bucket) LSH band buckets, range-sorted on
  (band, bucket) within each write so a probe of a band/bucket slice
  skips files on footer stats;
- ``meta``   — one row pinning (n_hashes, n_bands, rows_per_band,
  shingle_k); an incremental query validates against it so an index
  written under one banding can never be silently probed under another
  (band hashes would disagree and recall would quietly drop to ~0).

Both data frames are PARTITIONED BY an ``__epoch`` string (one per
ingested shard). That makes shard appends IDEMPOTENT: an append is a
dynamic-partition overwrite of its own epoch directory, so a replayed
shard (streaming micro-batch retry, rerun batch job) replaces its
previous signatures instead of duplicating them — duplicated index rows
would otherwise double every future pair involving the replayed docs.
Readers project explicit columns, so the epoch column never leaks.

``dedup_incremental`` shingles and signs ONLY the new shard (one linear
pass), probes the stored buckets with a (band, bucket) equi-join, and
scores candidate pairs with the standard unbiased MinHash Jaccard
estimator — matching signature components / n_hashes — so the OLD
corpus's text is never re-read and its signatures never recomputed: the
old side of every join is a parquet scan of the index. Intra-shard pairs
run through the same in-memory banding (``lsh_candidate_pairs``).

Like every signature-based operator here, results are engine-specific
(xxhash64 seeds), so the registry spec is rows-only; recall is measured
in tests with planted twins that STRADDLE the index/new-shard boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.dedup import (
    _twin_corpus,
    band_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from bayesiandatafusion_jl_spark.functions.index_meta import (
    check_meta,
    index_paths,
    write_meta,
)
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import checkpoint_df


def _paths(index_dir: str) -> tuple[str, str, str]:
    return index_paths(index_dir, "sigs", "buckets", "meta")


def _signatures(
    corpus: DataFrame, n_hashes: int, shingle_k: int
) -> DataFrame:
    return minhash_signatures(
        corpus,
        n_hashes=n_hashes,
        k=shingle_k,
        sh=shingles(corpus, k=shingle_k, distinct=False),
    )


def _write_epoch(
    df: DataFrame,
    path: str,
    epoch: str,
    wipe: bool,
    sort_cols: list[str] | None = None,
) -> None:
    """One shard under ``__epoch=<epoch>`` — the shared epoch-store
    primitive (index_meta.write_epoch, r14), kept as a local alias for
    this module's call sites."""
    from bayesiandatafusion_jl_spark.functions.index_meta import write_epoch

    write_epoch(df, path, epoch, fresh=wipe, sort_cols=tuple(sort_cols or ()))


def _check_banding(spark: SparkSession, meta_path: str, **params: int) -> None:
    check_meta(
        spark,
        meta_path,
        "band hashes would disagree and recall would silently collapse",
        **params,
    )


def write_signature_index(
    corpus: DataFrame,
    index_dir: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    mode: str = "overwrite",
    epoch: str = "base",
) -> None:
    """Build the at-rest signature index for ``corpus`` (doc_id, text).

    One signature pass feeds both frames (the sig frame is persisted
    across the two writes, then released). ``mode="append"`` adds a new
    shard under its own ``epoch`` — the params must match ``meta``
    (checked), and re-appending the SAME epoch overwrites that epoch's
    rows (idempotent replay), never duplicates them.
    """
    if n_hashes != n_bands * rows_per_band:
        raise ValueError("n_hashes must equal n_bands * rows_per_band")
    sig_path, bucket_path, meta_path = _paths(index_dir)
    spark = corpus.sparkSession
    if mode == "append":
        _check_banding(
            spark,
            meta_path,
            n_hashes=n_hashes,
            n_bands=n_bands,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        )
        if epoch == "base":
            raise ValueError(
                "append needs a unique epoch per shard (epoch='base' is the "
                "fresh-build epoch)"
            )
        # a compaction-folded epoch's directory is gone; replaying it would
        # duplicate its rows (see index_compact module docstring)
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            check_not_folded,
        )

        check_not_folded(spark, index_dir, epoch)
    sigs = _signatures(corpus, n_hashes, shingle_k).persist()
    wipe = mode != "append"
    try:
        _write_epoch(sigs, sig_path, epoch, wipe)
        _write_epoch(
            band_buckets(sigs, n_bands=n_bands, rows_per_band=rows_per_band),
            bucket_path,
            epoch,
            wipe,
            sort_cols=["band", "bucket"],
        )
    finally:
        sigs.unpersist()
    if wipe:
        write_meta(
            spark,
            meta_path,
            "overwrite",
            n_hashes=n_hashes,
            n_bands=n_bands,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        )
        # fresh build = new incarnation, new epoch namespace (matches
        # write_ivf_index; see index_compact.reset_ledger) — and a new
        # doc-id namespace, so stale tombstones are cleared AFTER the
        # successful write (index_meta.clear_tombstones crash ordering)
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            reset_ledger,
        )
        from bayesiandatafusion_jl_spark.functions.index_meta import (
            clear_tombstones,
        )

        reset_ledger(spark, index_dir)
        clear_tombstones(spark, index_dir)


def delete_from_signature_index(
    spark: SparkSession, index_dir: str, doc_ids
) -> None:
    """Logically delete documents from the signature index (tombstone
    design, shared with the vector index — see index_meta): deleted docs
    immediately stop surfacing as ``new_index`` pair partners in
    ``dedup_incremental`` / the streaming probe, with zero index
    rewrite. Tombstones survive epoch compaction (rows are preserved,
    the filter stays active); the physical purge is a fresh
    ``write_signature_index`` over the retained corpus, which clears
    the set. ``doc_ids``: list of ints or a 1-column DataFrame. A
    deleted id must not be re-appended before that rebuild — the live
    tombstone would keep hiding the new rows (hide, never resurface)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        append_tombstones,
    )

    append_tombstones(spark, index_dir, doc_ids)


def signature_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row health report for the signature index — the LSH twin of
    ``ivf_index_stats``: (n_docs, n_epochs, n_files, n_buckets_used,
    max_bucket, mean_bucket, bucket_skew).

    ``bucket_skew`` = max (band,bucket) population / mean — the number
    that predicts probe cost: candidate pairs inside one bucket grow
    QUADRATICALLY with its population, so one hot bucket (boilerplate
    shingles, near-constant docs) dominates every incremental probe.
    Skew ≫ band count says re-shingle (larger k) or band differently;
    file count says compact. One buckets scan + one sigs scan, both
    projecting ids only; single-row output."""
    sig_path, bucket_path, _ = _paths(index_dir)
    sigs = spark.read.parquet(sig_path)
    buckets = spark.read.parquet(bucket_path)
    n_files = len(sigs.inputFiles()) + len(buckets.inputFiles())
    base = sigs.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("__epoch").alias("n_epochs"),
    ).collect()[0]
    b = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("used"),
            F.max("n").alias("mx"),
            F.avg("n").alias("mean"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                int(base["n_docs"]),
                int(base["n_epochs"]),
                int(n_files),
                int(b["used"]),
                int(b["mx"]),
                float(b["mean"]),
                round(float(b["mx"]) / float(b["mean"]), 4),
            )
        ],
        "n_docs long, n_epochs int, n_files int, n_buckets_used long,"
        " max_bucket long, mean_bucket double, bucket_skew double",
    )


def dedup_incremental(
    new_docs: DataFrame,
    index_dir: str,
    jaccard_min: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    update_index: bool = False,
    epoch: str | None = None,
) -> DataFrame:
    """Near-dup pairs of a NEW shard against the stored index + within
    itself, WITHOUT touching the old corpus's text.

    Returns (doc_a, doc_b, jaccard_est, pair_type) where ``pair_type`` is
    ``new_index`` (doc_a new, doc_b from the index) or ``new_new``;
    ``jaccard_est`` is the MinHash component-match estimator (unbiased,
    stderr ≈ sqrt(s(1-s)/n_hashes) — ~0.09 at n_hashes=32), filtered at
    ``jaccard_min``. Candidate recall follows the banding S-curve exactly
    as in ``lsh_near_dup_pairs`` — see that docstring before lowering
    ``jaccard_min`` below the band threshold.

    Shape: the new shard is shingled/signed ONCE (checkpointed — bounded
    by the shard, and ``update_index=True`` appends the same
    materialization it probes with, so index and pairs can never diverge);
    the probe is one equi-join on (band, bucket) against the range-sorted
    bucket parquet; signature attachment is two doc_id equi-joins (new
    side from the checkpoint, old side a parquet scan of ``sigs``
    restricted to candidate doc_ids). Nothing scales with the OLD corpus
    except the two index scans.

    ``update_index=True`` requires a unique ``epoch`` naming this shard:
    the append is a dynamic-partition overwrite of ``__epoch=<epoch>``,
    so a REPLAYED shard (task retry, rerun job, streaming micro-batch
    restart) replaces its own earlier rows instead of duplicating them —
    duplicated signatures would double every future pair involving these
    docs. The probe scans additionally EXCLUDE ``__epoch == epoch``
    (partition-pruned), so a replay whose earlier attempt crashed after
    the index append still reproduces the original pair set instead of
    matching the shard against its own stale signatures.
    """
    if n_hashes != n_bands * rows_per_band:
        raise ValueError("n_hashes must equal n_bands * rows_per_band")
    if update_index and not epoch:
        raise ValueError(
            "update_index=True needs a unique epoch per shard (the append "
            "is an idempotent per-epoch overwrite)"
        )
    sig_path, bucket_path, meta_path = _paths(index_dir)
    spark = new_docs.sparkSession
    if update_index:
        # same folded-epoch replay guard as write_signature_index: once a
        # compaction folded this epoch, re-appending it duplicates its rows
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            check_not_folded,
        )

        check_not_folded(spark, index_dir, epoch)
    _check_banding(
        spark,
        meta_path,
        n_hashes=n_hashes,
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        shingle_k=shingle_k,
    )

    # checkpoint_df, not bare localCheckpoint: the persist half grounds the
    # checkpointed plan's sizeInBytes in the real shard size, so the
    # (band,bucket) probe and signature-attachment joins can auto-broadcast
    # the small shard side against the corpus-scale index scans (a bare
    # localCheckpoint inherits the default 2^63 estimate and forces
    # sort-merge, shuffling the INDEX — see session.checkpoint_df)
    new_sigs = checkpoint_df(_signatures(new_docs, n_hashes, shingle_k))
    new_bands = band_buckets(new_sigs, n_bands=n_bands, rows_per_band=rows_per_band)

    def _index_scan(path: str) -> DataFrame:
        # REPLAY HOLE guard: on a replayed shard (update_index=True, same
        # epoch), the index may already hold this shard's own rows from the
        # earlier attempt (crash after the index append, before the pair
        # sink write). Excluding __epoch == epoch from the probe scans makes
        # the replay reproduce the ORIGINAL pair set — intra-shard dups stay
        # pair_type=new_new instead of additionally surfacing as new_index
        # in both orientations. Partition pruning makes the filter free.
        scan = spark.read.parquet(path)
        if update_index:
            scan = scan.filter(F.col("__epoch") != epoch)
        return scan

    from bayesiandatafusion_jl_spark.functions.index_meta import (
        anti_join_tombstones,
    )

    # tombstoned (logically deleted) docs never surface as pair partners;
    # filtering the bucket side is sufficient — a pair needs the bucket
    # match — and keeps the anti-join on the small candidate stream
    old_buckets = anti_join_tombstones(
        spark,
        index_dir,
        _index_scan(bucket_path).select(
            "band", "bucket", F.col("doc_id").alias("doc_b")
        ),
        "doc_b",
    )
    cross = (
        new_bands.withColumnRenamed("doc_id", "doc_a")
        .join(old_buckets, ["band", "bucket"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("pair_type", F.lit("new_index"))
    )
    intra = lsh_candidate_pairs(
        new_sigs, n_bands=n_bands, rows_per_band=rows_per_band
    ).withColumn("pair_type", F.lit("new_new"))

    sa = new_sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb_new = new_sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    sb_old = _index_scan(sig_path).select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
    )
    est = (
        F.expr(
            "aggregate(zip_with(sig_a, sig_b,"
            " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
            " 0, (acc, v) -> acc + v)"
        ).cast("double")
        / n_hashes
    )
    scored = (
        cross.join(sa, "doc_a").join(sb_old, "doc_b")
        .unionByName(intra.join(sa, "doc_a").join(sb_new, "doc_b"))
        .withColumn("jaccard_est", F.round(est, 4))
        .filter(F.col("jaccard_est") >= jaccard_min)
        .select("doc_a", "doc_b", "jaccard_est", "pair_type")
    )
    if update_index:
        # materialize the (bounded) pair set BEFORE touching the index: the
        # scored plan's parquet scans pinned their file listing at read
        # time, and a replayed epoch's overwrite below DELETES some of
        # those files — a lazy consumer would hit FILE_NOT_EXIST (or worse,
        # silently read the post-update index)
        scored = checkpoint_df(scored)
        # append the SAME checkpointed signatures that produced the pairs,
        # as an idempotent per-epoch overwrite
        _write_epoch(new_sigs, sig_path, epoch, wipe=False)
        _write_epoch(
            band_buckets(new_sigs, n_bands=n_bands, rows_per_band=rows_per_band),
            bucket_path,
            epoch,
            wipe=False,
            sort_cols=["band", "bucket"],
        )
    return scored


@register(
    "q_llm_dedup_incremental",
    oracle=None,  # xxhash64-seeded signatures are engine-specific; twin
    # recall across the index/new-shard boundary is pytest-measured
    tags=("J2", "lsh", "incremental"),
    demoted=True,
)
def q_llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (incremental path) — index the original documents once, then
    near-dup ONLY the twin shard (mutated copies of every doc_id % 7 == 0,
    per ``_twin_corpus``) against the stored index. Every twin pair
    straddles the boundary, so all hits must be pair_type=new_index."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = f"/tmp/bdf_sig_index/{sf_dir.strip('/').replace('/', '_')}"
    write_signature_index(docs, index_dir)
    new_shard = _twin_corpus(spark, sf_dir).filter(F.col("doc_id") >= 1_000_000)
    return dedup_incremental(new_shard, index_dir)
