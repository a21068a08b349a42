"""Incremental near-dup against a PERSISTED MinHash signature index.

A daily 100 TB pipeline does not re-dedup the whole corpus per run: it
dedups the NEW shard against yesterday's index. The index is two parquet
frames under ``index_dir``:

- ``sigs``   — (doc_id, sig: array<long>) MinHash signatures;
- ``buckets`` — (doc_id, band, bucket) LSH band buckets, range-sorted on
  (band, bucket) via ``sources.io.write_range_sorted`` so a probe of a
  band/bucket slice skips files on footer stats;
- ``meta``   — one row pinning (n_hashes, n_bands, rows_per_band,
  shingle_k); an incremental query validates against it so an index
  written under one banding can never be silently probed under another
  (band hashes would disagree and recall would quietly drop to ~0).

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
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.sources.io import write_range_sorted


def _paths(index_dir: str) -> tuple[str, str, str]:
    d = index_dir.rstrip("/")
    return f"{d}/sigs", f"{d}/buckets", f"{d}/meta"


def _signatures(
    corpus: DataFrame, n_hashes: int, shingle_k: int
) -> DataFrame:
    return minhash_signatures(
        corpus,
        n_hashes=n_hashes,
        k=shingle_k,
        sh=shingles(corpus, k=shingle_k, distinct=False),
    )


def write_signature_index(
    corpus: DataFrame,
    index_dir: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    mode: str = "overwrite",
) -> None:
    """Build the at-rest signature index for ``corpus`` (doc_id, text).

    One signature pass feeds both frames (the sig frame is persisted
    across the two writes, then released). ``mode="append"`` adds a new
    shard to an existing index — the params must match ``meta`` (checked).
    """
    if n_hashes != n_bands * rows_per_band:
        raise ValueError("n_hashes must equal n_bands * rows_per_band")
    sig_path, bucket_path, meta_path = _paths(index_dir)
    spark = corpus.sparkSession
    if mode == "append":
        _check_meta(spark, meta_path, n_hashes, n_bands, rows_per_band, shingle_k)
    sigs = _signatures(corpus, n_hashes, shingle_k).persist()
    try:
        sigs.write.mode(mode).parquet(sig_path)
        write_range_sorted(
            band_buckets(sigs, n_bands=n_bands, rows_per_band=rows_per_band),
            bucket_path,
            ["band", "bucket"],
            mode=mode,
        )
    finally:
        sigs.unpersist()
    if mode != "append":
        spark.createDataFrame(
            [(n_hashes, n_bands, rows_per_band, shingle_k)],
            "n_hashes int, n_bands int, rows_per_band int, shingle_k int",
        ).write.mode(mode).parquet(meta_path)


def _check_meta(
    spark: SparkSession,
    meta_path: str,
    n_hashes: int,
    n_bands: int,
    rows_per_band: int,
    shingle_k: int,
) -> None:
    got = spark.read.parquet(meta_path).collect()[0]
    want = (n_hashes, n_bands, rows_per_band, shingle_k)
    have = (got.n_hashes, got.n_bands, got.rows_per_band, got.shingle_k)
    if want != have:
        raise ValueError(
            f"index at {meta_path} was written with (n_hashes, n_bands, "
            f"rows_per_band, shingle_k)={have}, query asked for {want} — "
            "band hashes would disagree and recall would silently collapse"
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
    """
    if n_hashes != n_bands * rows_per_band:
        raise ValueError("n_hashes must equal n_bands * rows_per_band")
    sig_path, bucket_path, meta_path = _paths(index_dir)
    spark = new_docs.sparkSession
    _check_meta(spark, meta_path, n_hashes, n_bands, rows_per_band, shingle_k)

    new_sigs = _signatures(new_docs, n_hashes, shingle_k).localCheckpoint()
    new_bands = band_buckets(new_sigs, n_bands=n_bands, rows_per_band=rows_per_band)
    old_buckets = spark.read.parquet(bucket_path).select(
        "band", "bucket", F.col("doc_id").alias("doc_b")
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
    sb_old = spark.read.parquet(sig_path).select(
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
        # append the SAME checkpointed signatures that produced the pairs
        new_sigs.write.mode("append").parquet(sig_path)
        write_range_sorted(
            band_buckets(new_sigs, n_bands=n_bands, rows_per_band=rows_per_band),
            bucket_path,
            ["band", "bucket"],
            mode="append",
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
