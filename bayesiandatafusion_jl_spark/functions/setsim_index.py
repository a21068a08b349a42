"""Persisted EXACT set-similarity (PPJoin) index — incremental exact
near-dup (VERDICT r14 #5).

``fuzzy.set_similarity_join`` is the one-shot exact Jaccard join; this
module is its INCREMENTAL twin, the same contract ``dedup_incremental``
gives the approximate (MinHash) family: tokenize the base corpus ONCE,
persist the distinct-token frame, and let every new shard PPJoin-probe
against it without re-reading or re-tokenizing a byte of old text —
with EXACT results (the registered query's oracle is brute-force
all-pairs SQL, not a floor).

Layout under ``index_dir/`` (the shared index-family discipline):

    tokens/   ``tok_bucket=<b>/__epoch=<e>/`` rows (id, token, prk, n):
              every document's DISTINCT tokens with the doc's set size
              ``n`` and the token's rank ``prk`` in the doc's list under
              the FROZEN global order (below). ``tok_bucket =
              pmod(xxhash64(token), n_buckets)`` is the outer partition
              level, so a probe prunes the candidate scan to its own
              prefix-token buckets — the BM25 posting-partition
              contract.
    order/    the FROZEN frequency order: (token, freq) of the BASE
              corpus. The prefix filter is lossless under ANY total
              order shared by both sides (Chaudhuri et al. SSJoin), so
              the order is pinned at build time like the pipeline's
              decontamination benchmark: every shard ranks its tokens
              under this one frame (unseen tokens get freq 0 — rarest,
              which is almost always TRUE of genuinely new vocabulary —
              tie-broken by token string). Frequencies drifting away
              from the pin cost only candidate EFFICIENCY, never a
              pair; a rebuild refreshes the order.
    meta/     (n_buckets,) — a probe under a different bucketing would
              prune partitions its tokens actually live in.

Correctness: prefix positions, length bounds, and the PPJoin positional
bound are all evaluated under the frozen order exactly as in the
one-shot join; the final verify is the exact ``array_intersect``
overlap, so the output equals the one-shot join restricted to pairs
touching the new shard — pytest pins the equality corpus-wide, and the
registered query's DuckDB oracle re-derives it as brute-force SQL.

Scale shape: a probe tokenizes ONLY its shard; the candidate scan is
partition-pruned to the shard's prefix-token buckets and reads (id,
token, prk, n) rows — never text; the verify re-reads stored tokens for
candidate ids only (one semi-join-restricted scan). Appends are
idempotent per-epoch dynamic overwrites (``index_meta.write_epoch``),
replayed shards exclude their own epoch from the probe scans (the
``dedup_incremental`` replay-hole guard), deletes are shared-machinery
tombstones, and ``compact_setsim_index`` folds epochs + applies deletes
physically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

def _distinct_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token): the distinct whitespace-token frame —
    tokenization-identical to ``fuzzy.set_similarity_join`` (pinned by
    tests/test_fuzzy.py's single-space corpus test)."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def _ranked(tok: DataFrame, order: DataFrame, n_buckets: int) -> DataFrame:
    """(id, token, prk, n, tok_bucket): rank every doc's tokens under
    the frozen (freq asc, token asc) total order. Unseen tokens rank
    rarest (freq 0)."""
    with_freq = tok.join(order, "token", "left").withColumn(
        "__freq", F.coalesce(F.col("freq"), F.lit(0))
    )
    win = W.partitionBy("id").orderBy("__freq", "token")
    return (
        with_freq.withColumn("prk", F.row_number().over(win))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("id")))
        .select(
            "id",
            "token",
            F.col("prk").cast("int").alias("prk"),
            F.col("n").cast("int").alias("n"),
            F.pmod(F.xxhash64("token"), F.lit(n_buckets))
            .cast("int")
            .alias("tok_bucket"),
        )
    )


def write_setsim_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Build (overwrite) the exact set-similarity index from a
    (doc_id, text) corpus: one tokenize, one token-grain frequency agg
    (the frozen order), one doc-grain rank window. A fresh build starts
    a new incarnation: tombstones and the fold ledger reset, exactly
    like ``write_bm25_index(mode='overwrite')``."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        reset_ledger,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        clear_tombstones,
        index_paths,
        write_epoch,
        write_meta,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = corpus.sparkSession
    tokens_path, order_path, meta_path = index_paths(
        index_dir, "tokens", "order", "meta"
    )
    tok = checkpoint_df(_distinct_tokens(corpus, id_col, text_col))
    order = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    order.write.mode("overwrite").parquet(order_path)
    write_epoch(
        _ranked(tok, spark.read.parquet(order_path), n_buckets),
        tokens_path,
        "base",
        fresh=True,
        outer_cols=("tok_bucket",),
    )
    write_meta(spark, meta_path, "overwrite", n_buckets=n_buckets)
    clear_tombstones(spark, index_dir)
    reset_ledger(spark, index_dir)


def setsim_incremental(
    new_docs: DataFrame,
    index_dir: str,
    tau: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = False,
    epoch: str | None = None,
) -> DataFrame:
    """EXACT Jaccard >= ``tau`` pairs of a NEW shard against the stored
    index + within itself, without re-tokenizing the old corpus.

    Returns (id_a, id_b, overlap, jaccard, pair_type) with id_a < id_b;
    ``pair_type`` is ``new_index`` (one side stored) or ``new_new``
    (both in the shard). Unlike ``dedup_incremental`` the scores are
    EXACT — the registered query's DuckDB oracle is the brute-force
    all-pairs join restricted to pairs touching the shard.

    ``update_index=True`` appends the shard's ranked tokens as its own
    ``__epoch=<epoch>`` partition (idempotent dynamic overwrite; a
    replayed shard replaces its own rows) and the probe scans exclude
    that epoch, so a replay whose earlier attempt crashed after the
    append still reproduces the original pair set — the
    ``dedup_incremental`` replay-hole guard, verbatim. The frozen order
    frame is never touched by appends (see module doc).
    """
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    if update_index and not epoch:
        raise ValueError(
            "update_index=True needs a unique epoch per shard (the append"
            " is an idempotent per-epoch overwrite)"
        )
    if epoch == "base":
        raise ValueError("epoch='base' is reserved for write_setsim_index")
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        anti_join_tombstones,
        index_paths,
        read_meta,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    # the shared PPJoin filter expressions — literally the one-shot
    # join's implementations, so the pinned equality cannot drift
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        ppjoin_length_filter,
        ppjoin_positional_filter,
        ppjoin_prefix_len,
    )

    spark = new_docs.sparkSession
    tokens_path, order_path, meta_path = index_paths(
        index_dir, "tokens", "order", "meta"
    )
    if update_index:
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            check_not_folded,
        )

        check_not_folded(spark, index_dir, epoch)
    n_buckets = int(read_meta(spark, meta_path)["n_buckets"])

    ranked_new = checkpoint_df(
        _ranked(
            _distinct_tokens(new_docs, id_col, text_col),
            spark.read.parquet(order_path),
            n_buckets,
        )
    )
    plen = lambda n: ppjoin_prefix_len(tau, n)  # noqa: E731
    prefix_new = ranked_new.filter(F.col("prk") <= plen(F.col("n")))

    # partition-prune the stored scan to the shard's prefix-token
    # buckets (<= n_buckets values — a bounded driver-side list, the
    # bm25_query_index discipline)
    buckets = sorted(
        r["tok_bucket"]
        for r in prefix_new.select("tok_bucket").distinct().collect()
    )

    def _stored(path: str) -> DataFrame:
        scan = spark.read.parquet(path)
        if update_index:
            # replay-hole guard: never probe this shard's own stale rows
            scan = scan.filter(F.col("__epoch") != epoch)
        return anti_join_tombstones(spark, index_dir, scan, "id")

    if update_index:
        # Loud refusal on id collisions (r15): a shard doc_id already
        # LIVE in the index under a different epoch (upstream
        # redelivery — invisible to the same-epoch replay guard) would
        # merge its token sets across epochs on every later probe,
        # silently corrupting exact scores. One column-pruned
        # distinct-id scan before any write catches it; the probe-only
        # path needs no scan (verify sides are src-scoped below).
        # Re-appending a TOMBSTONED id stays hidden until a rebuild —
        # the documented family contract (delete_from_setsim_index).
        clash = (
            _stored(tokens_path)
            .select("id")
            .join(ranked_new.select("id").distinct(), "id", "left_semi")
            .limit(5)
            .collect()
        )
        if clash:
            ids = sorted(r["id"] for r in clash)
            raise ValueError(
                f"shard doc_ids {ids} are already indexed at {index_dir}"
                " under other epochs — appending them again would merge"
                " token sets across epochs and corrupt exact scores;"
                " delete the old rows (tombstone + compact) or re-ingest"
                " under fresh ids"
            )
    stored_prefix = (
        _stored(tokens_path)
        .filter(F.col("tok_bucket").isin(buckets))
        .filter(F.col("prk") <= plen(F.col("n")))
    )

    # ONE token-collision join covers both pair kinds: the b-side is the
    # stored prefixes UNION the shard's own (the shard's ranks already
    # live under the frozen order, so intra-shard prefixes need no
    # second ranking pass — one shared total order, one join)
    a = prefix_new.select(
        F.col("id").alias("id_a"), F.col("n").alias("n_a"), "token",
        F.col("prk").alias("prk_a"),
    )
    b = stored_prefix.select(
        F.col("id").alias("id_b"), F.col("n").alias("n_b"), "token",
        F.col("prk").alias("prk_b"), F.lit("new_index").alias("pair_type"),
    ).unionByName(
        prefix_new.select(
            F.col("id").alias("id_b"), F.col("n").alias("n_b"), "token",
            F.col("prk").alias("prk_b"), F.lit("new_new").alias("pair_type"),
        )
    )
    cand = (
        a.join(b, "token")
        .filter(
            F.when(
                F.col("pair_type") == "new_new",
                F.col("id_a") < F.col("id_b"),
            ).otherwise(F.col("id_a") != F.col("id_b"))
        )
        .filter(ppjoin_length_filter(tau))
        .filter(ppjoin_positional_filter(tau))
        .select("id_a", "id_b", "pair_type")
        .distinct()
    )

    sets_new = ranked_new.groupBy("id").agg(
        F.sort_array(F.collect_set("token")).alias("toks")
    )
    cand_old_ids = (
        cand.filter(F.col("pair_type") == "new_index")
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    sets_old = (
        _stored(tokens_path)
        .join(cand_old_ids, "id", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("token")).alias("toks"))
    )
    pa = sets_new.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    # each pair kind verifies against ITS OWN side's token sets
    # (src ↔ pair_type below): if a shard doc_id also exists in the
    # index, a bare id join would fan every candidate into one row per
    # copy — conflicting 'exact' scores
    pb = (
        sets_old.withColumn("__src", F.lit("new_index")).unionByName(
            sets_new.withColumn("__src", F.lit("new_new"))
        )
    ).select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), "__src"
    )
    paired = (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .filter(F.col("pair_type") == F.col("__src"))
    )
    verified = (
        paired.select(
            "id_a",
            "id_b",
            "pair_type",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("overlap"),
            F.size("toks_a").alias("n_a"),
            F.size("toks_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("overlap")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("overlap").cast("bigint").alias("overlap"),
            "jaccard",
            "pair_type",
        )
    )
    if update_index:
        from bayesiandatafusion_jl_spark.functions.index_meta import (
            write_epoch,
        )
        from bayesiandatafusion_jl_spark.session import checkpoint_df as _ck

        # materialize the pair set BEFORE the overwrite deletes files the
        # lazy plan pinned at read time (dedup_incremental's ordering)
        verified = _ck(verified)
        write_epoch(
            ranked_new, tokens_path, epoch, fresh=False,
            outer_cols=("tok_bucket",),
        )
    return verified


def delete_from_setsim_index(
    spark: SparkSession, index_dir: str, doc_ids
) -> None:
    """Logically delete documents (shared tombstone machinery — see
    ``index_meta``): deleted docs stop surfacing as ``new_index``
    partners immediately; ``compact_setsim_index`` purges them
    physically."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        append_tombstones,
    )

    append_tombstones(spark, index_dir, doc_ids)


def compact_setsim_index(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> DataFrame:
    """Fold the token epochs into one compact epoch (small-file
    maintenance for a long-running ingest), applying tombstones
    physically during the rewrite — the ``compact_bm25_index`` shape
    minus the stats reconcile (this index derives every probe quantity
    from the rows themselves). ``tok_bucket`` stays the outer partition
    level, so probe pruning is untouched."""
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

    (tokens_path,) = index_paths(index_dir, "tokens")
    purge = tombstone_purge(spark, index_dir, "id")
    new_epoch, epochs = begin_fold(
        spark, index_dir, tokens_path, force=purge is not None
    )
    stats = compact_epochs(
        spark, tokens_path, new_epoch, outer_cols=("tok_bucket",),
        target_mb=target_mb, transform=purge,
    )
    if purge is not None:
        clear_tombstones(spark, index_dir)
    return _stats_row(spark, [("tokens", *stats)])


def setsim_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row health report — the ``index_stats`` discipline: token
    rows, indexed docs, vocabulary size, epoch/file counts, and the
    bucket hot-spot ratio (max/mean rows per tok_bucket — a skewed
    bucket concentrates probe cost exactly like a hot BM25 bucket)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import index_paths

    tokens_path, order_path = index_paths(index_dir, "tokens", "order")
    tok = spark.read.parquet(tokens_path)
    per_bucket = tok.groupBy("tok_bucket").agg(F.count(F.lit(1)).alias("c"))
    row = per_bucket.agg(
        F.sum("c").alias("n_tokens"),
        (F.max("c") / F.avg("c")).alias("bucket_skew"),
    ).collect()[0]
    more = tok.agg(
        F.countDistinct("id").alias("n_docs"),
        F.countDistinct("__epoch").alias("n_epochs"),
    ).collect()[0]
    vocab = spark.read.parquet(order_path).count()
    n_files = len(tok.inputFiles())
    return spark.createDataFrame(
        [
            (
                int(row["n_tokens"]),
                int(more["n_docs"]),
                int(vocab),
                int(more["n_epochs"]),
                int(n_files),
                float(row["bucket_skew"]),
            )
        ],
        "n_tokens bigint, n_docs bigint, vocab bigint, n_epochs int,"
        " n_files int, bucket_skew double",
    )


_SETSIM_BOUNDARY = 300


@register(
    "q_text_setsim_incremental",
    # FULL oracle (unlike the MinHash incremental family): brute-force
    # all-pairs Jaccard over the same 400 documents, restricted to pairs
    # touching the shard (id_b >= boundary) — proving the persisted
    # prefix/positional machinery loses no pair ACROSS the epoch
    # boundary and scores exactly.
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS id, token FROM (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
        FROM documents WHERE doc_id < 400
      ) t WHERE token <> ''
    ),
    sz AS (SELECT id, COUNT(*) AS n FROM tok GROUP BY id),
    ov AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS o
      FROM tok a JOIN tok b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT ov.id_a AS id_a, ov.id_b AS id_b,
           CAST(ov.o AS BIGINT) AS overlap,
           ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) AS jaccard,
           CASE WHEN ov.id_a < {_SETSIM_BOUNDARY} THEN 'new_index'
                ELSE 'new_new' END AS pair_type
    FROM ov
    JOIN sz na ON na.id = ov.id_a
    JOIN sz nb ON nb.id = ov.id_b
    WHERE ov.id_b >= {_SETSIM_BOUNDARY}
      AND ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) >= 0.5
    ORDER BY id_a, id_b
    """,
    tags=("J2", "text", "set-similarity", "incremental"),
    demoted=True,
)
def q_text_setsim_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (exact incremental path): index documents with doc_id < 300
    once, then exact-Jaccard the 300..399 shard against the stored index
    + itself at tau=0.5 — every pair the one-shot join would emit for
    the shard, without re-tokenizing the base corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    base = docs.filter(F.col("doc_id") < _SETSIM_BOUNDARY)
    shard = docs.filter(F.col("doc_id") >= _SETSIM_BOUNDARY)
    index_dir = f"/tmp/bdf_setsim_index/{sf_dir.strip('/').replace('/', '_')}"
    write_setsim_index(base, index_dir)
    return setsim_incremental(shard, index_dir, tau=0.5).orderBy(
        "id_a", "id_b"
    )
