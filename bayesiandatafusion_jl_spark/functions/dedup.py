"""Deduplication operators (north-star J1/J2 + SimHash + embedding near-dup).

Five strategies, each with its scale story:

- exact (J1): hash-groupBy on a normalized content hash — one shuffle on
  the 256-bit key, perfectly balanced.
- n-gram Jaccard (J2 exact): shingle → token-postings self-join → pair
  agg. Exact but O(Σ df²); bounded here, LSH at scale.
- MinHash+LSH (J2 scale): shingle → minhash signature → band buckets →
  join only within buckets. Candidate set shrinks from |D|² to Σ|bucket|²;
  this is the 100 TB path.
- SimHash: 64-bit projection of the token set; near-dups differ in few
  bits — bucket by 16-bit sub-keys (pigeonhole: hamming ≤ 3 ⇒ one of the 4
  sub-keys equal).
- embedding cosine: near-dup ⇔ cosine ≥ τ on document embeddings (reuses
  the vector surface).

All signature computation is built-in (xxhash64/sha2/explode/agg) — no
Python in the signature path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dot, sql_dot
from bayesiandatafusion_jl_spark.registry import register


def normalized_text(col: str = "text") -> F.Column:
    return F.trim(F.lower(F.col(col)))


@register(
    "q_llm_exact_dedup",
    oracle="""
    SELECT sha256(TRIM(LOWER(text))) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(TRIM(LOWER(text)))
    """,
    tags=("J1",),
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — exact dedup: group by normalized content hash, keep the lowest
    doc_id (deterministic representative)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.sha2(normalized_text(), 256))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "q_llm_near_dedup",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents WHERE doc_id % 5 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    """,
    tags=("J2",),
)
def q_llm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (exact, bounded) — token-set Jaccard ≥ 0.5 pairs on a 1/5 doc
    sample. Exact formulation for the oracle; the unbounded-scale variant
    is ``q_llm_near_dedup_lsh`` below."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    tok = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    common = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return jac.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


def shingles(docs: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """k-token shingles (sliding word k-grams), one row per distinct shingle.

    Shingling, not unigrams, is what makes MinHash work on real corpora:
    with a small vocabulary two unrelated documents share most unigrams
    (random-pair Jaccard ≈ 0.3 here → LSH buckets go quadratic, measured
    278 s at sf0.1), while exact k-gram matches between unrelated docs are
    rare (random-pair Jaccard ≈ 0). Pure built-ins: transform over a
    sequence of positions, then explode.

    ``distinct=False`` skips the global (doc_id, shingle) dedup shuffle —
    pass it when every downstream consumer is duplicate-insensitive
    (MinHash ``min``, ``collect_set``): the explode then pipelines straight
    into the consumer's aggregation with zero extra exchanges.
    """
    # Guard: a document with fewer than k tokens yields ZERO shingles
    # (matching the UDTF semantics) — without this, sequence(0, 0) emits
    # one truncated "shingle" that skews Jaccard for very short docs.
    toks = docs.withColumn("toks", F.split(F.lower("text"), r"\s+")).filter(
        F.size("toks") >= k
    )
    sh = toks.withColumn(
        "shingle",
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(size(toks) - {k}, 0)),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ),
    )
    out = sh.filter(F.col("shingle") != "").select("doc_id", "shingle")
    return out.distinct() if distinct else out


@register(
    "q_llm_shingle_udtf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 3
    )
    SELECT doc_id, COUNT(*) AS n_shingles,
           COUNT(DISTINCT shingle) AS n_distinct
    FROM sh
    GROUP BY doc_id
    """,
    tags=("J2", "udtf"),
)
def q_llm_shingle_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.K — shingle expansion as a Python UDTF (Spark 4 table function):
    each document row yields its 3-token shingles via a lateral join, then
    per-doc shingle statistics. The UDTF is the row-generating counterpart
    of the built-in ``shingles()`` (same semantics, checked by the same
    oracle shape); a production pipeline uses whichever reads better —
    they compile to the same shuffle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, shingle: string")
    class Shingle3:
        def eval(self, doc_id: int, text: str):
            toks = [t for t in text.lower().split(" ") if t != ""]
            for i in range(len(toks) - 2):
                yield doc_id, " ".join(toks[i : i + 3])

    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("__shingle_docs")
    spark.udtf.register("shingle3_udtf", Shingle3)
    return spark.sql(
        """
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               COUNT(DISTINCT s.shingle) AS n_distinct
        FROM __shingle_docs, LATERAL shingle3_udtf(doc_id, text) s
        GROUP BY s.doc_id
        """
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 32, k: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """MinHash signatures over k-token shingles, fully JVM-side.

    h_i(shingle) = xxhash64(xxhash64(shingle), seed=i); signature[i] = min
    over shingles. Returns (doc_id, sig: array<long>). One explode + one groupBy
    on doc_id — linear in corpus size, the 100 TB-safe shape.

    Pass a precomputed (persisted) ``sh`` shingle frame when the caller
    also needs the shingles (e.g. for candidate verification) so the
    corpus is shingled once, not twice.

    Hash family: the shingle STRING is hashed once (xxhash64), then the
    n_hashes member hashes re-hash that fixed-width 64-bit value with the
    member index as seed — 1 variable-length + n fixed-width hashes per
    shingle instead of n variable-length ones (the standard derived-hash
    MinHash construction; ~35% faster signature pass measured at sf0.1).
    """
    if sh is None:
        sh = shingles(docs, k=k)
    return (
        sh.withColumn("h64", F.xxhash64("shingle"))
        .groupBy("doc_id")
        .agg(
            F.array(
                *[F.min(F.xxhash64("h64", F.lit(i))) for i in range(n_hashes)]
            ).alias("sig")
        )
    )


def band_buckets(
    sigs: DataFrame, n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band, bucket) band-hash frame of a signature frame — the
    shared LSH banding used both inline (``lsh_candidate_pairs``) and at
    rest (``dedup_index.write_signature_index``); the two MUST hash bands
    identically or an incremental query would probe the wrong buckets.
    Map-side: one posexplode, n_bands rows per doc."""
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidates.

    One explode (n_bands rows/doc) + ONE shuffle on (band, bucket):
    ``collect_list`` gathers each bucket's posting list, and the ordered
    pairs are generated in-task from the sorted list — the r5 version
    self-joined the exploded band frame (two shuffle sides + a join) for
    the same result. The final distinct runs on the pair set, which is
    bounded by the true-duplicate count, not corpus size.

    Pair generation is a TWO-LEVEL explode (posexplode the sorted list,
    then explode each element's tail slice): the pairs stream out of the
    generators with only O(bucket) memory per row, so even the giant
    bucket a boilerplate-heavy corpus grows (thousands of identical docs)
    cannot OOM a task — unlike a ``flatten(transform(...))``-style
    expansion, which materializes the whole B(B-1)/2 pair array in one
    task before exploding. The quadratic pair OUTPUT for such a bucket is
    inherent to pair listing; this shape just never holds it in memory.
    """
    bands = band_buckets(sigs, n_bands=n_bands, rows_per_band=rows_per_band)
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    return (
        buckets.select(F.posexplode("ds").alias("__i", "doc_a"), "ds")
        .select(
            "doc_a",
            F.explode(F.expr("slice(ds, __i + 2, size(ds))")).alias("doc_b"),
        )
        .distinct()
    )


def _twin_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a mutated twin (first token dropped) for every doc with
    doc_id % 7 == 0 — the shared planted ground truth all three near-dup
    methods are measured against (twin ids are original + 1_000_000)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return docs.unionByName(twins)


@register("q_llm_near_dedup_lsh", oracle=None, tags=("J2", "lsh"), demoted=True)
def q_llm_near_dedup_lsh(
    spark: SparkSession, sf_dir: str, corpus: DataFrame | None = None
) -> DataFrame:
    """J2 (scale path) — MinHash+LSH near-dup over the pinned twin corpus
    (the frame-level ``lsh_near_dup_pairs``). Rows-only driver check (hash
    seeds are engine-specific); recall vs exact J2 asserted in tests.

    Self-duplicates are constructed (testdata texts are unique): each doc
    with doc_id % 7 == 0 gets a mutated twin (first token dropped), and the
    operator must find twin pairs.
    """
    if corpus is None:
        corpus = _twin_corpus(spark, sf_dir)
    return lsh_near_dup_pairs(corpus)


def lsh_near_dup_pairs(
    corpus: DataFrame,
    jaccard_min: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup pairs over an ARBITRARY (doc_id, text) frame —
    the library form: shingle → signatures → banded candidates → exact
    Jaccard verify on the candidate set only. Returns
    (doc_a, doc_b, jaccard) with jaccard ≥ ``jaccard_min``; feed the pairs
    to ``dedup_keep_representatives`` to actually drop duplicates.

    CANDIDATE RECALL IS GOVERNED BY THE BANDING, not by ``jaccard_min``:
    a pair reaches the verify stage with probability 1−(1−s^r)^b (the LSH
    S-curve; threshold ≈ (1/b)^(1/r) — ~0.59 for the default 8×4), so a
    ``jaccard_min`` far below that threshold returns only the subset of
    qualifying pairs the banding happens to catch. Lowering the target
    similarity means retuning ``n_bands``/``rows_per_band`` (more bands,
    fewer rows per band), with ``n_hashes = n_bands × rows_per_band``.

    Execution shape (r6): two passes, each linear and bounded.

    - Pass 1 — signatures only: ONE groupBy(doc_id) over a non-distinct
      shingle explode computes the 32 MinHash mins. No ``collect_set``
      here: the r5 single-pass version built the full token SET for every
      document in the same agg, and at 100 TB that all-docs collect_set —
      not the bucketed candidate join — dominates the aggregation memory.
    - Pass 2 — verify sets for CANDIDATE docs only: the candidate pair set
      is bounded by the true-duplicate count, so the docs needing an exact
      Jaccard check are too. A broadcast semi-join prunes the corpus to
      those docs before re-shingling and ``collect_set``-ing; the verify
      join inputs shrink from |corpus| to O(|dups|) rows.

    The candidate pair set is materialized eagerly on the EXECUTORS
    (localCheckpoint — bounded rows, never through the driver) so the
    corpus-sized signature cache is released before the verify pass runs;
    nothing corpus-sized stays cached on return.
    """
    if n_hashes != n_bands * rows_per_band:
        raise ValueError("n_hashes must equal n_bands * rows_per_band")
    sigs = minhash_signatures(
        corpus, n_hashes=n_hashes, k=shingle_k,
        sh=shingles(corpus, k=shingle_k, distinct=False),
    ).persist()
    # eager executor-side materialization (bounded by true-dup count) so the
    # corpus-sized signature cache releases before the verify pass
    cands = lsh_candidate_pairs(
        sigs, n_bands=n_bands, rows_per_band=rows_per_band
    ).localCheckpoint()
    sigs.unpersist()
    # the candidate count gates every broadcast decision below: the pair
    # set is bounded by the corpus's true-dup structure, NOT by corpus
    # size, but "bounded" is an empirical fact, not a guarantee — a 20%
    # dup rate at 100 TB makes cand_docs millions of rows carrying full
    # token sets, and an unconditional F.broadcast() hint would override
    # autoBroadcastJoinThreshold and OOM the driver. Count the (already
    # checkpointed) pairs and fall back to shuffle joins when large.
    n_pairs = cands.count()
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    if 2 * n_pairs <= 1_000_000:  # ids only — cheap fixed-width rows
        cand_docs = F.broadcast(cand_docs)
    # token sets ONLY for docs that appear in a candidate pair — bounded,
    # checkpointed so ta/tb below read it instead of re-shingling twice
    toks = (
        shingles(corpus.join(cand_docs, "doc_id", "left_semi"), k=shingle_k, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("toks"))
        .localCheckpoint()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    # gate the token-set broadcast on measured BYTES, not row count: a row
    # here carries a whole shingle set, so 100k rows of 10k-shingle docs
    # would be tens of GB. toks is checkpointed, so the size agg is cheap.
    tok_bytes = toks.agg(
        F.coalesce(
            F.sum(
                F.aggregate(
                    "toks", F.lit(0).cast("long"), lambda a, s: a + F.length(s)
                )
            ),
            F.lit(0),
        ).alias("b")
    ).collect()[0]["b"]
    if tok_bytes <= 64 * 1024 * 1024:
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    verified = (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
            / F.size(F.array_union("toks_a", "toks_b")),
        )
        .filter(F.col("jaccard") >= jaccard_min)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


@register(
    "q_llm_scale_suite",
    oracle=None,
    tags=("J2", "J3", "D4", "lsh", "simhash", "ann", "mllib"),
)
def q_llm_scale_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale approximate operators in ONE driver row each, with
    their measured quality against the exact baselines (rows-only check —
    hash seeds/sketches are engine-specific by design):

    - ``minhash_lsh`` / ``simhash`` / ``mllib_minhash``: near-dup twin
      recovery. Ground truth: every doc with doc_id % 7 == 0 gets a
      mutated twin (first token dropped); quality = fraction of twin
      pairs found (banded/bucketed candidates only — no all-pairs).
    - ``incremental_lsh`` (r8): the twin SHARD probed against the
      persisted signature index (functions/dedup_index.py) — only the
      shard is signed; same twin recall metric.
    - ``ivf_knn`` / ``mllib_brp`` / ``ivf_index`` (r8): ANN top-5 for 10
      queries; quality = recall vs the exact brute-force cosine top-5
      (q_llm_knn); ``ivf_index`` serves from the persisted
      partition-pruned inverted file (functions/vector_index.py).
    - ``ivfpq_knn`` / ``ivfpq_index`` (r11): the residual-PQ ADC paths
      (functions/vector_pq.py / the PQ-bearing persisted index), same
      recall metric — candidate scoring reads M-byte codes, never the
      embeddings; the exact refine re-rank recovers plain-IVF recall.
    - ``approx_distinct``: HLL++ distinct users (D4); quality =
      approx/exact ratio (2% target precision).
    - ``cms_bound`` (r11): count-min sketch point-frequency estimates
      for the top-20 tokens; quality = fraction within the ε·N
      overcount bound (guaranteed ≥ 1−δ).

    Each leg's plan stays linear (signature computation) + bucketed join
    (candidates); the only driver data are these scalar summaries."""
    from bayesiandatafusion_jl_spark.catalog import load_table as _lt
    from bayesiandatafusion_jl_spark.functions.mllib_lsh import (
        q_llm_knn_brp_mllib,
        q_llm_near_dedup_mllib,
    )
    from bayesiandatafusion_jl_spark.functions.vector import q_llm_knn, q_llm_knn_ivf

    docs = load_table(spark, sf_dir, "documents")
    n_twins = docs.filter(F.col("doc_id") % 7 == 0).count()

    def twin_recall(pairs: DataFrame) -> tuple[int, float]:
        n = pairs.count()
        found = pairs.filter(
            (F.col("doc_a") % 7 == 0) & (F.col("doc_b") == F.col("doc_a") + 1_000_000)
        ).count()
        return n, (found / n_twins if n_twins else 0.0)

    rows = []
    # one shared, pinned twin corpus across the three near-dup legs (the
    # corpus union + text projection would otherwise be recomputed per leg)
    corpus = _twin_corpus(spark, sf_dir).persist()
    for method, fn in (
        ("minhash_lsh", q_llm_near_dedup_lsh),
        ("simhash", q_llm_simhash),
        ("mllib_minhash", q_llm_near_dedup_mllib),
    ):
        n, rec = twin_recall(fn(spark, sf_dir, corpus=corpus))
        rows.append((method, n, rec))
    corpus.unpersist()

    # r8: incremental path — twin shard probed against the PERSISTED
    # signature index (only the shard is signed; same twin ground truth;
    # pairs normalized to (orig, twin) order for the shared recall metric)
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        q_llm_dedup_incremental,
    )

    inc = q_llm_dedup_incremental(spark, sf_dir).select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    )
    n, rec = twin_recall(inc)
    rows.append(("incremental_lsh", n, rec))

    brute = q_llm_knn(spark, sf_dir).select("qid", "nb_id").persist()
    n_brute = brute.count()
    from bayesiandatafusion_jl_spark.functions.vector_index import q_llm_ann_index

    from bayesiandatafusion_jl_spark.functions.vector_index import (
        q_llm_ann_index_pq,
    )
    from bayesiandatafusion_jl_spark.functions.vector_pq import q_llm_knn_ivfpq

    for method, fn in (
        ("ivf_knn", q_llm_knn_ivf),
        ("mllib_brp", q_llm_knn_brp_mllib),
        # r8: same queries served from the PERSISTED partition-pruned index
        ("ivf_index", q_llm_ann_index),
        # r11: residual-PQ ADC + exact refine, in-session and persisted —
        # candidate scoring touches codes only (32× memory/I/O cut)
        ("ivfpq_knn", q_llm_knn_ivfpq),
        ("ivfpq_index", q_llm_ann_index_pq),
    ):
        ann = fn(spark, sf_dir).select("qid", "nb_id")
        hit = ann.join(brute, ["qid", "nb_id"], "left_semi").count()
        rows.append((method, ann.count(), hit / n_brute if n_brute else 0.0))
    brute.unpersist()

    ev = _lt(spark, sf_dir, "events")
    exact_approx = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).first()
    rows.append(
        ("approx_distinct", int(exact_approx["approx"]),
         float(exact_approx["approx"]) / exact_approx["exact"])
    )

    # r11: count-min sketch — quality = fraction of the top-20 exact
    # token counts whose CMS estimate respects the ε·N overcount bound
    # (guaranteed ≥ 1−δ; measured 1.0 on this corpus)
    from bayesiandatafusion_jl_spark.operators.aggregates import q_agg_cms

    cms = q_agg_cms(spark, sf_dir)
    cms_row = cms.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("within_bound").cast("double")).alias("q"),
    ).first()
    rows.append(("cms_bound", int(cms_row["n"]), float(cms_row["q"])))

    # r13: retrieval QUALITY of the persisted-index probes — macro
    # recall@10 / MRR / nDCG@10 under the PRODUCTION probe configs, with
    # pinned floors riding along (null floor = scale-dependent readout).
    # Legacy rows keep a null floor (their pins live in pytest).
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_quality_rows,
    )

    out = [(m, n, q, None) for m, n, q in rows]
    out.extend(retrieval_quality_rows(spark, sf_dir))
    return spark.createDataFrame(
        out, "method string, n_results long, quality double, floor double"
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash of the token multiset, via bit-vote aggregation.

    For each of 64 bits: vote +1 if xxhash64(token) has the bit set else
    −1; the sign of the vote sum is the signature bit. Pure explode + agg.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    h = tok.withColumn("h", F.xxhash64("token"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(0)
        for i in range(64)
    ]
    sig = votes.select(
        "doc_id",
        sum(bit_terms[1:], bit_terms[0]).alias("simhash"),
    )
    return sig


@register("q_llm_simhash", oracle=None, tags=("simhash",), demoted=True)
def q_llm_simhash(
    spark: SparkSession, sf_dir: str, corpus: DataFrame | None = None
) -> DataFrame:
    """SimHash near-dup: bucket by 16-bit sub-keys (hamming ≤ 3 guarantees
    a shared sub-key), verify candidates by exact hamming distance.
    Rows-only check; twin-pair recall asserted in tests."""
    if corpus is None:
        corpus = _twin_corpus(spark, sf_dir)
    sigs = simhash64(corpus)
    # 4 × 16-bit sub-keys; ONE shuffle on (band, sub): each bucket's
    # posting list carries (doc_id, simhash) structs so candidate pairs —
    # signatures included — expand in-task (the posting-list pattern
    # lsh_candidate_pairs and q_graph_components also use). The r6
    # version self-joined the exploded sub-key frame: two shuffle sides +
    # a join for the same pair set, ~2× the exchange volume.
    subkeys = sigs.select(
        F.struct("doc_id", "simhash").alias("ds_entry"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "sub"),
    )
    buckets = (
        subkeys.groupBy("band", "sub")
        # struct sort orders by the leading field → pairs oriented by doc_id
        .agg(F.sort_array(F.collect_list("ds_entry")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    # two-level explode (see lsh_candidate_pairs): pairs — signatures
    # included — stream out of the generators with O(bucket) memory per
    # row, so the random-collision buckets a 16-bit sub-keyspace grows at
    # corpus scale (N/65536 per band) or a boilerplate-heavy corpus
    # cannot OOM a task, with no join and no second upstream evaluation
    cands = (
        buckets.select(F.posexplode("ds").alias("__i", "pa"), "ds")
        .select(
            "pa",
            F.explode(F.expr("slice(ds, __i + 2, size(ds))")).alias("pb"),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
            F.col("pa.simhash").alias("sig_a"),
            F.col("pb.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@register(
    "q_llm_embed_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({sql_dot('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE {sql_dot('a.embedding', 'b.embedding')} >= 0.35
    """,
    tags=("embed-dedup",),
)
def q_llm_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ τ (vectors are
    L2-normalized → dot ≡ cosine). Blocked by label (the natural coarse
    bucket here; at scale the block key is an LSH/IVF cell id) so the
    self-join never goes quadratic over the full corpus.

    τ = 0.35 here: the synthetic embeddings are near-uniform on the sphere
    (max same-label cosine ≈ 0.47 at sf0.01), so the real-corpus τ ≈ 0.95
    matches NOTHING and the r1–r5 query hash-passed on an empty frame.
    0.35 selects the distribution's top tail (~26 pairs at sf0.01) so the
    oracle checks actual pair values; the plan is τ-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label")),
        )
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos_sim_raw", 4).alias("cos_sim"),
        )
    )
