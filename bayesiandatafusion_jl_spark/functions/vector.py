"""Vector functions & similarity search (SURVEY §2 H4, J3, J4).

The dot product u·v is the reference's prediction kernel [paper:BPMF]; the
kNN/centroid queries are the north-star similarity-search surface over the
``embeddings`` table (dim=64, L2-normalized → dot ≡ cosine).

Scale design:
- brute-force top-k is the *correctness baseline*: |Q|×|N| dot products via
  a broadcast of the query side — embarrassingly parallel, no shuffle of
  the corpus;
- the scale path is LSH/IVF bucketing (see ``ann_ivf_topk``): corpus is
  partitioned by coarse centroid id, queries probe only their closest
  buckets — turns O(|Q|·|N|) into O(|Q|·|N|/√buckets) with a bounded
  recall loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dot, sql_dot
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_fn_array_dot",
    oracle=f"""
    SELECT vec_id, label,
           len(embedding) AS dim,
           ROUND({sql_dot('embedding', 'embedding')}, 4) AS self_dot,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1
    FROM embeddings
    """,
    tags=("H4",),
    demoted=True,  # r12: H4's dot kernel is hash-checked on every
    # q_llm_knn pair (same sql_dot template); slot freed for
    # q_events_funnel. Local parity gate unchanged.
)
def q_fn_array_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 — array ops + dot product (the u·v prediction kernel
    [paper:BPMF]) as a pure codegen'd fold — no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(dot("embedding", "embedding"), 4).alias("self_dot"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
    )


@register(
    "q_llm_knn",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid, e.vec_id AS nb_id,
             ROUND({sql_dot('q.qe', 'e.embedding')}, 4) AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, nb_id, score,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nb_id ASC) AS rk
      FROM pairs
    )
    SELECT qid, nb_id, score, rk FROM ranked WHERE rk <= 5
    """,
    tags=("J3",),
    demoted=True,
    # r12: demoted to free a driver slot for q_llm_hybrid_index, whose
    # oracle CONTAINS this exact brute-cosine ranking as its exhaustive
    # dense leg (n_probe == n_cells) — J3's brute baseline stays
    # driver-hash-covered there; identical local parity gate here
)
def q_llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — brute-force cosine top-k: 10 query vectors vs the corpus
    (the frame-level ``knn_topk``; at 100 TB swap to ``ann_ivf_search``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return knn_topk(emb, q, k=5)


def knn_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, exclude_self: bool = True
) -> DataFrame:
    """Brute-force cosine top-k over ARBITRARY frames — the library form
    (the registered ``q_llm_knn`` is its pinned instantiation).

    ``corpus``: (vec_id, embedding); ``queries``: (qid, qe) — unit-norm
    vectors, so dot ≡ cosine. ``exclude_self`` drops corpus rows whose
    vec_id EQUALS the query's qid — correct when queries are corpus
    members (the registered query); pass ``exclude_self=False`` when the
    query ids live in a DIFFERENT id space, or an unrelated corpus vector
    that happens to share a query's id would silently be excluded.

    The query side is broadcast (it is small in every top-k workload);
    each corpus partition computes its dot products independently — no
    corpus shuffle; row_number keeps top-k with the (rounded score, nb_id)
    tiebreak so selection is deterministic cross-engine. This is the
    exact-baseline path; ``ann_ivf_search`` is the sub-linear scale path.
    """
    cond = F.col("vec_id") != F.col("qid") if exclude_self else F.lit(True)
    pairs = corpus.join(F.broadcast(queries), cond).select(
        "qid",
        F.col("vec_id").alias("nb_id"),
        F.round(dot("qe", "embedding"), 4).alias("score"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


@register(
    "q_llm_centroid",
    oracle="""
    SELECT label, pos,
           ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*), 6) AS c
    FROM (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ) t
    GROUP BY label, pos
    """,
    tags=("J4",),
    demoted=True,  # r12: folded into q_agg_vector_sum's `c` column
    # (identical grouping + /count); slot freed for q_matview_rollup.
)
def q_llm_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — per-label embedding centroid (element-wise mean, the D9 moment
    pattern). Output long-form (label, pos, c) for SQL parity; the array
    form is one ``array_agg(pos order)`` away."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v")
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("c")
    )


def _cells_literal(centers: list) -> "F.Column":
    """n_cells centroid structs as ONE literal array column.

    Field order (cd later prepended first) makes struct comparison do the
    argmax: max over (cd, nid) picks highest dot, then nid = -cell_id
    breaks ties toward the LOWEST cell id — deterministic, pure codegen.

    Built as ONE parsed ``F.expr`` (the ``int_in_list`` precedent, r15):
    the element-wise ``F.lit``/``F.struct`` form paid one py4j round-trip
    per scalar — measured 2.9 s of pure driver chatter PER CALL at
    32 cells × 64 dims (~2.3k round-trips), on the critical path of every
    ANN probe, assignment and k-means round — vs ~10 ms for a single
    parse of the same tree. ``repr`` emits the shortest round-trip
    decimal and the JVM's parse is correctly rounded, so the folded
    literal is BIT-identical to the ``F.lit`` form (pinned, including the
    -0.0 sign, by tests/test_vector_index.py::test_cells_literal_one_expr
    _matches_per_element_form); the analyzed casts constant-fold, so the
    optimized plan is the same literal array as before.
    """
    parts = []
    for i, c in enumerate(centers):
        ce = ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in c)
        parts.append(f"named_struct('cell_id',{i},'nid',{-i},'ce',array({ce}))")
    return F.expr(f"array({','.join(parts)})")


def _cell_scores(cells, vec_col) -> "F.Column":
    """Per-row array of (cd, nid) structs: dot against every centroid,
    computed in ONE map-side ``transform`` — whole-stage codegen, no join."""
    return F.transform(
        cells,
        lambda c: F.struct(dot(F.col(vec_col), c["ce"]).alias("cd"), c["nid"].alias("nid")),
    )


# Above this many cells the literal struct array is swapped for a broadcast
# single-row centroid frame: a codegen'd expression tree grows with
# n_cells × dim literals, and a production 4k–65k-cell index would blow the
# generated-code size limit; the data path carries the SAME array as data.
_CELLS_LITERAL_MAX = 128


def _cells_attacher(spark: SparkSession, centers: list):
    """Build ONE centroid attachment and return ``attach(df) -> (df, col)``.

    ≤ _CELLS_LITERAL_MAX cells → the pure-literal expression (zero join,
    zero shuffle, the whole argmax inside whole-stage codegen). Above that
    → ONE single-row broadcast crossJoin whose only column is the same
    array as DATA: still zero corpus shuffles for assignment (a broadcast
    nested-loop join against one row is a map-side operation), but the
    plan size is independent of n_cells, so 4k–65k-cell production indexes
    stay plannable. Downstream argmax/top-n code is identical either way.

    Returning an attacher (instead of attaching directly) lets a caller
    with several frames — ann_ivf_topk attaches to both the corpus and the
    query side — share one centroid frame rather than serializing and
    broadcasting an identical single-row frame once per attachment.
    """
    if len(centers) <= _CELLS_LITERAL_MAX:
        lit = _cells_literal(centers)
        return lambda df: (df, lit)
    arr = [(i, -i, [float(v) for v in c]) for i, c in enumerate(centers)]
    cframe = spark.createDataFrame(
        [(arr,)],
        "__cells array<struct<cell_id:int,nid:int,ce:array<double>>>",
    )
    bframe = F.broadcast(cframe)
    return lambda df: (df.crossJoin(bframe), F.col("__cells"))


# Quantizer fit sample size: ≥ this many vectors per centroid. 256/cell is
# the standard IVF training heuristic (FAISS trains on 39–256 pts/centroid);
# the deterministic hash-sample below bounds the fit input to ~256·n_cells
# rows no matter how big the corpus is, capped so the driver-side collect
# stays small even at production cell counts (200k × 64 dims ≈ 100 MB).
_KMEANS_FIT_PER_CELL = 256
_KMEANS_FIT_MAX_ROWS = 200_000


def bounded_identity_sample(
    df: DataFrame, id_col: str, max_rows: int, n: int | None = None
) -> DataFrame:
    """Deterministic identity-hash sample of expected size ≤ max_rows:
    one count to size the modulus, then a map-only
    ``pmod(xxhash64(id)) == 0`` filter — no shuffle, no RNG state, the
    same rows on any cluster at any partitioning. THE sampling idiom for
    every bounded trainer in the package (coarse-quantizer fit, PQ
    codebook fit, drift statistic, BPE trainer) — one implementation so
    the hash convention can't drift between them.

    ``n`` (r15): a caller that already knows ``df.count()`` passes it to
    skip the count pass — an index build that fits three trainers over
    one checkpointed corpus (kmeans, PQ, the drift stat) was paying the
    same full count three times. The SAME n yields the SAME modulus and
    therefore the SAME sample rows, so precomputing changes nothing."""
    if n is None:
        n = df.count()
    if n <= max_rows:
        return df
    m = -(-n // max_rows)
    return df.filter(F.pmod(F.xxhash64(id_col), F.lit(m)) == 0)


def _spherical_kmeans(
    emb: DataFrame, n_cells: int, iters: int = 4, n: int | None = None
) -> list:
    """Spherical k-means coarse quantizer: bounded sample → driver Lloyd.

    Quantizer TRAINING is bounded by construction — ~256 vectors per
    centroid suffice (the FAISS heuristic) — so the fit is: one count to
    size the sampling modulus, one deterministic identity-hash sample
    (``pmod(xxhash64(vec_id))``, map-only, no shuffle), ONE bounded
    collect (≤ _KMEANS_FIT_MAX_ROWS rows — NOT N-scaled; the cap holds at
    any corpus size), then Lloyd iterations in numpy on the driver. The
    COLLECT and the Lloyd arithmetic are corpus-size-independent; the
    count and sample-filter scans are column-pruned single passes over the
    source (at 100 TB: fit against a pre-counted snapshot, or pass cached
    ``centers`` into ``ann_ivf_search`` — the index-build/query split).
    The pre-r7 version ran each Lloyd iteration as a Spark job with the
    centers embedded as literals; on the bounded sample that was pure
    overhead — 4 plan-compiles of a 1k-literal expression dominated (~8 s)
    while the arithmetic is sub-millisecond in BLAS. Index ASSIGNMENT
    (every corpus row) stays fully distributed and map-side.

    Determinism: the sample is a pure function of vec_ids, init is the
    lowest-vec_id sample vectors, and numpy reduces in a fixed order — a
    refit reproduces the cached centers bit-for-bit in-process (the
    _KMEANS_CACHE premise). Ties in the argmax go to the lowest cell id
    (numpy argmax picks the first maximum), matching the map-side
    assignment's (cd, nid) struct-max tie-break.

    Measured here (tests/test_ann.py): spherical centers + 2-way assignment
    recover ≥0.9 recall@5 honestly, where the pre-r6 "seed vector"
    quantizer scored 0.94 only because the seed set contained the query
    vectors themselves.
    """
    import numpy as np

    target = min(_KMEANS_FIT_PER_CELL * n_cells, _KMEANS_FIT_MAX_ROWS)
    sample = bounded_identity_sample(emb, "vec_id", target, n=n)
    rows = sample.select("vec_id", "embedding").collect()
    if not rows:
        raise ValueError("cannot fit a quantizer on an empty corpus")
    rows.sort(key=lambda r: r["vec_id"])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    centers = x[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(x @ centers.T, axis=1)
        for cid in range(len(centers)):
            mask = assign == cid
            if mask.any():  # empty cells keep their center
                v = x[mask].mean(axis=0)
                norm = float(np.linalg.norm(v))
                if norm > 0:
                    centers[cid] = v / norm
    return [[float(c) for c in row] for row in centers]


# Fitted coarse-quantizer centers per (corpus snapshot, n_cells): index
# BUILD and index QUERY are separate phases in any real IVF deployment
# (the quantizer is fitted once, offline, and served to every query); this
# cache is that separation in-process. The fit is deterministic (hash
# sample + fixed-order numpy reductions + deterministic init), so caching
# never changes results in-process. The
# key includes a FILE-LISTING FINGERPRINT of the embeddings dataset
# (path, mtime, size per file), so data rewritten in place under a stable
# path refits instead of serving stale centers; ``clear_quantizer_cache``
# is the explicit hook for pipelines on non-stat-able filesystems.
_KMEANS_CACHE: dict = {}


def clear_quantizer_cache() -> None:
    """Drop all cached coarse-quantizer centers AND the PQ codebooks
    derived from them (codebooks quantize residuals against specific
    centers — stale centers imply stale codebooks)."""
    _KMEANS_CACHE.clear()
    from bayesiandatafusion_jl_spark.functions.vector_pq import _PQ_CACHE

    _PQ_CACHE.clear()


def _corpus_fingerprint(sf_dir: str, table: str = "embeddings") -> tuple:
    """(relpath, mtime_ns, size) per file of one table's dataset.

    Local-filesystem stat walk; on object stores (no os.stat) it degrades
    to the bare path — callers there must version the path or call
    ``clear_quantizer_cache`` on rewrite (documented on _KMEANS_CACHE)."""
    import os

    root = os.path.join(sf_dir, f"{table}.parquet")
    # the path itself is ALWAYS part of the key: on object stores / HDFS
    # nothing below is stat-able (os.walk silently yields nothing for a
    # non-local path), and without the path two distinct remote corpora
    # would collapse onto one cache entry and serve each other's centers
    out: list = [root]
    try:
        if os.path.isfile(root):
            st = os.stat(root)
            out.append((st.st_mtime_ns, st.st_size))
        else:
            for dirpath, dirnames, files in os.walk(root):
                # sort subdirs too: dirent order is filesystem-arbitrary, so
                # a byte-identical partitioned dataset (label=*/part-*) could
                # otherwise fingerprint differently and force a spurious refit
                dirnames.sort()
                for fn in sorted(files):
                    p = os.path.join(dirpath, fn)
                    st = os.stat(p)
                    out.append(
                        (os.path.relpath(p, root), st.st_mtime_ns, st.st_size)
                    )
    except OSError:
        pass  # degrade to path-only (the pre-r7 key)
    return tuple(out)


def _cached_centers(emb: DataFrame, sf_dir: str, n_cells: int) -> list:
    """Get-or-fit quantizer centers through _KMEANS_CACHE — the ONE place
    the cache-key semantics live (ann_ivf_topk and q_llm_semdedup both go
    through here, so a key change can never leave the two paths serving
    incompatible centers for the same (fingerprint, n_cells))."""
    cache_key = (_corpus_fingerprint(sf_dir), n_cells)
    centers = _KMEANS_CACHE.get(cache_key)
    if centers is None:
        centers = _spherical_kmeans(emb, n_cells)
        _KMEANS_CACHE[cache_key] = centers
    return centers


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    n_assign: int = 2,
) -> DataFrame:
    """IVF-style approximate nearest neighbor (the 100 TB scale path).

    1. Coarse quantizer: ``n_cells`` spherical k-means centroids fitted on
       a bounded deterministic sample, Lloyd in numpy on the driver
       (``_spherical_kmeans`` — fit cost independent of corpus size).
       Centers live on the driver (n_cells × dim scalars) and reach the
       executors as a LITERAL struct array up to _CELLS_LITERAL_MAX cells,
       else as a single-row broadcast frame (``_cells_attacher``) —
       production 4k–65k-cell indexes stay plannable.
    2. Index every corpus vector under its ``n_assign`` nearest cells with
       a map-side top-n: ``transform`` computes all n_cells dots per row,
       ``sort_array`` + ``slice`` + ``explode`` pick the winners inside
       whole-stage codegen. Zero shuffle, zero join — the plan is a bare
       projection over the scan (the r5 crossJoin+window version shuffled a
       16×-exploded corpus; this is the fix). Multi-assignment (n_assign=2)
       is the standard boundary-loss remedy: a vector near a cell border is
       findable from both sides for 2× index size.
    3. Queries probe their ``n_probe`` closest cells: same literal dots,
       same map-side top-n.
    4. Candidate join on cell_id with the tiny probe side (|Q|·n_probe
       rows) BROADCAST, so the corpus-sized index never shuffles; exact
       top-k re-rank runs over the bounded candidate set only. The
       dropDuplicates collapses vectors reached via two probed cells.

    Not SQL-oracle'd (approximation is engine-specific); recall vs the
    brute-force baseline is asserted in tests/test_ann.py and surfaced as a
    measured quality column in ``q_llm_scale_suite``. On this synthetic
    quasi-uniform corpus the probed fraction is large (~n_probe·n_assign /
    n_cells — uniform data has no cluster structure to prune); on a real
    clustered corpus the same plan prunes much harder.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centers = _cached_centers(emb, sf_dir, n_cells)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return ann_ivf_search(
        emb, q, k=k, n_probe=n_probe, n_assign=n_assign, centers=centers
    )


def ann_ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    n_assign: int = 2,
    centers: list | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN over ARBITRARY frames — the library form of
    ``ann_ivf_topk`` (same schema contract as ``knn_topk``: corpus
    (vec_id, embedding), queries (qid, qe), unit-norm vectors;
    ``exclude_self`` has the same id-space caveat — pass False when query
    ids are not corpus ids).

    Pass ``centers`` to reuse a fitted quantizer (the index-build /
    index-query separation every real IVF deployment has — ``ann_ivf_topk``
    feeds its corpus-fingerprint cache through this); otherwise a
    quantizer is fitted on a bounded sample of ``corpus`` first
    (``_spherical_kmeans``). Plan shape as documented on ``ann_ivf_topk``:
    zero corpus shuffles for assignment, probe side broadcast, bounded
    exact re-rank.
    """
    spark = corpus.sparkSession
    if centers is None:
        centers = _spherical_kmeans(corpus, n_cells)

    # map-side multi-assignment: n_assign nearest cells per corpus vector
    # (literal centroids, or the broadcast single-row frame above
    # _CELLS_LITERAL_MAX cells — still zero corpus shuffles either way);
    # one shared attacher so corpus and query sides reuse the same frame
    attach = _cells_attacher(spark, centers)
    src, cells = attach(corpus)
    assigned = src.select(
        "vec_id", "embedding",
        F.explode(
            F.slice(F.sort_array(_cell_scores(cells, "embedding"), asc=False), 1, n_assign)
        ).alias("ac"),
    ).select("vec_id", "embedding", (-F.col("ac.nid")).alias("cell_id"))

    # queries probe n_probe cells — same dots, still map-side
    qsrc, qcellcol = attach(queries)
    qcells = qsrc.select(
        "qid", "qe",
        F.explode(
            F.slice(F.sort_array(_cell_scores(qcellcol, "qe"), asc=False), 1, n_probe)
        ).alias("probe"),
    ).select("qid", "qe", (-F.col("probe.nid")).alias("cell_id"))

    # |Q|·n_probe rows — broadcast, so the corpus side never shuffles
    cand = assigned.join(F.broadcast(qcells), "cell_id")
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("qid"))
    rescored = cand.select(
        "qid", F.col("vec_id").alias("nb_id"), F.round(dot("qe", "embedding"), 4).alias("score")
    ).dropDuplicates(["qid", "nb_id"])
    wq = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return rescored.withColumn("rk", F.row_number().over(wq)).filter(F.col("rk") <= k)


@register("q_llm_knn_ivf", oracle=None, tags=("J3", "ann"), demoted=True)
def q_llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (scale path) — IVF-bucketed ANN top-k; rows-only driver check,
    recall asserted against brute force in tests."""
    return ann_ivf_topk(spark, sf_dir)


def semdedup(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    centers: list | None = None,
    max_cluster_rows: int = 1_000_000,
    precheck: bool = True,
) -> DataFrame:
    """SemDeDup — semantic (embedding-space) deduplication via
    cluster-then-prune (Abbas et al. 2023, arXiv:2303.09540).

    1. Coarse k-means clusters the corpus (``_spherical_kmeans``: bounded
       deterministic sample, driver-side Lloyd — fit cost independent of
       corpus size; pass ``centers`` to reuse a fitted quantizer).
    2. Every vector is assigned map-side to its nearest centroid (same
       zero-shuffle literal/broadcast dots as ``ann_ivf_search``).
    3. WITHIN each cluster only, a greedy prune keeps the lowest-vec_id
       representative of every cosine-≥-threshold group and marks the
       rest as duplicates — the quadratic comparison is confined to one
       cluster, which is the whole point of the method: O(N²) becomes
       Σ_c O(|c|²) with |c| ≈ N/n_clusters, and clusters process in
       parallel (one shuffle on cluster_id, then ``applyInPandas``).

    The per-cluster kernel is memory-linear — it never materializes the
    |c|×|c| similarity matrix (one row of sims per keeper iteration,
    O(|c|·d) resident) — but a giant cluster still means quadratic TIME
    and a whole-group pandas buffer. The ``max_cluster_rows`` guard runs
    BEFORE the pandas stage: a cheap ``groupBy(cell_id).count()`` pre-pass
    (map-side partial agg, n_clusters-row collect) fails fast with sizing
    guidance while the oversized cluster is still a lazy plan — an
    in-kernel check would fire only after Spark had already buffered the
    whole group into executor memory, bounding prune time but not the OOM
    (the ADVICE r8 finding). A defensive in-kernel re-check remains for
    callers that disable the pre-pass (``precheck=False`` saves the extra
    corpus scan when cluster sizes are already known to be safe). Raise
    n_clusters ∝ corpus size: the paper's setting is |c| in the tens of
    thousands at any scale.

    Determinism: fitted centers are deterministic (seeded hash sample +
    fixed-order numpy), assignment tie-breaks to the lowest cell id, and
    the greedy order is vec_id ascending — output is independent of input
    partitioning (pinned by tests/test_semdedup.py).

    Returns one row per input vector:
    ``vec_id, cell_id, rep_id, is_dup, cos_to_rep`` — ``rep_id`` is the
    kept representative (itself for kept rows), ``cos_to_rep`` the cosine
    that condemned a duplicate (1.0 for kept rows, rounded to 4dp).
    Unit-norm embedding contract as everywhere in this module.
    """
    import pandas as pd

    spark = corpus.sparkSession
    if centers is None:
        centers = _spherical_kmeans(corpus, n_clusters)

    attach = _cells_attacher(spark, centers)
    src, cells = attach(corpus)
    assigned = src.select(
        "vec_id",
        "embedding",
        (
            -F.element_at(
                F.sort_array(_cell_scores(cells, "embedding"), asc=False), 1
            )["nid"]
        ).alias("cell_id"),
    )

    thr = float(threshold)
    cap = int(max_cluster_rows)

    if precheck:
        # fail BEFORE any group is buffered into a pandas kernel: cell
        # assignment is deterministic (seeded centers, lowest-id tie-break)
        # so re-deriving `assigned` for this bounded agg is safe, and the
        # agg itself is map-side partial with an n_clusters-row collect
        over = (
            assigned.groupBy("cell_id")
            .count()
            .filter(F.col("count") > cap)
            .orderBy(F.desc("count"))
            .take(5)
        )
        if over:
            sizes = ", ".join(f"cell {r.cell_id}: {r['count']}" for r in over)
            raise ValueError(
                f"semdedup clusters exceed max_cluster_rows={cap} ({sizes});"
                " raise n_clusters (target ~N/n_clusters ≲ 1e5 rows/cluster)"
            )

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) > cap:
            raise ValueError(
                f"semdedup cluster {int(pdf['cell_id'].iloc[0])} has "
                f"{len(pdf)} rows > max_cluster_rows={cap}; raise "
                "n_clusters (target ~N/n_clusters ≲ 1e5 rows/cluster)"
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = len(pdf)
        rep = ids.copy()
        cos = np.ones(n, dtype=np.float64)
        dup = np.zeros(n, dtype=bool)
        for i in range(n):
            if dup[i]:
                continue
            if i + 1 == n:
                break
            sims = x[i + 1 :] @ x[i]
            hit = np.nonzero(~dup[i + 1 :] & (sims >= thr))[0] + i + 1
            dup[hit] = True
            rep[hit] = ids[i]
            cos[hit] = sims[hit - i - 1]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell_id": pdf["cell_id"].to_numpy(),
                "rep_id": rep,
                "is_dup": dup,
                "cos_to_rep": np.round(cos, 4),
            }
        )

    return assigned.groupBy("cell_id").applyInPandas(
        _prune,
        "vec_id bigint, cell_id int, rep_id bigint, is_dup boolean,"
        " cos_to_rep double",
    )


@register(
    "q_llm_semdedup", oracle=None, tags=("J2", "semantic-dedup", "ann"), demoted=True
)
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (semantic scale path) — SemDeDup cluster-then-prune over the
    embeddings table (see ``semdedup``). τ = 0.4 selects the top tail of
    this near-uniform synthetic corpus (same rationale as
    q_llm_embed_neardup's 0.35: the real-corpus τ ≈ 0.95 matches nothing
    here); rows-only driver check — cluster assignment is k-means-derived
    and not SQL-expressible — with planted-twin recall and
    partition-invariance pinned in tests/test_semdedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    centers = _cached_centers(emb, sf_dir, 16)
    return semdedup(emb, n_clusters=16, threshold=0.4, centers=centers)


def mmr_rerank(
    cands: DataFrame,
    k: int,
    lam: float = 0.5,
    max_pool_rows: int = 10_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    1998) of a per-query candidate pool: greedily select k candidates
    maximizing ``lam·relevance − (1−lam)·max cosine to the already
    selected`` — the standard diversity pass a retrieval stack runs on
    its shortlist so near-duplicate passages don't crowd out a second
    relevant source.

    ``cands`` carries (qid, nb_id, score, nb_emb): one row per
    (query, candidate), relevance already computed upstream (exact dot
    on unit-norm embeddings — this module's contract — so the same
    numbers serve as the similarity kernel). MMR is inherently
    sequential IN k, but k is tiny and the pool is the ANN shortlist —
    the kernel runs per-qid via ``applyInPandas`` (queries parallelize;
    per-group work is O(pool·k·d) on a ≤``max_pool_rows`` frame, guarded
    in-kernel the way ``semdedup`` guards cluster size).

    Determinism: candidates enter relevance-ordered with an nb_id
    tiebreak; numpy argmax returns the FIRST maximum, so float-equal MMR
    scores resolve to the higher-relevance / lower-nb_id candidate —
    output is independent of input partitioning. ``lam=1.0`` reduces
    exactly to the plain relevance top-k (pinned in tests).

    Returns (qid, nb_id, score, mmr, rk≤k): ``score`` the original
    relevance, ``mmr`` the marginal score that won the slot (rounded
    4dp; the rank-1 pick keeps mmr = lam·relevance — no selected set to
    repel from yet).
    """
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    kk, ll, cap = int(k), float(lam), int(max_pool_rows)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"mmr_rerank pool for qid {int(pdf['qid'].iloc[0])} has "
                f"{len(pdf)} rows > max_pool_rows={cap}; shrink the ANN "
                "shortlist (pool·k) feeding the re-rank"
            )
        pdf = pdf.sort_values(
            ["score", "nb_id"], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        rel = pdf["score"].to_numpy(dtype=np.float64)
        x = np.array(pdf["nb_emb"].tolist(), dtype=np.float64)
        picked: list[int] = []
        mmr_won = np.zeros(min(kk, n), dtype=np.float64)
        # max-sim-to-selected, updated incrementally: O(pool) per pick
        max_sim = np.full(n, -np.inf)
        avail = np.ones(n, dtype=bool)
        for slot in range(min(kk, n)):
            if slot == 0:
                scores = ll * rel  # nothing selected yet to repel from
            else:
                scores = ll * rel - (1.0 - ll) * max_sim
            scores = np.where(avail, scores, -np.inf)
            j = int(np.argmax(scores))
            picked.append(j)
            mmr_won[slot] = scores[j]
            avail[j] = False
            np.maximum(max_sim, x @ x[j], out=max_sim)
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                "qid": sel["qid"].to_numpy(),
                "nb_id": sel["nb_id"].to_numpy(),
                "score": sel["score"].to_numpy(),
                "mmr": np.round(mmr_won, 4),
                "rk": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return cands.groupBy("qid").applyInPandas(
        _mmr, "qid bigint, nb_id bigint, score double, mmr double, rk int"
    )
