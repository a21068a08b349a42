"""Product quantization (PQ) and IVF-PQ approximate nearest neighbor.

PQ (Jégou, Douze & Schmid, "Product quantization for nearest neighbor
search", TPAMI 2011 — public paper) splits a D-dim vector into M
subspaces of dsub = D/M dims and quantizes each sub-vector against its
own ksub-centroid codebook, so a vector is stored as M small codes. The
100 TB story is memory, not speed-of-one-distance: a 64-dim float32
corpus row is 256 B of embedding; its PQ code is M bytes (M=8 → 32×
smaller), which is the difference between an ANN index that fits in
executor memory and one that doesn't. Query-side scoring is ADC
(asymmetric distance computation): per (query, subspace) a lookup table
of the query sub-vector's dot against every codebook centroid; the
approximate dot of query·x is then the sum of M table lookups — the
corpus's ORIGINAL vectors are never touched during candidate scoring.

Spark-first split of the work:

- codebook TRAINING is bounded by construction (the FAISS heuristic —
  a few hundred samples per centroid suffice), so it mirrors
  ``_spherical_kmeans``: deterministic identity-hash sample, ONE bounded
  collect, numpy Lloyd per subspace on the driver.
- corpus ENCODING is the only per-row numeric kernel (M argmins over
  ksub centroids each); it runs as ONE Arrow-batched pandas_udf doing a
  per-batch matmul (BLAS), map-only over the corpus scan — the same
  "heavy numerics in Arrow batches, never per-row Python" rule the Gibbs
  kernels follow.
- ADC candidate SCORING is pure whole-stage codegen: the query carries
  its M×ksub lookup table as an array column, and the score is
  ``aggregate(zip_with(codes, luts, element_at), …)`` — M array lookups
  per candidate pair, no Python, no original embeddings.

Recall and ADC fidelity are pytest-gated (tests/test_pq.py); the
registered query is rows-only by design like the other ANN paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dot
from bayesiandatafusion_jl_spark.functions.vector import (
    _KMEANS_FIT_MAX_ROWS,
    _KMEANS_FIT_PER_CELL,
    _cached_centers,
    _cell_scores,
    _cells_attacher,
    bounded_identity_sample,
)
from bayesiandatafusion_jl_spark.registry import register


def pq_train(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 8,
    centers: list | None = None,
    n: int | None = None,
) -> list:
    """Fit M per-subspace codebooks (returned as an M × ksub × dsub
    nested list) on a bounded deterministic sample of ``corpus``.

    Same training discipline as the IVF coarse quantizer
    (vector.py ``_spherical_kmeans``): the sample is a pure function of
    ids (``pmod(xxhash64(id))``, map-only), the collect is capped at
    ``_KMEANS_FIT_MAX_ROWS`` rows regardless of corpus size, init is the
    lowest-id sample rows, and numpy reduces in a fixed order — refits
    are bit-reproducible. Standard (non-spherical) L2 Lloyd per
    subspace, because PQ quantizes sub-vectors, whose norms carry signal
    even when the full vectors are unit-norm.

    Pass the IVF coarse ``centers`` to train on RESIDUALS (x − nearest
    center, assignment by argmax dot to match the map-side coarse
    assignment) — the IVFADC form of Jégou et al. §IV: residual energy
    is a fraction of vector energy, so the same M×ksub code budget
    quantizes far more accurately. The codebooks then only ever see /
    encode residuals (``ann_ivfpq_search`` keeps the two frames paired).

    ``ksub`` is clamped to the sample size (tiny corpora); D must be
    divisible by ``m``.
    """
    import numpy as np

    target = min(_KMEANS_FIT_PER_CELL * ksub, _KMEANS_FIT_MAX_ROWS)
    sample = bounded_identity_sample(corpus, id_col, target, n=n)
    rows = sample.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("cannot fit PQ codebooks on an empty corpus")
    rows.sort(key=lambda r: r[id_col])
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if centers is not None:
        c = np.array(centers, dtype=np.float64)
        # numpy argmax returns the FIRST maximum — same lowest-cell-id
        # tie-break as the map-side (cd, nid) struct-max assignment
        x = x - c[np.argmax(x @ c.T, axis=1)]
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ksub = min(ksub, x.shape[0])
    return [
        [[float(v) for v in c] for c in cb]
        for cb in _lloyd_books(x, m, ksub, iters)
    ]


def _lloyd_books(x, m: int, ksub: int, iters: int) -> list:
    """Per-subspace L2 Lloyd on a driver-side sample matrix — the inner
    fit shared by ``pq_train`` and ``opq_train``. Deterministic: init is
    the first ksub sample rows, numpy argmin takes the first minimum,
    reductions run in fixed order. Returns M numpy (ksub × dsub)
    arrays."""
    import numpy as np

    dsub = x.shape[1] // m
    sub = x.reshape(x.shape[0], m, dsub)
    books = []
    for mi in range(m):
        xm = sub[:, mi, :]
        cb = xm[:ksub].copy()  # NOT named `centers`: must not shadow the
        # coarse-centers parameter (read above for the residuals)
        for _ in range(iters):
            # argmin_j ||x - c_j||^2 == argmin_j (||c_j||^2 - 2 x·c_j)
            d2 = (cb**2).sum(axis=1)[None, :] - 2.0 * (xm @ cb.T)
            assign = np.argmin(d2, axis=1)
            for cid in range(ksub):
                mask = assign == cid
                if mask.any():  # empty cells keep their center
                    cb[cid] = xm[mask].mean(axis=0)
        books.append(cb)
    return books


def _pq_reconstruct(x, books) -> "object":
    """Quantize-then-reconstruct the sample under ``books`` (numpy
    arrays) — the OPQ alternation's Q matrix."""
    import numpy as np

    m = len(books)
    dsub = books[0].shape[1]
    sub = x.reshape(x.shape[0], m, dsub)
    out = np.empty_like(x)
    for mi in range(m):
        cb = books[mi]
        d2 = (cb**2).sum(axis=1)[None, :] - 2.0 * (sub[:, mi, :] @ cb.T)
        out[:, mi * dsub : (mi + 1) * dsub] = cb[np.argmin(d2, axis=1)]
    return out


def opq_train(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 8,
    centers: list | None = None,
    opq_iters: int = 6,
    n: int | None = None,
) -> tuple[list, list]:
    """Optimized Product Quantization (Ge, He, Ke & Sun, "Optimized
    product quantization for approximate nearest neighbor search",
    CVPR 2013 — public paper): learn an ORTHOGONAL rotation R so the
    rotated (residual) vectors quantize with lower error under the same
    M × ksub code budget, by alternating (a) codebook fit on R·x with
    (b) the orthogonal-Procrustes solve R = argmin ‖X·Rᵀ − Q‖_F (one
    SVD of XᵀQ). Returns ``(rotation, codebooks)`` — rotation as a
    d × d nested list, codebooks in the ``pq_train`` format.

    Because R is orthogonal, dot products are preserved EXACTLY:
    q·x = (Rq)·(Rx). The approximation error lives only in quantizing
    R·x, which the learned R minimizes — energy balances across the M
    subspaces instead of concentrating in whichever dims the data
    happened to correlate. The whole procedure runs on the SAME bounded
    deterministic sample as ``pq_train`` (numpy SVD/Lloyd on the
    driver, bit-reproducible); corpus-side cost is unchanged — the
    rotation folds into the existing encode/LUT Arrow batch matmuls.
    """
    import numpy as np

    target = min(_KMEANS_FIT_PER_CELL * ksub, _KMEANS_FIT_MAX_ROWS)
    sample = bounded_identity_sample(corpus, id_col, target, n=n)
    rows = sample.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("cannot fit OPQ codebooks on an empty corpus")
    rows.sort(key=lambda r: r[id_col])
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if centers is not None:
        c = np.array(centers, dtype=np.float64)
        x = x - c[np.argmax(x @ c.T, axis=1)]
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ksub = min(ksub, x.shape[0])
    rot = np.eye(d)
    for _ in range(opq_iters):
        books = _lloyd_books(x @ rot.T, m, ksub, iters)
        q = _pq_reconstruct(x @ rot.T, books)
        # orthogonal Procrustes: min over W=Rᵀ of ‖X·W − Q‖_F is
        # W = U·Vᵀ from SVD(XᵀQ) = U·S·Vᵀ
        u, _, vt = np.linalg.svd(x.T @ q)
        rot = (u @ vt).T
    books = _lloyd_books(x @ rot.T, m, ksub, iters)
    return (
        [[float(v) for v in r] for r in rot],
        [[[float(v) for v in c] for c in cb] for cb in books],
    )


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    rotation: list | None = None,
) -> DataFrame:
    """Append ``out_col`` (array<smallint>, length M): each vector's
    per-subspace nearest-codeword ids.

    ONE Arrow-batched pandas_udf, map-only over the scan — per batch the
    kernel is M matmuls (BLAS) + argmin, deterministic (numpy argmin
    takes the first minimum, matching pq_train's assignment). Codebooks
    ride a SparkContext broadcast (M·ksub·dsub floats — KBs), same
    pattern as the BPE ranks table (bpe.py). At 100 TB this is the
    index-build pass: encode once, persist codes, and every later query
    touches only the M-byte codes.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        [np.array(b, dtype=np.float64) for b in codebooks]
    )
    # OPQ (opq_train): rotate inside the same Arrow batch — one extra
    # d×d matmul per batch, still map-only
    bc_rot = spark.sparkContext.broadcast(
        None if rotation is None else np.array(rotation, dtype=np.float64)
    )

    def _enc(vecs):
        books = bc.value
        m = len(books)
        dsub = books[0].shape[1]
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if x.size == 0:
            return pd.Series([], dtype=object)
        if bc_rot.value is not None:
            x = x @ bc_rot.value.T
        sub = x.reshape(x.shape[0], m, dsub)
        codes = np.empty((x.shape[0], m), dtype=np.int16)
        for mi in range(m):
            c = books[mi]
            d2 = (c**2).sum(axis=1)[None, :] - 2.0 * (sub[:, mi, :] @ c.T)
            codes[:, mi] = np.argmin(d2, axis=1).astype(np.int16)
        return pd.Series(list(codes))

    # annotations as OBJECTS (bpe.py / q_udaf_group_median precedent):
    # postponed annotations would hand pandas_udf unresolvable strings
    _enc.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    enc = pandas_udf(_enc, "array<smallint>")
    return df.withColumn(out_col, enc(F.col(vec_col)))


def _centers_attacher(spark: SparkSession, centers: list):
    """attach(df) -> (df, ctr_col): the coarse centers as ONE broadcast
    single-row array<array<double>> column, for the map-side residual
    subtraction (element_at by cell_id — n_cells × dim doubles, KBs)."""
    cframe = spark.createDataFrame(
        [([list(map(float, c)) for c in centers],)],
        "__ivf_ctrs array<array<double>>",
    )
    bframe = F.broadcast(cframe)
    return lambda df: (df.crossJoin(bframe), F.col("__ivf_ctrs"))


def pq_adc_score(codes_col, luts_col, m: int | None = None):
    """Approximate dot(query, x) = Σ_m LUT[m][code[m]].

    Pass ``m`` to UNROLL into m static element_at terms — static
    expressions stay inside whole-stage codegen, while the zip_with +
    aggregate HOF fallback (m unknown) is evaluated interpreted with two
    array allocations PER CANDIDATE PAIR: at millions of pairs the
    unrolled form is the difference between scan-speed scoring and a
    scoring-bound stage."""
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    luts = F.col(luts_col) if isinstance(luts_col, str) else luts_col
    if m is not None:
        total = F.lit(0.0)
        for mi in range(m):
            total = total + F.element_at(
                F.element_at(luts, mi + 1),
                F.element_at(codes, mi + 1).cast("int") + 1,
            )
        return total
    picked = F.zip_with(
        codes, luts, lambda c, lut: F.element_at(lut, c.cast("int") + F.lit(1))
    )
    return F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)


def pq_probe_frame(queries: DataFrame, centers: list, n_probe: int) -> DataFrame:
    """(qid, cell_id, __qc): each query's n_probe nearest coarse cells,
    keeping the exact dot(q, center) the cell argmax already computed —
    the probe side every ADC path broadcasts. Map-side only."""
    spark = queries.sparkSession
    qsrc, qcellcol = _cells_attacher(spark, centers)(queries)
    return qsrc.select(
        "qid",
        F.explode(
            F.slice(
                F.sort_array(_cell_scores(qcellcol, "qe"), asc=False), 1, n_probe
            )
        ).alias("probe"),
    ).select(
        "qid",
        (-F.col("probe.nid")).alias("cell_id"),
        F.col("probe.cd").alias("__qc"),
    )


def pq_query_luts(
    queries: DataFrame, codebooks: list, rotation: list | None = None
) -> DataFrame:
    """(qid, __luts) at QUERY grain: LUTs are a pure function of the
    query, not the probed cell — building them once per query row
    (|Q| rows, not |Q|·n_probe) and joining candidates by qid costs
    n_probe× less work and broadcast bytes than riding them on the
    probe rows.

    Arrow/numpy kernel (r12), not the ``pq_luts`` HOF: the HOF form is
    interpreted per element — M·ksub transform slots per query row,
    each an aggregate-HOF dot — measured 3.3 s for 715 queries at
    (M=16, ksub=64); one einsum over the Arrow batch is ~60× less
    (the same heavy-numerics-in-Arrow rule as ``pq_encode``). The LUT
    frame is broadcast into the candidate join, so this cost sits on
    the critical path of EVERY ADC query batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(
        np.array(codebooks, dtype=np.float64)  # M × ksub × dsub
    )
    # OPQ: the codebooks live in the ROTATED space, so the query rotates
    # too — (Rq)·(Rx) = q·x keeps the score an exact dot estimate
    bc_rot = spark.sparkContext.broadcast(
        None if rotation is None else np.array(rotation, dtype=np.float64)
    )

    def _luts(vecs):
        books = bc.value
        m, ksub, dsub = books.shape
        out = []
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if bc_rot.value is not None:
            x = x @ bc_rot.value.T
        sub = x.reshape(x.shape[0], m, dsub)
        # LUT[q, m, j] = dot(sub[q, m], books[m, j])
        luts = np.einsum("qmd,mjd->qmj", sub, books)
        for row in luts:
            out.append([r.tolist() for r in row])
        return pd.Series(out)

    # annotations as OBJECTS (bpe.py / q_udaf_group_median precedent)
    _luts.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    lut_udf = pandas_udf(_luts, "array<array<double>>")
    return queries.select("qid", lut_udf(F.col("qe")).alias("__luts"))


def pq_adc_candidates(
    index: DataFrame,
    qprobed: DataFrame,
    qluts: DataFrame,
    exclude_self: bool,
    m: int | None = None,
) -> DataFrame:
    """(qid, nb_id, adc): candidates = index ⋈ broadcast probe rows on
    cell_id ⋈ broadcast LUTs on qid; score = coarse dot + Σ_m
    LUT[m][code[m]] (M element_at lookups in codegen). A vector reached
    via two (cell, assignment) paths has two DIFFERENT approximations
    (per-cell residuals); group-max keeps the best one — deterministic
    where dropDuplicates would race the two copies."""
    cand = index.join(F.broadcast(qprobed), "cell_id").join(
        F.broadcast(qluts), "qid"
    )
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("qid"))
    return (
        cand.select(
            "qid",
            F.col("vec_id").alias("nb_id"),
            (F.col("__qc") + pq_adc_score("pq_code", "__luts", m)).alias("__a"),
        )
        .groupBy("qid", "nb_id")
        .agg(F.max("__a").alias("adc"))
    )


def _adc_w():
    # built lazily: a WindowSpec needs the JVM, which may not exist at
    # module-import time
    return W.partitionBy("qid").orderBy(F.desc("adc"), F.asc("nb_id"))


def pq_adc_topk(scored: DataFrame, k: int) -> DataFrame:
    """Raw-ADC top-k readout (the refine=0 leg)."""
    return (
        scored.withColumn("rk", F.row_number().over(_adc_w()))
        .filter(F.col("rk") <= k)
        .select("qid", "nb_id", F.round("adc", 4).alias("score"), "rk")
    )


def pq_adc_shortlist(scored: DataFrame, k: int, refine: int) -> DataFrame:
    """Top-(refine·k) ADC shortlist per query — the bounded set the
    exact re-rank touches."""
    return scored.withColumn("rk", F.row_number().over(_adc_w())).filter(
        F.col("rk") <= refine * k
    )


def pq_exact_rerank(
    short: DataFrame, vectors: DataFrame, queries: DataFrame, k: int,
    keep_emb: bool = False,
) -> DataFrame:
    """Exact top-k over the shortlist only: |Q|·refine·k (qid, nb_id)
    rows broadcast against a (vec_id, embedding) lookup frame — the one
    place original vectors are read in an ADC query.

    ``keep_emb`` (r15, guide §1.2 "don't compute things twice"): carry
    each survivor's embedding through as ``nb_emb`` — the rows are
    already in hand here, so a downstream re-ranker that needs the
    vectors (MMR) can consume them directly instead of paying a second
    shortlist fetch (ids collect + pushed-IN postings scan + dedup) for
    the SAME rows. Off by default: the extra column widens the top-k
    exchange by the vector bytes, which only pays for itself when it
    replaces that second fetch."""
    cols = ["qid", "nb_id", F.round(dot("qe", "embedding"), 4).alias("score")]
    if keep_emb:
        cols.append(F.col("embedding").alias("nb_emb"))
    rescored = (
        F.broadcast(short.select("qid", "nb_id"))
        .join(vectors, F.col("nb_id") == F.col("vec_id"))
        .join(
            queries.withColumnRenamed("qid", "__qid"),
            F.col("qid") == F.col("__qid"),
        )
        .select(*cols)
    )
    wr = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return rescored.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= k
    )


def ann_ivfpq_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    n_assign: int = 2,
    m: int = 16,
    ksub: int = 256,
    centers: list | None = None,
    codebooks: list | None = None,
    refine: int = 4,
    exclude_self: bool = True,
    opq: bool = False,
    rotation: list | None = None,
) -> DataFrame:
    """IVF-PQ (IVFADC) ANN: coarse IVF cells prune WHICH vectors to
    score, residual PQ compresses HOW each survivor is scored.

    Same schema contract as ``ann_ivf_search`` (corpus (vec_id,
    embedding), queries (qid, qe)). Plan shape:

    1. corpus → n_assign coarse cells (map-side literal/broadcast argmax,
       vector.py), RESIDUAL per assignment (zip_with against the
       broadcast center of that cell — map-side), then PQ codes over the
       residuals (ONE Arrow encode pass). The (vec_id, cell_id, pq_code)
       frame IS the index — M bytes per entry — and is checkpointed so
       assignment+encode run once, not once per stage.
    2. queries → n_probe probed cells; each probe row keeps the exact
       coarse dot(q, center) the cell argmax already computed, plus an
       M×ksub ADC lookup table (``pq_query_luts``, one Arrow einsum
       over the query batch — built once per query row, reused by every
       candidate).
    3. candidate join on cell_id with the |Q|·n_probe probe side
       BROADCAST — the corpus-sized index never shuffles — and
       score(q, x) ≈ dot(q, center_cell) + Σ_m LUT[m][code[m]]: the
       coarse term rides the probe row, the residual term is M table
       lookups (pure codegen). Residual encoding is what makes the
       approximation tight: residual energy ≪ vector energy, so the
       same M×ksub budget quantizes far more accurately than raw-vector
       PQ (measured here: refine=4 recall 0.60 raw → 1.00 residual).
    4. top-(refine·k) by ADC score per query, then an EXACT re-rank of
       only those rows (join back to the corpus embeddings by vec_id —
       |Q|·refine·k rows, broadcast-sized). refine=0 skips the re-rank
       and returns raw ADC scores/ranks.

    At 100 TB step 3 touches only codes (32× less I/O than raw
    embeddings) and step 4 touches refine·k·|Q| original vectors instead
    of every candidate — the standard IVF-PQ + refine deployment shape.
    """
    spark = corpus.sparkSession
    if centers is None:
        from bayesiandatafusion_jl_spark.functions.vector import _spherical_kmeans

        centers = _spherical_kmeans(corpus, n_cells)
    if codebooks is None:
        if opq:
            # learned orthogonal rotation before the subspace split
            # (opq_train) — cuts residual quantization error at the same
            # code size; the rotation folds into the encode/LUT batches
            rotation, codebooks = opq_train(
                corpus, m=m, ksub=ksub, centers=centers
            )
        else:
            codebooks = pq_train(corpus, m=m, ksub=ksub, centers=centers)

    attach = _cells_attacher(spark, centers)
    src, cells = attach(corpus)
    assigned = src.select(
        "vec_id",
        "embedding",
        F.explode(
            F.slice(
                F.sort_array(_cell_scores(cells, "embedding"), asc=False),
                1,
                n_assign,
            )
        ).alias("ac"),
    ).select("vec_id", "embedding", (-F.col("ac.nid")).alias("cell_id"))
    cattach = _centers_attacher(spark, centers)
    cframe, ctrs = cattach(assigned)
    residual = cframe.select(
        "vec_id",
        "cell_id",
        F.zip_with(
            F.col("embedding"),
            F.element_at(ctrs, F.col("cell_id") + 1),
            lambda x, c: x.cast("double") - c,
        ).alias("__res"),
    )
    # single consumer (the candidate join) and a deterministic encode —
    # no checkpoint needed; the PERSISTED variant (vector_index) is where
    # encode-once materialization lives (the parquet write itself)
    index = pq_encode(
        residual, codebooks, vec_col="__res", rotation=rotation
    ).select("vec_id", "cell_id", "pq_code")

    scored = pq_adc_candidates(
        index,
        pq_probe_frame(queries, centers, n_probe),
        pq_query_luts(queries, codebooks, rotation=rotation),
        exclude_self,
        m=len(codebooks),
    )
    if refine <= 0:
        return pq_adc_topk(scored, k)
    short = pq_adc_shortlist(scored, k, refine)
    return pq_exact_rerank(
        short, corpus.select("vec_id", "embedding"), queries, k
    )


# Fitted codebooks per (corpus snapshot, n_cells, m, ksub) — the same
# build/query phase separation as vector.py's _KMEANS_CACHE (training is
# deterministic, so caching never changes results in-process); keyed by
# the corpus FILE-LISTING FINGERPRINT so in-place rewrites refit.
_PQ_CACHE: dict = {}


def _cached_codebooks(
    emb: DataFrame, sf_dir: str, centers: list, n_cells: int, m: int, ksub: int
) -> list:
    from bayesiandatafusion_jl_spark.functions.vector import _corpus_fingerprint

    key = (_corpus_fingerprint(sf_dir), n_cells, m, ksub)
    books = _PQ_CACHE.get(key)
    if books is None:
        books = pq_train(emb, m=m, ksub=ksub, centers=centers)
        _PQ_CACHE[key] = books
    return books


@register("q_llm_knn_ivfpq", oracle=None, tags=("J3", "ann"), demoted=True)
def q_llm_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (memory-scale path) — IVF-PQ ANN top-k with exact refine:
    rows-only driver check; recall vs brute force and ADC fidelity are
    asserted in tests/test_pq.py. Same 10-query readout as
    q_llm_knn / q_llm_knn_ivf for cross-path comparison."""
    emb = load_table(spark, sf_dir, "embeddings")
    centers = _cached_centers(emb, sf_dir, 16)
    books = _cached_codebooks(emb, sf_dir, centers, 16, 16, 256)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return ann_ivfpq_search(emb, q, centers=centers, codebooks=books)
