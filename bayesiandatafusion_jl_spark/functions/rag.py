"""RAG retrieval pipeline: chunk → feature-hash embed → ANN retrieve.

Ties the r11 pieces into the end-to-end shape a retrieval corpus build
actually runs: documents are windowed into overlapping chunks
(functions/chunking.py), every chunk is embedded, and queries retrieve
their top-k chunks through the IVF ANN path (functions/vector.py) —
chunk lineage (doc_id, chunk_id) preserved throughout so a hit resolves
back to its source document.

The embedder is the FEATURE-HASHING trick (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009 — public paper),
not a stub: token → ``xxhash64`` bucket in [0, dim), a second hash bit
gives the ±1 sign (the signed construction that makes collisions cancel
in expectation), per-bucket signed counts become the vector, L2
normalized. It is deterministic, partition-invariant, needs no model
weights, and produces genuinely-useful lexical embeddings (a one-token
edit moves the vector O(1/√len)); swap in a neural encoder behind the
same (id, embedding) contract when one is available.

Plan shape: chunking is map-only; embedding is two shrinking-key
shuffles (token explode → (chunk, bucket) counts → per-chunk map) plus
a map-side densify/normalize; retrieval is the IVF path's
broadcast-probe candidate join. Nothing data-scaled crosses the driver.

Two serving shapes (r12): ``rag_retrieve`` is the one-shot in-session
form (fits the quantizer and encodes the corpus per call — fine for a
single ad-hoc batch); ``rag_build_index`` + ``rag_retrieve_index`` is
the deployment shape — the index is built and persisted ONCE
(vector_index machinery: partition-pruned postings, PQ codes, meta
pins, epoch appends, drift guard all apply), and every query batch
after that is a probe that reads codes for the probed cells plus the
refine shortlist's embeddings, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.chunking import chunk_documents
from bayesiandatafusion_jl_spark.registry import register

# Chunk lineage packs (doc_id, chunk_id) into one bigint vec_id as
# doc_id << CHUNK_BITS | chunk_id. 20 bits = 1,048,576 chunks per
# document (~25M whitespace tokens at the default 32/8 window) — far
# past any real document — and the encode carries a RUNTIME guard
# (``assert_true`` inside codegen, zero extra actions): a chunk_id at or
# above the modulus fails the job loudly instead of silently aliasing
# into the NEXT doc_id and returning a confidently-wrong source document
# (the worst failure mode for a provenance feature).
_CHUNK_BITS = 20
_CHUNK_CAP = 1 << _CHUNK_BITS


def _encode_lineage(doc_id="doc_id", chunk_id="chunk_id"):
    """vec_id = doc_id << 20 | chunk_id, runtime-guarded on
    chunk_id < 2^20 (raises in the executor, not a silent alias)."""
    guard = F.assert_true(
        F.col(chunk_id) < F.lit(_CHUNK_CAP),
        F.concat(
            F.lit(
                f"RAG lineage encode: chunk_id >= {_CHUNK_CAP} would alias"
                " into the next doc_id; re-chunk with a larger window or"
                " raise _CHUNK_BITS — offending doc_id="
            ),
            F.col(doc_id).cast("string"),
        ),
    )
    return F.when(
        guard.isNull(),
        F.shiftleft(F.col(doc_id).cast("bigint"), _CHUNK_BITS)
        + F.col(chunk_id),
    )


def _decode_lineage(vec_id="nb_id"):
    """(doc_id, chunk_id) columns decoded from a packed vec_id."""
    return (
        F.shiftright(F.col(vec_id), _CHUNK_BITS).alias("nb_doc_id"),
        (F.col(vec_id) % F.lit(_CHUNK_CAP)).cast("int").alias("nb_chunk_id"),
    )


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """(id_col, out_col): signed feature-hash embedding of the
    whitespace token multiset, L2-normalized (zero vectors — empty
    texts — stay zero rather than dividing by zero).

    Two shuffles, both on shrinking keys: (id, bucket) partial-agg
    counts, then one row per id; the densify+normalize is one Arrow
    batch kernel over the per-id bucket list (r15: no join-back — the
    explode_outer/NULL-bucket construction keeps zero-token ids).
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    # explode_outer + null-masked buckets (r15): blank/absent tokens ride
    # through the aggregation as a NULL-bucket group instead of being
    # filtered out, so every input id reaches the output WITHOUT the old
    # join-back against ``df`` — that join re-evaluated the whole upstream
    # frame (for chunked corpora: a second full chunk pass) and added a
    # third shuffle (guide §2.4). Identical vectors: real tokens hash the
    # same, the NULL-bucket entry is skipped by the densify kernel, and
    # all-blank/empty texts still come out as the zero vector. Assumes
    # unique ids (every caller's contract — doc ids, chunk lineage ids,
    # vec ids); duplicate ids would now collapse to one row instead of
    # duplicating.
    tok = df.select(
        F.col(id_col),
        F.explode_outer(F.split(F.lower(text_col), " ")).alias("tok"),
    )
    valid = F.col("tok").isNotNull() & (F.col("tok") != "")
    h = tok.select(
        id_col,
        F.when(valid, F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int")).alias(
            "bucket"
        ),
        # independent second hash decides the sign: collisions cancel in
        # expectation (the signed construction of Weinberger et al. §3)
        F.when(
            valid, F.pmod(F.xxhash64(F.lit(1), F.col("tok")), F.lit(2)) * 2 - 1
        ).alias("sign"),
    )
    counts = h.groupBy(id_col, "bucket").agg(F.sum("sign").alias("v"))
    sparse = counts.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("bucket"), F.col("v"))).alias("__m")
    )

    # densify + normalize in ONE Arrow batch kernel (numpy scatter):
    # the HOF form (transform over sequence with a map lookup per slot)
    # is interpreted per element — measured 29 s for 12k chunks vs <1 s
    # here; the same heavy-numerics-in-Arrow rule as pq_encode
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _densify(entries):
        out = []
        for e in entries:
            v = np.zeros(dim)
            if e is not None and len(e):
                # the NULL-bucket entry (blank/absent tokens) carries no
                # mass — skip it; an all-blank doc stays the zero vector
                pairs = [x for x in e if x["bucket"] is not None]
                if pairs:
                    # explicit int cast: a batch whose struct column holds
                    # any NULL bucket reaches pandas as floats
                    idx = np.array(
                        [x["bucket"] for x in pairs], dtype=np.int64
                    )
                    val = np.array([x["v"] for x in pairs], dtype=np.float64)
                    v[idx] = val
                    n = float(np.sqrt((v * v).sum()))
                    if n > 0:
                        v = v / n
            out.append(v.tolist())
        return pd.Series(out)

    _densify.__annotations__ = {"entries": pd.Series, "return": pd.Series}
    densify = pandas_udf(_densify, "array<double>")
    # every id reaches ``sparse`` by construction (explode_outer above),
    # so no join-back is needed to keep zero-token docs
    return sparse.select(id_col, densify(F.col("__m")).alias(out_col))


def rag_retrieve(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 3,
    chunk_tokens: int = 32,
    overlap: int = 8,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 6,
    m: int = 16,
    ksub: int = 64,
    refine: int = 4,
) -> DataFrame:
    """(qid, nb_id, score, rk, nb_doc_id, nb_chunk_id): top-k corpus
    CHUNKS per query document (the query is its own first chunk's
    embedding), via chunk → hash_embed → IVF-PQ ANN. Chunk vec_ids
    encode lineage as doc_id << 20 | chunk_id (runtime-guarded — see
    ``_encode_lineage``), decoded in the output.

    Retrieval goes through the ADC path (``ann_ivfpq_search``), not the
    exact-dot IVF: with a real query batch (hundreds of queries × ~20%
    probed corpus) exact rescoring evaluates dim-width interpreted-HOF
    dots on MILLIONS of candidate pairs — measured 95 s at sf0.1 —
    while ADC scores each pair with M table lookups and pays exact dots
    only for the refine·k shortlist (~5 s for the same batch, identical
    top-1 quality on the twin ground truth)."""
    from bayesiandatafusion_jl_spark.functions.vector_pq import ann_ivfpq_search

    from bayesiandatafusion_jl_spark.session import checkpoint_df

    chunks = chunk_documents(docs, chunk_tokens, overlap)
    cid = _encode_lineage().alias("doc_id")
    # checkpoint both embedding frames: the ANN path runs MANY actions
    # over them (quantizer count+sample, PQ fit count+sample, assignment,
    # encode, probe, LUTs) and each would otherwise re-run the whole
    # chunk+embed DAG — measured 163 s -> ~7 s at sf0.1
    emb = checkpoint_df(
        hash_embed(
            chunks.select(cid, F.col("chunk_text").alias("text")),
            dim=dim,
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    q_first = chunk_documents(query_docs, chunk_tokens, overlap).filter(
        F.col("chunk_id") == 0
    )
    q_emb = checkpoint_df(
        hash_embed(
            q_first.select("doc_id", F.col("chunk_text").alias("text")), dim=dim
        ).select(F.col("doc_id").alias("qid"), F.col("embedding").alias("qe"))
    )
    hits = ann_ivfpq_search(
        emb,
        q_emb,
        k=k,
        n_cells=n_cells,
        n_probe=n_probe,
        m=m,
        ksub=ksub,
        refine=refine,
        exclude_self=False,  # query ids live in a different id space
    )
    return hits.select("qid", "nb_id", "score", "rk", *_decode_lineage())


def rag_build_index(
    docs: DataFrame,
    index_dir: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
    dim: int = 64,
    n_cells: int = 16,
    n_assign: int = 2,
    pq_m: int = 16,
    pq_ksub: int = 64,
    pq_opq: bool = False,
) -> None:
    """Build the persisted retrieval index ONCE: chunk → hash_embed →
    ``write_ivf_index(pq)``. The serving architecture at 100 TB — the
    quantizer fit, assignment, and PQ encode are paid at BUILD time;
    every retrieval after that is a probe (``rag_retrieve_index``) that
    never re-reads or re-encodes the corpus. ``pq_opq`` (r15) threads
    the learned OPQ rotation into the build — the rotation persists in
    the index artifact, so probes, appends and the ingest stream pick it
    up with no further flags (see vector_index.write_ivf_index).

    The RAG-layer config (chunk window, embedding dim, lineage bits) is
    pinned in a ``rag_meta`` row next to the index's own meta: a
    retrieval with a mismatched chunker or embedder would produce
    silently-wrong scores, so ``rag_retrieve_index`` derives its config
    from the pin instead of trusting the caller."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        index_paths,
        write_meta,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        write_ivf_index,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    spark = docs.sparkSession
    chunks = chunk_documents(docs, chunk_tokens, overlap)
    # checkpoint: write_ivf_index runs several actions over the corpus
    # (quantizer sample, PQ fit sample, assignment stats, the write) —
    # each would otherwise re-run the whole chunk+embed DAG
    emb = checkpoint_df(
        hash_embed(
            chunks.select(
                _encode_lineage().alias("doc_id"),
                F.col("chunk_text").alias("text"),
            ),
            dim=dim,
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    write_ivf_index(
        emb,
        index_dir,
        n_cells=n_cells,
        n_assign=n_assign,
        pq_m=pq_m,
        pq_ksub=pq_ksub,
        pq_opq=pq_opq,
    )
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    write_meta(
        spark,
        rag_meta_path,
        "overwrite",
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        dim=dim,
        chunk_bits=_CHUNK_BITS,
    )


def rag_append_docs(
    docs: DataFrame,
    index_dir: str,
    epoch: str,
    max_drift: float = 0.15,
    on_drift: str = "error",
) -> None:
    """Append a NEW document shard to a ``rag_build_index`` artifact —
    the daily-ingest path: chunk and embed the shard under the index's
    PINNED config (rag_meta), then ``write_ivf_index(mode="append")``,
    which assigns map-side under the STORED quantizer, encodes under the
    stored codebooks, runs the drift guard, and writes replay-idempotent
    (cell_id, __epoch) partitions. The existing corpus is never re-read
    or re-encoded; epoch compaction / refit compose unchanged."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
        read_meta,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        write_ivf_index,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    spark = docs.sparkSession
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    check_meta(
        spark,
        rag_meta_path,
        "a shard chunked/encoded under a different lineage split would"
        " decode to the wrong documents",
        chunk_bits=_CHUNK_BITS,
    )
    meta = read_meta(spark, rag_meta_path).asDict()
    ivf_meta = read_meta(spark, index_paths(index_dir, "meta")[0]).asDict()
    chunks = chunk_documents(docs, meta["chunk_tokens"], meta["overlap"])
    emb = checkpoint_df(
        hash_embed(
            chunks.select(
                _encode_lineage().alias("doc_id"),
                F.col("chunk_text").alias("text"),
            ),
            dim=meta["dim"],
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    write_ivf_index(
        emb,
        index_dir,
        n_cells=ivf_meta["n_cells"],
        n_assign=ivf_meta["n_assign"],
        mode="append",
        epoch=epoch,
        max_drift=max_drift,
        on_drift=on_drift,
    )


def rag_delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: list[int]
) -> None:
    """Logically delete whole DOCUMENTS from a RAG index — the
    right-to-be-forgotten op. Resolves the docs' chunk vec_ids from the
    postings themselves (one column-pruned scan filtered on the lineage
    high bits; the resulting frame never routes through the driver) and
    tombstones them: retrieval stops returning any chunk of those docs
    immediately, and the next ``refit_ivf_index`` removes them
    physically (see ``delete_from_ivf_index``).

    Deleted doc_ids must NOT be re-ingested before that rebuild: a
    re-appended doc reuses its chunk vec_ids, so the live tombstones
    would keep hiding the new rows (the deliberate failure direction —
    hide, never resurface). Re-ingest under a new doc_id, or refit
    first."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        delete_from_ivf_index,
    )

    if not doc_ids:
        return
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    check_meta(
        spark,
        rag_meta_path,
        "deleting by decoded doc_id under a different lineage split would"
        " tombstone the WRONG documents' chunks",
        chunk_bits=_CHUNK_BITS,
    )
    (post_path,) = index_paths(index_dir, "postings")
    doc_set = [int(d) for d in doc_ids]
    vec_ids = (
        spark.read.parquet(post_path)
        .select("vec_id")
        .filter(F.shiftright(F.col("vec_id"), _CHUNK_BITS).isin(doc_set))
        .distinct()
    )
    delete_from_ivf_index(spark, index_dir, vec_ids)


def rag_retrieve_index(
    query_docs: DataFrame,
    index_dir: str,
    k: int = 3,
    n_probe: int = 6,
    refine: int = 4,
    query_mode: str = "first",
    mmr_lambda: float | None = None,
    mmr_pool: int = 4,
) -> DataFrame:
    """(qid, nb_id, score, rk, nb_doc_id, nb_chunk_id): probe-only
    retrieval against a ``rag_build_index`` artifact — NO quantizer fit,
    NO corpus encode, no corpus-sized read of any kind. The only work
    per query batch: chunk+embed the QUERIES (map-side + two tiny
    shuffles), the partition-pruned codes-only ADC scan over the probed
    cells, and the exact re-rank of the |Q|·refine·k shortlist (the one
    touch of embedding bytes — see ``ann_ivfpq_query_index``).

    ``query_mode`` (r12):

    - ``"first"`` — each query is its first chunk's embedding (the
      cheapest form; right when queries are short prompts).
    - ``"max"`` — EVERY query chunk retrieves independently and a
      neighbor's score is the MAX over the query's chunks (the
      late-interaction-lite form): a long query whose relevant passage
      sits past the first window still finds its target. Probe cost
      scales with the query's chunk count — each chunk is its own
      (qid, qe) row through the same ADC path — then one small
      (query, neighbor) max-aggregate + re-rank restores query grain.

    ``mmr_lambda`` (r12): when set, the top-(k·mmr_pool) shortlist is
    re-ranked with Maximal Marginal Relevance (``vector.mmr_rerank``) so
    near-duplicate chunks don't crowd out a second relevant source —
    the output keeps top-k per query by the MMR order and gains an
    ``mmr`` column. The extra cost is bounded by construction: the
    pool's embeddings ride along from the exact re-rank that already
    fetched them (``keep_emb``; a refine=0 probe instead pays one
    pushed-filter read of |Q|·k·mmr_pool rows) plus a per-qid pandas
    kernel over that pool — the corpus is still never re-read.

    Chunk window and embedding dim come from the index's pinned
    ``rag_meta`` (build-time config), and the lineage-bit pin refuses an
    index whose vec_ids this module would mis-decode."""
    from pyspark.sql import Window as W

    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
        read_meta,
    )
    from bayesiandatafusion_jl_spark.functions.vector import mmr_rerank
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    if query_mode not in ("first", "max"):
        raise ValueError(f"query_mode must be 'first' or 'max', got {query_mode!r}")
    spark = query_docs.sparkSession
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    check_meta(
        spark,
        rag_meta_path,
        "this index packs chunk lineage with a different bit split —"
        " decoding here would attribute hits to the wrong documents",
        chunk_bits=_CHUNK_BITS,
    )
    meta = read_meta(spark, rag_meta_path).asDict()
    q_chunks = chunk_documents(query_docs, meta["chunk_tokens"], meta["overlap"])
    if query_mode == "first":
        q_src = q_chunks.filter(F.col("chunk_id") == 0).select(
            F.col("doc_id"), F.col("chunk_text")
        )
    else:
        # qids carry the SAME lineage packing as the corpus side so the
        # per-chunk hits decode back to their query document
        q_src = q_chunks.select(
            _encode_lineage().alias("doc_id"), F.col("chunk_text")
        )
    # two+ consumers inside the probe path (probe frame, LUTs, re-rank)
    q_emb = checkpoint_df(
        hash_embed(
            q_src.select("doc_id", F.col("chunk_text").alias("text")),
            dim=meta["dim"],
        ).select(F.col("doc_id").alias("qid"), F.col("embedding").alias("qe"))
    )
    if mmr_lambda is not None and mmr_pool < 1:
        raise ValueError(f"mmr_pool must be >= 1, got {mmr_pool}")
    k_pool = k * mmr_pool if mmr_lambda is not None else k
    # MMR needs the pool's embeddings; when the exact re-rank runs
    # (refine > 0) it already holds exactly those rows, so carry them
    # through (keep_emb) instead of re-fetching the pool from the
    # postings afterwards — that re-fetch was a second ids collect +
    # pushed-IN scan + dedup exchange per probe (r15, guide §1.2). The
    # refine=0 path keeps the fetch: raw ADC never touches embeddings.
    keep_emb = mmr_lambda is not None and refine > 0
    hits = ann_ivfpq_query_index(
        q_emb,
        index_dir,
        k=k_pool,
        n_probe=n_probe,
        refine=refine,
        exclude_self=False,  # query ids live in a different id space
        keep_emb=keep_emb,
    )
    if query_mode == "max":
        # max over the query's chunks, then re-rank to pool grain per
        # query DOC; both steps run on |Q_chunks|·k_pool rows — tiny
        # next to the ADC scan. nb_emb is functionally dependent on
        # nb_id (one stored vector per id), so min() over the group's
        # identical copies IS that vector — a deterministic pick.
        aggs = [F.max("score").alias("score")]
        if keep_emb:
            aggs.append(F.min("nb_emb").alias("nb_emb"))
        doc_hits = (
            hits.select(
                F.shiftright(F.col("qid"), _CHUNK_BITS).alias("qid"),
                "nb_id",
                "score",
                *(["nb_emb"] if keep_emb else []),
            )
            .groupBy("qid", "nb_id")
            .agg(*aggs)
        )
        wq = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
        hits = (
            doc_hits.withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") <= k_pool)
        )
    if mmr_lambda is None:
        return hits.select("qid", "nb_id", "score", "rk", *_decode_lineage())
    if keep_emb:
        # single consumer of the hits frame — no checkpoint, no re-read
        diversified = mmr_rerank(
            hits.select("qid", "nb_id", "score", "nb_emb"),
            k=k,
            lam=mmr_lambda,
        )
    else:
        pool = checkpoint_df(hits.select("qid", "nb_id", "score"))
        diversified = mmr_rerank(
            pool.join(
                _pool_embeddings(spark, index_dir, pool), "nb_id"
            ),
            k=k,
            lam=mmr_lambda,
        )
    return diversified.select(
        "qid", "nb_id", "score", "mmr", "rk", *_decode_lineage()
    )


def _pool_embeddings(
    spark: SparkSession, index_dir: str, pool: DataFrame
) -> DataFrame:
    """(nb_id, nb_emb) for a bounded re-rank pool: the same two-regime
    shortlist re-read as the ADC exact refine — a one-parse ``IN`` list
    pushed into the postings scan for normal batches, a broadcast
    semi-join when the id list itself would bloat the plan. Bounded by
    construction (|Q|·k·mmr_pool ids), never a corpus read."""
    from bayesiandatafusion_jl_spark.functions.exprs import int_in_list
    from bayesiandatafusion_jl_spark.functions.index_meta import index_paths
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        _REFINE_IN_MAX_IDS,
    )

    (post_path,) = index_paths(index_dir, "postings")
    base = spark.read.parquet(post_path)
    ids_df = pool.select("nb_id").distinct()
    # one action decides the regime AND fetches the ids (r15: was a
    # count() + collect() pair — two jobs); limit(MAX+1) bounds the
    # transfer, and a result under the cap is the full id set
    id_rows = ids_df.limit(_REFINE_IN_MAX_IDS + 1).collect()
    if len(id_rows) <= _REFINE_IN_MAX_IDS:
        ids = [r["nb_id"] for r in id_rows]
        vecs = base.filter(int_in_list("vec_id", ids))
    else:
        vecs = base.join(
            F.broadcast(ids_df), base["vec_id"] == ids_df["nb_id"], "left_semi"
        )
    return vecs.select(
        F.col("vec_id").alias("nb_id"), F.col("embedding").alias("nb_emb")
    ).dropDuplicates(["nb_id"])


# Built rag indexes per (documents fingerprint, params) — the same
# build/query phase separation as vector._KMEANS_CACHE / _PQ_CACHE: the
# driver query's BUILD is deterministic, so rebuilding it per invocation
# in one process only re-pays the build; deployment-side the dir is the
# durable artifact and this cache is irrelevant.
_RAG_INDEX_CACHE: dict = {}


@register(
    "q_llm_rag_pipeline",
    oracle=None,  # hash-embedding + IVF are engine-specific; the planted
    # twin top-1 hit rate is measured in tests/test_rag.py and surfaced
    # as the hit column here (rows-only driver check)
    tags=("J3", "J5", "rag", "pipeline"),
    demoted=True,
)
def q_llm_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval over the planted-twin ground truth: the
    corpus is the original documents' chunks; the queries are the
    MUTATED TWINS' first chunks (doc_id % 7 == 0, first token dropped —
    the same ground truth the near-dup ops measure against). A correct
    pipeline retrieves a chunk of the twin's ORIGINAL document at rank
    1: the ``hit`` column records it per query.

    r12: composes the PERSISTED index machinery — ``rag_build_index``
    (chunk → embed → write_ivf_index, the amortizable build) then
    ``rag_retrieve_index`` (probe-only serving). The build runs once
    per (documents fingerprint, params) per process (the
    ``_cached_centers`` precedent); repeat invocations — the deployment
    shape — serve probe-only, which is also benched alone as
    ``rag_index_probe``."""
    import os

    from bayesiandatafusion_jl_spark.functions.dedup import _twin_corpus
    from bayesiandatafusion_jl_spark.functions.vector import (
        _corpus_fingerprint,
    )

    corpus = _twin_corpus(spark, sf_dir)
    docs = corpus.filter(F.col("doc_id") < 1_000_000)
    twins = corpus.filter(F.col("doc_id") >= 1_000_000)
    # measured sweep at sf0.1 (715 queries, 12k chunks): top-1 is flat
    # 0.966-0.968 across (16,6)/(32,6)/(64,8) cells/probes
    index_dir = f"/tmp/bdf_rag_index/{sf_dir.strip('/').replace('/', '_')}"
    key = (_corpus_fingerprint(sf_dir, "documents"), 32)
    if _RAG_INDEX_CACHE.get(index_dir) != key or not os.path.isdir(index_dir):
        rag_build_index(docs, index_dir, n_cells=32)
        _RAG_INDEX_CACHE[index_dir] = key
    hits = rag_retrieve_index(twins, index_dir, k=3, n_probe=6)
    return hits.withColumn(
        "hit",
        (F.col("nb_doc_id") == F.col("qid") - 1_000_000) & (F.col("rk") == 1),
    ).orderBy("qid", "rk")


def rag_fetch_chunks(
    hits: DataFrame,
    docs: DataFrame,
    index_dir: str,
) -> DataFrame:
    """Resolve retrieval hits back to their chunk TEXT — the serving
    step after ``rag_retrieve_index``: the index stores only codes and
    embeddings, so the prompt-assembly side needs (doc_id, chunk_id) →
    chunk_text, re-derived from the source documents under the index's
    PINNED chunk config (a different window/overlap would hand back the
    wrong spans — the meta check refuses that).

    Bounded by construction: the hit frame is |Q|·k rows, so only the
    HIT documents are re-read and re-chunked — ``docs`` is pruned with
    a broadcast semi-join on the hit doc ids before the map-only
    chunking expression runs, and the final attach is a broadcast hash
    join of the hits against those documents' chunks. The corpus is
    never scanned.
    """
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
        read_meta,
    )

    spark = hits.sparkSession
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    check_meta(
        spark,
        rag_meta_path,
        "this index packs chunk lineage with a different bit split —"
        " fetched spans would come from the wrong documents",
        chunk_bits=_CHUNK_BITS,
    )
    meta = read_meta(spark, rag_meta_path).asDict()
    hit_ids = hits.select(F.col("nb_doc_id").alias("doc_id")).distinct()
    hit_docs = docs.join(F.broadcast(hit_ids), "doc_id", "left_semi")
    chunks = chunk_documents(hit_docs, meta["chunk_tokens"], meta["overlap"])
    return hits.join(
        F.broadcast(
            chunks.select(
                F.col("doc_id").alias("nb_doc_id"),
                F.col("chunk_id").alias("nb_chunk_id"),
                "chunk_text",
            )
        ),
        ["nb_doc_id", "nb_chunk_id"],
    )


def rag_build_hybrid_index(
    docs: DataFrame,
    index_dir: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
    dim: int = 64,
    n_cells: int = 16,
    n_assign: int = 2,
    pq_m: int = 16,
    pq_ksub: int = 64,
    bm25_buckets: int = 64,
) -> None:
    """Build BOTH retrieval legs over the SAME chunk set: the dense
    IVF-PQ index (``rag_build_index``) plus a BM25 posting index over
    the chunk TEXTS under ``<index_dir>/bm25``, keyed by the identical
    lineage-packed vec_ids — so a dense hit and a lexical hit on the
    same chunk fuse on one id. The standard lexical+semantic RAG stack:
    the BM25 leg catches exact rare strings (identifiers, names, error
    codes) that feature hashing smears across buckets; the dense leg
    catches paraphrase the lexical leg misses."""
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )

    rag_build_index(
        docs,
        index_dir,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        dim=dim,
        n_cells=n_cells,
        n_assign=n_assign,
        pq_m=pq_m,
        pq_ksub=pq_ksub,
    )
    chunks = chunk_documents(docs, chunk_tokens, overlap)
    write_bm25_index(
        chunks.select(
            _encode_lineage().alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        index_dir.rstrip("/") + "/bm25",
        n_buckets=bm25_buckets,
    )


def rag_retrieve_hybrid(
    query_docs: DataFrame,
    index_dir: str,
    k: int = 3,
    leg_k: int = 10,
    n_probe: int = 6,
    refine: int = 4,
    k0: int = 60,
    max_df_ratio: float | None = 0.25,
) -> DataFrame:
    """(qid, nb_id, rrf, rk, rk_a, rk_b, nb_doc_id, nb_chunk_id):
    probe-only hybrid retrieval against a ``rag_build_hybrid_index``
    artifact — the dense ADC leg (``ann_ivfpq_query_index``) and the
    lexical BM25 leg probe their persisted indexes, RRF fuses the two
    rankings rank-only, lineage decodes at the end. rk_a is the dense
    leg's rank, rk_b the lexical leg's (null = that leg missed it).
    Queries are their first chunk (text for the lexical leg, its
    hash-embedding under the pinned dim for the dense leg); neither leg
    reads or re-encodes the corpus.

    ``max_df_ratio`` defaults ON (r13, serving rail): near-zero-IDF
    terms whose posting lists exceed 25% of the chunk corpus are dropped
    from the lexical leg before candidate generation — the unbounded
    candidate-volume pathology the bench measured at 56 s on a
    boilerplate-heavy batch. ``None`` restores exact BM25."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
        read_meta,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        rrf_fuse,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    spark = query_docs.sparkSession
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    check_meta(
        spark,
        rag_meta_path,
        "hybrid fusion joins the two legs' hits on lineage-packed chunk"
        " ids — a different bit split would fuse the wrong chunks",
        chunk_bits=_CHUNK_BITS,
    )
    meta = read_meta(spark, rag_meta_path).asDict()
    q_first = checkpoint_df(
        chunk_documents(query_docs, meta["chunk_tokens"], meta["overlap"])
        .filter(F.col("chunk_id") == 0)
        .select("doc_id", F.col("chunk_text").alias("text"))
    )
    q_emb = checkpoint_df(
        hash_embed(q_first, dim=meta["dim"]).select(
            F.col("doc_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )
    dense = ann_ivfpq_query_index(
        q_emb, index_dir, k=leg_k, n_probe=n_probe, refine=refine,
        exclude_self=False,
    )
    sparse = bm25_query_index(
        q_first.select(F.col("doc_id").alias("qid"), "text"),
        index_dir.rstrip("/") + "/bm25",
        k=leg_k,
        max_df_ratio=max_df_ratio,
    )
    fused = rrf_fuse(dense, sparse, k=k, k0=k0)
    return fused.select(
        "qid", "nb_id", "rrf", "rk", "rk_a", "rk_b", *_decode_lineage()
    )
