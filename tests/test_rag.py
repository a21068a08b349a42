"""RAG pipeline gates (functions/rag.py): feature-hash embedding
invariants and planted-twin retrieval quality — the tests the rows-only
driver check can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.rag import (
    _CHUNK_BITS,
    _CHUNK_CAP,
    _decode_lineage,
    _encode_lineage,
    hash_embed,
    q_llm_rag_pipeline,
)
from tests.conftest import SF_DIR_TINY


def _vecs(df):
    return {r["doc_id"]: list(r["embedding"]) for r in df.collect()}


def test_hash_embed_invariants(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),   # identical text
            (3, "a quick brown fox jumps"),     # one-token edit
            (4, ""),                            # empty → zero vector
            (5, "completely different tokens entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    v = _vecs(hash_embed(docs, dim=64))
    assert set(v) == {1, 2, 3, 4, 5}
    assert all(len(x) == 64 for x in v.values())
    # identical text → identical vector; unit norm for non-empty
    assert v[1] == v[2]
    for i in (1, 3, 5):
        assert abs(math.fsum(x * x for x in v[i]) - 1.0) < 1e-9
    assert v[4] == [0.0] * 64
    # one-token edit stays close; unrelated text stays far
    cos13 = math.fsum(a * b for a, b in zip(v[1], v[3]))
    cos15 = math.fsum(a * b for a, b in zip(v[1], v[5]))
    # 5-token docs, one edit → 4 shared tokens ≈ 0.8 cosine minus hash
    # collision noise (measured 0.77); unrelated text sits near 0
    assert cos13 > 0.7
    assert cos15 < 0.4
    # partition invariance
    v2 = _vecs(hash_embed(docs.repartition(7), dim=64))
    assert v == v2
    with pytest.raises(ValueError, match="dim"):
        hash_embed(docs, dim=1)


def test_lineage_roundtrip_and_overflow_guard(spark):
    # round-trip at the edge of the modulus: chunk_id = cap-1 decodes
    # losslessly; doc ids adjacent in the packed space never collide
    edge = spark.createDataFrame(
        [(7, 0), (7, _CHUNK_CAP - 1), (8, 0)], "doc_id long, chunk_id int"
    )
    rows = (
        edge.select(_encode_lineage().alias("nb_id"))
        .select("nb_id", *_decode_lineage())
        .collect()
    )
    got = {(r["nb_doc_id"], r["nb_chunk_id"]) for r in rows}
    assert got == {(7, 0), (7, _CHUNK_CAP - 1), (8, 0)}
    assert len({r["nb_id"] for r in rows}) == 3
    # a chunk_id AT the modulus fails the job loudly (executor-side
    # assert), never silently aliasing into doc_id 8
    bad = spark.createDataFrame(
        [(7, _CHUNK_CAP)], "doc_id long, chunk_id int"
    )
    with pytest.raises(Exception, match="alias"):
        bad.select(_encode_lineage().alias("v")).collect()


def test_rag_index_probe_reads_no_corpus(spark, tmp_path):
    """The probe-only serving path (rag_retrieve_index) must not touch
    the corpus: no quantizer fit, no corpus encode, and — with refine=0
    isolating the ADC leg — ZERO embedding bytes read (the postings
    scans project codes only; the lineage-pinned rag_meta supplies the
    chunk/embed config)."""
    import re

    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )
    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}w{j}" for j in range(40)))
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    queries = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    plan = formatted_plan(
        rag_retrieve_index(queries, index_dir, k=2, n_probe=2, refine=0)
    )
    # every postings scan projects codes only — embedding never read
    scans = [
        s
        for s in plan.split("Scan parquet")[1:]
        if re.search(r"Location:.*postings", s)
    ]
    assert scans, plan
    for s in scans:
        schema = re.search(r"ReadSchema: ([^\n]+)", s)
        assert schema and "embedding" not in schema.group(1), s[:500]
    # and the probed-cells partition filter survives the composition
    assert re.search(r"PartitionFilters: \[cell_id#\d+ IN \(", plan), plan
    # with refine>0 the ONLY embedding read is the shortlist re-read:
    # a pushed vec_id IN (...) filter rides every embedding-bearing scan
    plan_r = formatted_plan(
        rag_retrieve_index(queries, index_dir, k=2, n_probe=2, refine=2)
    )
    emb_scans = [
        s
        for s in plan_r.split("Scan parquet")[1:]
        if re.search(r"Location:.*postings", s)
        and "embedding" in (re.search(r"ReadSchema: ([^\n]+)", s) or [""])[0]
    ]
    assert emb_scans, plan_r
    for s in emb_scans:
        assert re.search(r"PushedFilters: \[.*In\(vec_id", s), s[:800]
    # lineage survives the round trip: qid space intact, decode lossless
    rows = rag_retrieve_index(queries, index_dir, k=2, n_probe=2).collect()
    assert rows
    for r in rows:
        assert (r["nb_doc_id"] << _CHUNK_BITS) + r["nb_chunk_id"] == r["nb_id"]
        assert 0 <= r["nb_doc_id"] < 30


def test_rag_append_serves_new_docs_and_replays_idempotently(
    spark, tmp_path
):
    """Incremental corpus growth: an appended shard's chunks are
    retrievable through the same probe path (config from the pinned
    rag_meta, assignment under the STORED quantizer — no refit), and a
    replayed append does not duplicate candidates."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_append_docs,
        rag_build_index,
        rag_retrieve_index,
    )

    base = spark.createDataFrame(
        [(i, " ".join(f"base{i}tok{j}" for j in range(40))) for i in range(25)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix3")
    rag_build_index(base, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    # in-distribution shard: near-twins of base docs (one token swapped)
    # — drifted-vocabulary shards are the drift guard's job, tested in
    # tests/test_vector_index.py; here the append must SUCCEED
    fresh = spark.createDataFrame(
        [
            (
                100 + i,
                f"fresh{100 + i} "
                + " ".join(f"base{i % 25}tok{j}" for j in range(1, 40)),
            )
            for i in range(5)
        ],
        "doc_id long, text string",
    )
    rag_append_docs(fresh, index_dir, epoch="day-0")
    rag_append_docs(fresh, index_dir, epoch="day-0")  # replay: idempotent
    # query WITH an appended doc's own text: its top hit is itself
    hits = rag_retrieve_index(
        fresh.select((F.col("doc_id") + 9000).alias("doc_id"), "text"),
        index_dir,
        k=2,
        n_probe=4,
    ).collect()
    by_q: dict = {}
    for r in hits:
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == 5
    for qid, rs in by_q.items():
        top = min(rs, key=lambda r: r["rk"])
        assert top["nb_doc_id"] == qid - 9000, rs
        # replayed shard did not duplicate: ranks are unique
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))


def test_one_shot_and_persisted_paths_agree(spark, tmp_path):
    """The in-session form (rag_retrieve, fits+encodes per call) and the
    persisted form (build once, probe) are the same math — same
    quantizer-fit sample, same PQ construction — so on a fixed corpus
    they must return the same top-1 per query."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"c{i % 6}tok{j}" for j in range(40))) for i in range(24)],
        "doc_id long, text string",
    )
    queries = docs.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 500).alias("doc_id"), "text"
    )
    one_shot = {
        r["qid"]: r["nb_id"]
        for r in rag_retrieve(
            docs, queries, k=1, n_cells=4, n_probe=3, m=4, ksub=16
        ).collect()
        if r["rk"] == 1
    }
    index_dir = str(tmp_path / "ragix4")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    persisted = {
        r["qid"]: r["nb_id"]
        for r in rag_retrieve_index(queries, index_dir, k=1, n_probe=3).collect()
        if r["rk"] == 1
    }
    assert one_shot == persisted and len(one_shot) == 4


def test_rag_query_mode_max_finds_buried_passages(spark, tmp_path):
    """A long query whose FIRST chunk is unrelated noise but whose later
    chunks quote a corpus document: query_mode='first' misses the
    target, query_mode='max' ranks it top-1 (late-interaction-lite)."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )

    corpus = spark.createDataFrame(
        [
            (i, " ".join(f"c{i}tok{j}" for j in range(40)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragmax")
    rag_build_index(corpus, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    # 64-token query: 32 tokens of noise, then doc 5's first 32 tokens
    noise = " ".join(f"zz{j}" for j in range(32))
    quote = " ".join(f"c5tok{j}" for j in range(32))
    queries = spark.createDataFrame(
        [(900, noise + " " + quote)], "doc_id long, text string"
    )
    first = rag_retrieve_index(
        queries, index_dir, k=1, n_probe=4, query_mode="first"
    ).collect()
    # first-chunk-only: the noise chunk retrieves something, but not doc 5
    assert all(r["nb_doc_id"] != 5 for r in first)
    best = rag_retrieve_index(
        queries, index_dir, k=3, n_probe=4, query_mode="max"
    ).collect()
    by_rank = {r["rk"]: r for r in best}
    assert by_rank[1]["nb_doc_id"] == 5, best
    assert by_rank[1]["qid"] == 900  # query grain restored
    assert sorted(r["rk"] for r in best) == [1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="query_mode"):
        rag_retrieve_index(queries, index_dir, query_mode="mean")


def test_rag_delete_docs_hides_every_chunk(spark, tmp_path):
    """Doc-level right-to-be-forgotten: after rag_delete_docs, no chunk
    of the deleted document is retrievable — even by a query that IS
    that document's text — and other docs are unaffected."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_delete_docs,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [
            (i, f"doc{i} " + " ".join(f"g{i % 5}tok{j}" for j in range(1, 40)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragdel")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    queries = docs.filter(F.col("doc_id").isin(2, 3)).select(
        (F.col("doc_id") + 800).alias("doc_id"), "text"
    )
    before = {
        r["qid"]: r["nb_doc_id"]
        for r in rag_retrieve_index(queries, index_dir, k=1, n_probe=4).collect()
        if r["rk"] == 1
    }
    assert before == {802: 2, 803: 3}  # self-match wins pre-delete
    rag_delete_docs(spark, index_dir, [2])
    after = rag_retrieve_index(queries, index_dir, k=3, n_probe=4).collect()
    assert all(r["nb_doc_id"] != 2 for r in after)
    top = {r["qid"]: r["nb_doc_id"] for r in after if r["rk"] == 1}
    assert top[803] == 3  # untouched doc unaffected
    assert top[802] != 2 and top[802] % 5 == 2  # falls back to a near-twin


def test_rag_index_refuses_mismatched_lineage_pin(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        index_paths,
        write_meta,
    )
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}x{j}" for j in range(40))) for i in range(10)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix2")
    rag_build_index(docs, index_dir, n_cells=2, pq_m=4, pq_ksub=16)
    (rag_meta_path,) = index_paths(index_dir, "rag_meta")
    meta = spark.read.parquet(rag_meta_path).collect()[0].asDict()
    write_meta(
        spark, rag_meta_path, "overwrite", **{**meta, "chunk_bits": 10}
    )
    with pytest.raises(ValueError, match="lineage"):
        rag_retrieve_index(docs.limit(2), index_dir)


def test_rag_pipeline_retrieves_planted_twins(spark):
    rows = q_llm_rag_pipeline(spark, SF_DIR_TINY).collect()
    by_q: dict = {}
    for r in rows:
        # lineage decode is lossless
        assert (r["nb_doc_id"] << _CHUNK_BITS) + r["nb_chunk_id"] == r["nb_id"]
        by_q.setdefault(r["qid"], []).append(r)
    n_q = len(by_q)
    assert n_q > 50  # every twin doc issues a query
    assert all(sorted(r["rk"] for r in rs) == [1, 2, 3] for rs in by_q.values())
    # measured 0.97 top-1 / 1.0 in-top-3 on this corpus; generous margins
    top1 = sum(1 for rs in by_q.values() if any(r["hit"] for r in rs))
    in3 = sum(
        1
        for q, rs in by_q.items()
        if any(r["nb_doc_id"] == q - 1_000_000 for r in rs)
    )
    assert top1 / n_q >= 0.9
    assert in3 / n_q >= 0.97


def test_mmr_lambda_one_matches_plain_topk(spark, tmp_path):
    """lam=1.0 is pure relevance — MMR must reproduce the plain top-k
    ranking exactly (same ids, same order, same scores)."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(40))) for i in range(30)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix_mmr1")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    queries = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    # the MMR path probes at pool grain (k·mmr_pool), so the honest
    # relevance baseline is the plain k·mmr_pool run truncated to k —
    # same candidate pool, relevance-only selection
    plain = {
        (r["qid"], r["rk"]): (r["nb_id"], r["score"])
        for r in rag_retrieve_index(
            queries, index_dir, k=12, n_probe=3
        ).collect()
        if r["rk"] <= 3
    }
    mmr = {
        (r["qid"], r["rk"]): (r["nb_id"], r["score"])
        for r in rag_retrieve_index(
            queries, index_dir, k=3, n_probe=3, mmr_lambda=1.0, mmr_pool=4
        ).collect()
    }
    assert mmr == plain


def test_mmr_diversifies_duplicate_chunks(spark, tmp_path):
    """Planted duplicates: docs 0 and 1 are identical, doc 2 overlaps
    the query half-way. Plain top-2 returns the two clones; MMR's
    second slot must escape to the diverse relevant doc."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )

    # two-aspect query: A-tokens + B-tokens. docs 0/1 are duplicate
    # A-docs (each fully covers aspect A), doc 2 covers aspect B.
    # Relevance ranks the A-docs first (16 vs 14 shared tokens), so the
    # plain top-2 is the clone pair; MMR's second slot must escape to
    # the B-doc: the duplicate's sim-to-selected is 1.0 while the
    # B-doc is orthogonal to the already-picked A-doc.
    a = " ".join(f"aspa{j}" for j in range(16))
    b = " ".join(f"aspb{j}" for j in range(14))
    rows = [(0, a), (1, a), (2, b)] + [
        (i, " ".join(f"noise{i}w{j}" for j in range(30))) for i in range(3, 20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index_dir = str(tmp_path / "ragix_mmr_div")
    rag_build_index(docs, index_dir, n_cells=2, pq_m=4, pq_ksub=16)
    queries = spark.createDataFrame(
        [(1000, a + " " + b)], "doc_id long, text string"
    )

    plain = [
        r["nb_doc_id"]
        for r in rag_retrieve_index(
            queries, index_dir, k=2, n_probe=2
        ).orderBy("rk").collect()
    ]
    assert sorted(plain) == [0, 1]  # the clones crowd the top-2
    mmr = [
        r["nb_doc_id"]
        for r in rag_retrieve_index(
            queries, index_dir, k=2, n_probe=2, mmr_lambda=0.5
        ).orderBy("rk").collect()
    ]
    assert mmr[0] in (0, 1)  # rank 1 is still pure relevance
    assert mmr[1] == 2  # rank 2 escaped the clone pair
    # lineage decode still holds on the MMR output
    got = rag_retrieve_index(
        queries, index_dir, k=2, n_probe=2, mmr_lambda=0.5
    ).collect()
    for r in got:
        assert (r["nb_doc_id"] << _CHUNK_BITS) + r["nb_chunk_id"] == r["nb_id"]


def test_mmr_keep_emb_matches_pool_refetch(spark, tmp_path):
    """r15: the MMR path consumes the embeddings the exact re-rank
    already fetched (keep_emb) instead of re-reading the pool from the
    postings — the output must be BIT-IDENTICAL to the old refetch
    path, reconstructed here inline (pool ids → _pool_embeddings →
    mmr_rerank)."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        _pool_embeddings,
        rag_build_index,
        rag_retrieve_index,
    )
    from bayesiandatafusion_jl_spark.functions.vector import mmr_rerank

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i % 11}w{j}" for j in range(40)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix_keepemb")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    queries = docs.filter(F.col("doc_id") < 6).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    k, mmr_pool, lam = 3, 4, 0.4
    new_path = sorted(
        map(
            tuple,
            rag_retrieve_index(
                queries, index_dir, k=k, n_probe=3,
                mmr_lambda=lam, mmr_pool=mmr_pool,
            ).collect(),
        )
    )
    # old path: plain probe at pool grain, then refetch pool embeddings
    # from the postings and re-rank — the pre-r15 plan, spelled out
    pool = rag_retrieve_index(
        queries, index_dir, k=k * mmr_pool, n_probe=3
    ).select("qid", "nb_id", "score")
    old = mmr_rerank(
        pool.join(_pool_embeddings(spark, index_dir, pool), "nb_id"),
        k=k,
        lam=lam,
    )
    from bayesiandatafusion_jl_spark.functions.rag import _decode_lineage

    old_path = sorted(
        map(
            tuple,
            old.select(
                "qid", "nb_id", "score", "mmr", "rk", *_decode_lineage()
            ).collect(),
        )
    )
    assert new_path == old_path
    # the carried column must not leak into the output schema
    got_cols = rag_retrieve_index(
        queries, index_dir, k=k, n_probe=3, mmr_lambda=lam
    ).columns
    assert "nb_emb" not in got_cols
    # keep_emb on the raw-ADC leg is a loud contract error
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )

    with pytest.raises(ValueError, match="refine > 0"):
        ann_ivfpq_query_index(
            queries.limit(1).select(
                F.col("doc_id").alias("qid"), F.lit(None).alias("qe")
            ),
            index_dir,
            refine=0,
            keep_emb=True,
        )


def test_mmr_rerank_partition_invariance_and_guards(spark):
    """Unit gates on the generic kernel: output independent of input
    partitioning; pool cap raises; lam validated."""
    import numpy as np

    from bayesiandatafusion_jl_spark.functions.vector import mmr_rerank

    rng = np.random.default_rng(7)
    rows = []
    for qid in (1, 2):
        for nb in range(12):
            v = rng.normal(size=8)
            v /= np.linalg.norm(v)
            rows.append((qid, nb, round(1.0 - 0.01 * nb, 4), [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "qid long, nb_id long, score double, nb_emb array<double>"
    )
    a = sorted(map(tuple, mmr_rerank(df.repartition(1), k=4, lam=0.3).collect()))
    b = sorted(map(tuple, mmr_rerank(df.repartition(13), k=4, lam=0.3).collect()))
    assert a == b
    assert len(a) == 8  # 2 qids × k
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, k=4, lam=1.5)
    import re as _re

    from py4j.protocol import Py4JJavaError

    try:
        mmr_rerank(df, k=4, lam=0.3, max_pool_rows=5).collect()
        raised = False
    except Exception as e:  # Spark wraps the kernel's ValueError
        raised = bool(_re.search("max_pool_rows", str(e)))
    assert raised


def test_rag_fetch_chunks_resolves_hit_text(spark, tmp_path):
    """Every retrieval hit resolves to EXACTLY the chunk text the index
    was built from (pinned chunk config), and only hit documents are
    re-chunked."""
    from bayesiandatafusion_jl_spark.functions.chunking import chunk_documents
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_fetch_chunks,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(80))) for i in range(20)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix_fetch")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    queries = docs.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    hits = rag_retrieve_index(queries, index_dir, k=2, n_probe=3)
    fetched = rag_fetch_chunks(hits, docs, index_dir)
    assert fetched.count() == hits.count()  # every hit resolved, no dupes
    truth = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in chunk_documents(docs, 32, 8).collect()
    }
    for r in fetched.collect():
        assert r["chunk_text"] == truth[(r["nb_doc_id"], r["nb_chunk_id"])]


def test_rag_hybrid_retrieval(spark, tmp_path):
    """Hybrid RAG: corpus with unique per-doc markers; queries are
    mutated twins (first token dropped). The LEXICAL leg alone must nail
    the marker docs; the fused top-1 resolves each twin to its original
    document, and both legs' ranks surface in the output."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_hybrid_index,
        rag_retrieve_hybrid,
    )

    schema = "doc_id long, text string"

    def doc(i):
        # per-doc filler vocab: docs share no tokens, so each twin's only
        # strong match in BOTH legs is its own original
        return (
            i,
            f"marker{i} " + " ".join(f"w{i}_{j}" for j in range(40)),
        )

    docs = spark.createDataFrame([doc(i) for i in range(24)], schema)
    index_dir = str(tmp_path / "hyb_ix")
    rag_build_hybrid_index(
        docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16, bm25_buckets=8
    )
    # twins: drop the first post-marker token, keep the unique marker
    twins = spark.createDataFrame(
        [
            (i + 5000, f"marker{i} " + " ".join(
                f"w{i}_{j}" for j in range(2, 40)
            ))
            for i in range(0, 24, 6)
        ],
        schema,
    )
    hits = rag_retrieve_hybrid(twins, index_dir, k=3, leg_k=8).collect()
    top1 = {r["qid"]: r for r in hits if r["rk"] == 1}
    assert len(top1) == 4
    for qid, r in top1.items():
        assert r["nb_doc_id"] == qid - 5000
        # the marker is an exact rare term: the lexical leg must rank
        # the twin's original first
        assert r["rk_b"] == 1
    # both legs contribute somewhere in the fused lists
    assert any(r["rk_a"] is not None for r in hits)
    assert any(r["rk_b"] is not None for r in hits)


def test_rag_compaction_purges_deleted_docs_physically(spark, tmp_path):
    """r13: compact_ivf_index on a RAG index applies the doc-grain
    tombstones physically — the deleted document's chunk rows leave the
    postings, the tombstone set clears, and serving is unchanged (still
    never returns the deleted doc; other docs' results identical)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        compact_ivf_index,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )
    from bayesiandatafusion_jl_spark.functions.rag import (
        _CHUNK_BITS,
        rag_build_index,
        rag_delete_docs,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [
            (i, f"doc{i} " + " ".join(f"g{i % 5}tok{j}" for j in range(1, 40)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragpurge")
    rag_build_index(docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16)
    rag_delete_docs(spark, index_dir, [2])
    queries = docs.filter(F.col("doc_id").isin(2, 3)).select(
        (F.col("doc_id") + 800).alias("doc_id"), "text"
    )
    before = sorted(
        (r["qid"], r["rk"], r["nb_id"])
        for r in rag_retrieve_index(queries, index_dir, k=3, n_probe=4).collect()
    )
    compact_ivf_index(spark, index_dir)
    assert not has_tombstones(spark, index_dir)
    live_docs = {
        r["vec_id"] >> _CHUNK_BITS
        for r in spark.read.parquet(f"{index_dir}/postings")
        .select("vec_id").distinct().collect()
    }
    assert 2 not in live_docs and 3 in live_docs
    after = sorted(
        (r["qid"], r["rk"], r["nb_id"])
        for r in rag_retrieve_index(queries, index_dir, k=3, n_probe=4).collect()
    )
    assert after == before


def test_rag_opq_build_serves_and_appends(spark, tmp_path):
    """r15: an OPQ-rotated RAG index (rag_build_index(pq_opq=True))
    persists its rotation, retrieves planted twins exactly like the
    plain build (the rotation rides the artifact — probes need no
    flag), and appended docs encode under the STORED rotation so they
    are retrievable too."""
    import os

    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_append_docs,
        rag_build_index,
        rag_retrieve_index,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(40))) for i in range(30)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "ragix_opq")
    rag_build_index(
        docs, index_dir, n_cells=4, pq_m=4, pq_ksub=16, pq_opq=True
    )
    assert os.path.isdir(f"{index_dir}/rotation")
    # self-queries: the matching doc's chunk must rank 1
    queries = docs.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    hits = rag_retrieve_index(queries, index_dir, k=3, n_probe=4).collect()
    top1 = {
        r["qid"] - 1000: r["nb_doc_id"] for r in hits if r["rk"] == 1
    }
    assert sum(1 for q, d in top1.items() if q == d) >= 7
    # appended docs encode under the stored rotation (in-distribution
    # text — a near-twin of doc 5 — so the drift guard stays quiet)
    extra = spark.createDataFrame(
        [
            (
                100,
                " ".join(f"tok5w{j}" for j in range(36))
                + " " + " ".join(f"nw{j}" for j in range(4)),
            )
        ],
        "doc_id long, text string",
    )
    rag_append_docs(extra, index_dir, epoch="s1")
    q2 = extra.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    # doc 100's first chunk is BY CONSTRUCTION identical to doc 5's
    # (scores tie at 1.0) — the appended doc must surface beside it
    hit2 = rag_retrieve_index(q2, index_dir, k=2, n_probe=4).collect()
    assert {r["nb_doc_id"] for r in hit2} == {5, 100}
