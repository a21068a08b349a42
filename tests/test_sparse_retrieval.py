"""BM25 + RRF hybrid fusion semantics (functions/sparse_retrieval.py).

Oracle parity for q_llm_bm25 / q_llm_hybrid_rrf runs in
test_oracle_parity.py like every registered spec; this file checks the
SEMANTICS the oracle can't see: relevance ordering on constructed
corpora, rank-only fusion, exclude_self, and partition invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
    bm25_topk,
    rrf_fuse,
)
from tests.conftest import SF_DIR_SMALL


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_rare_term_outranks_common(spark):
    # docs 1..4 all contain the common term; only doc 1 has the rare one.
    corpus = _corpus(
        spark,
        [
            (1, "common rare filler1 filler2"),
            (2, "common fillerA fillerB fillerC"),
            (3, "common fillerD fillerE fillerF"),
            (4, "common fillerG fillerH fillerI"),
        ],
    )
    queries = spark.createDataFrame(
        [(100, "common rare")], "qid bigint, text string"
    )
    hits = bm25_topk(corpus, queries, k=4).collect()
    assert [r["nb_id"] for r in sorted(hits, key=lambda r: r["rk"])][0] == 1
    # rare-term doc scores strictly higher, not tie-broken
    by_id = {r["nb_id"]: r["score"] for r in hits}
    assert by_id[1] > max(v for i, v in by_id.items() if i != 1)


def test_bm25_length_normalization(spark):
    # same tf for the query term; shorter doc wins under b=0.75
    corpus = _corpus(
        spark,
        [
            (1, "target a b"),
            (2, "target a b c d e f g h i j k l m n o p"),
            (3, "x y z"),
        ],
    )
    queries = spark.createDataFrame(
        [(100, "target")], "qid bigint, text string"
    )
    hits = {r["nb_id"]: r for r in bm25_topk(corpus, queries, k=5).collect()}
    assert 3 not in hits  # shares no term -> never a candidate
    assert hits[1]["score"] > hits[2]["score"]


def test_bm25_exclude_self(spark):
    corpus = _corpus(spark, [(1, "a b c"), (2, "a b d")])
    queries = corpus.select(F.col("doc_id").alias("qid"), "text")
    hits = bm25_topk(corpus, queries, k=5).collect()
    assert all(r["qid"] != r["nb_id"] for r in hits)
    hits_self = bm25_topk(corpus, queries, k=5, exclude_self=False).collect()
    assert any(r["qid"] == r["nb_id"] for r in hits_self)


def test_bm25_partition_invariance(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    a = bm25_topk(docs, queries, k=5).collect()
    b = bm25_topk(docs.repartition(13), queries, k=5).collect()
    key = lambda r: (r["qid"], r["rk"])  # noqa: E731
    assert sorted((r["qid"], r["rk"], r["nb_id"], r["score"]) for r in a) == (
        sorted((r["qid"], r["rk"], r["nb_id"], r["score"]) for r in b)
    )


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "qid bigint, nb_id bigint, rk int")


def test_rrf_both_legs_beat_single_leg(spark):
    # doc 10 is rank 2 in BOTH legs; docs 11/12 are rank 1 in one leg
    # only. 2/(60+2) > 1/(60+1), so consensus wins under RRF.
    a = _ranked(spark, [(1, 11, 1), (1, 10, 2)])
    b = _ranked(spark, [(1, 12, 1), (1, 10, 2)])
    out = sorted(rrf_fuse(a, b, k=3).collect(), key=lambda r: r["rk"])
    assert out[0]["nb_id"] == 10
    assert out[0]["rk_a"] == 2 and out[0]["rk_b"] == 2
    # single-leg docs tie on rrf and break on nb_id
    assert [r["nb_id"] for r in out[1:]] == [11, 12]
    assert out[1]["rrf"] == out[2]["rrf"]


def test_rrf_is_rank_only(spark):
    # wildly different scores, same ranks -> identical fusion
    a1 = spark.createDataFrame(
        [(1, 10, 999.0, 1), (1, 11, 0.5, 2)],
        "qid bigint, nb_id bigint, score double, rk int",
    )
    a2 = spark.createDataFrame(
        [(1, 10, 0.001, 1), (1, 11, -3.0, 2)],
        "qid bigint, nb_id bigint, score double, rk int",
    )
    b = _ranked(spark, [(1, 11, 1)])
    r1 = sorted(rrf_fuse(a1, b, k=5).collect())
    r2 = sorted(rrf_fuse(a2, b, k=5).collect())
    assert r1 == r2


def test_rrf_missing_leg_contributes_zero(spark):
    a = _ranked(spark, [(1, 10, 1)])
    b = spark.createDataFrame([], "qid bigint, nb_id bigint, rk int")
    (row,) = rrf_fuse(a, b, k=5).collect()
    assert row["nb_id"] == 10 and row["rk_b"] is None
    assert abs(row["rrf"] - round(1.0 / 61, 6)) < 1e-12


# ------------------------------------------------------- retrieval_metrics


def _hits(spark, rows):
    return spark.createDataFrame(rows, "qid bigint, nb_id bigint, rk int")


def _truth(spark, rows):
    return spark.createDataFrame(rows, "qid bigint, rel_id bigint")


def test_metrics_perfect_ranking(spark):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
    )

    hits = _hits(spark, [(1, 10, 1), (1, 11, 2), (1, 99, 3)])
    truth = _truth(spark, [(1, 10), (1, 11)])
    (row,) = retrieval_metrics(hits, truth, k=3).collect()
    assert row["n_rel"] == 2 and row["hits_at_k"] == 2
    assert row["recall_at_k"] == 1.0 and row["mrr"] == 1.0
    assert abs(row["ndcg"] - 1.0) < 1e-9  # all relevant ranked first


def test_metrics_relevant_ranked_last(spark):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
    )

    hits = _hits(spark, [(1, 98, 1), (1, 99, 2), (1, 10, 3)])
    truth = _truth(spark, [(1, 10)])
    (row,) = retrieval_metrics(hits, truth, k=3).collect()
    assert row["hits_at_k"] == 1 and row["recall_at_k"] == 1.0
    assert abs(row["mrr"] - 1.0 / 3) < 1e-9
    # DCG = 1/log2(4), IDCG = 1/log2(2) = 1
    import math

    assert abs(row["ndcg"] - round(1.0 / math.log2(4), 6)) < 1e-6


def test_metrics_miss_and_no_relevant_dropped(spark):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
    )

    hits = _hits(
        spark, [(1, 98, 1), (1, 99, 2), (2, 50, 1)]
    )  # qid 2 has NO truth row
    truth = _truth(spark, [(1, 10)])
    rows = retrieval_metrics(hits, truth, k=3).collect()
    assert [r["qid"] for r in rows] == [1]  # undefined-metric query dropped
    (row,) = rows
    assert row["hits_at_k"] == 0 and row["mrr"] == 0.0 and row["ndcg"] == 0.0


def test_metrics_k_cutoff(spark):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
    )

    # relevant doc at rank 4 is invisible at k=3
    hits = _hits(spark, [(1, 97, 1), (1, 98, 2), (1, 99, 3), (1, 10, 4)])
    truth = _truth(spark, [(1, 10)])
    (row,) = retrieval_metrics(hits, truth, k=3).collect()
    assert row["hits_at_k"] == 0 and row["recall_at_k"] == 0.0


# ----------------------------------------------------- persisted BM25 index


def _index_corpus(spark):
    rows = [
        (i, f"alpha{i % 7} beta{i % 5} gamma{i % 3} common word filler{i}")
        for i in range(60)
    ]
    return _corpus(spark, rows)


def test_bm25_index_probe_equals_oneshot(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25")
    write_bm25_index(corpus, d, n_buckets=16)
    probe = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    )
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    )
    assert probe == oneshot and len(probe) > 0


def test_bm25_index_append_equals_full_build(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    first = corpus.filter(F.col("doc_id") < 30)
    second = corpus.filter(F.col("doc_id") >= 30)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_inc")
    write_bm25_index(first, d, n_buckets=16)
    write_bm25_index(second, d, n_buckets=16, mode="append", epoch="s2")
    # df/avgdl/N at probe time must reflect BOTH epochs: equality with the
    # one-shot scorer over the FULL corpus is the whole contract
    probe = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    )
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    )
    assert probe == oneshot

    # replayed append (same shard, same epoch) overwrites its own
    # partitions -> byte-idempotent, no double counting
    write_bm25_index(second, d, n_buckets=16, mode="append", epoch="s2")
    replay = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    )
    assert replay == oneshot


def test_bm25_index_probe_is_partition_pruned(spark, tmp_path):
    import re

    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )
    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    corpus = _index_corpus(spark)
    d = str(tmp_path / "bm25_prune")
    write_bm25_index(corpus, d, n_buckets=16)
    # a 2-token query touches at most 2 of 16 bucket directories
    queries = spark.createDataFrame(
        [(1000, "alpha1 beta2")], "qid bigint, text string"
    )
    df = bm25_query_index(queries, d, k=5)
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[tok_bucket#\d+ IN \(([\d,\s]+)\)", plan)
    assert m, f"no static tok_bucket IN partition filter:\n{plan}"
    assert len(m.group(1).split(",")) <= 2, m.group(1)


def test_bm25_index_meta_pin_refuses_mismatched_append(spark, tmp_path):
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    d = str(tmp_path / "bm25_pin")
    write_bm25_index(corpus, d, n_buckets=16)
    with _pytest.raises(ValueError, match="n_buckets"):
        write_bm25_index(corpus, d, n_buckets=32, mode="append", epoch="x")


def test_bm25_index_stats(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_index_stats,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    d = str(tmp_path / "bm25_stats")
    write_bm25_index(corpus, d, n_buckets=8)
    write_bm25_index(
        corpus.select(F.col("doc_id") + 1000, "text").toDF("doc_id", "text"),
        d,
        n_buckets=8,
        mode="append",
        epoch="s2",
    )
    (row,) = bm25_index_stats(spark, d).collect()
    assert row["n_epochs"] == 2 and row["n_buckets"] == 8
    # ground truth recomputed from the corpus: postings = distinct
    # (doc, token) pairs, doubled by the shifted-id append
    import collections

    toks = collections.Counter()
    docs = 0
    for r in corpus.collect():
        docs += 1
        for t in set(r["text"].lower().split()):
            toks[t] += 1
    assert row["n_postings"] == 2 * sum(toks.values())
    assert row["n_tokens"] == len(toks)
    assert row["n_docs"] == 2 * docs
    assert row["max_df"] == 2 * max(toks.values())
    assert row["bucket_skew"] >= 1.0


def test_bm25_index_max_df_ratio_prunes_stopwords(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )

    # "common" is in every doc (df = N); "rare7" in exactly one
    corpus = _corpus(
        spark,
        [(i, f"common rare{i} filler{i % 3}") for i in range(20)],
    )
    d = str(tmp_path / "bm25_rail")
    write_bm25_index(corpus, d, n_buckets=8)
    queries = spark.createDataFrame(
        [(900, "common rare7")], "qid bigint, text string"
    )
    exact = bm25_query_index(queries, d, k=20).collect()
    pruned = bm25_query_index(queries, d, k=20, max_df_ratio=0.5).collect()
    # the rare-term doc tops both rankings
    top = lambda rows: min(rows, key=lambda r: r["rk"])["nb_id"]  # noqa: E731
    assert top(exact) == 7 and top(pruned) == 7
    # pruning drops candidates that ONLY matched the stopword
    assert {r["nb_id"] for r in pruned} == {7}
    assert {r["nb_id"] for r in exact} == set(range(20))


def test_bm25_index_compaction_preserves_probe_and_guards_replay(
    spark, tmp_path
):
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        compact_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    parts = [
        corpus.filter(F.col("doc_id") < 20),
        corpus.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)),
        corpus.filter(F.col("doc_id") >= 40),
    ]
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_cmp")
    write_bm25_index(parts[0], d, n_buckets=16)
    write_bm25_index(parts[1], d, n_buckets=16, mode="append", epoch="s1")
    write_bm25_index(parts[2], d, n_buckets=16, mode="append", epoch="s2")
    before = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    )
    stats = {r["frame"]: r for r in compact_bm25_index(spark, d).collect()}
    assert stats["postings"]["epochs_folded"] == 3
    after = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    )
    assert after == before
    ep = (
        spark.read.parquet(f"{d}/postings").select("__epoch").distinct().count()
    )
    assert ep == 1
    # a replayed append of a folded epoch must be REJECTED, not resurrected
    with _pytest.raises(ValueError, match="folded"):
        write_bm25_index(parts[1], d, n_buckets=16, mode="append", epoch="s1")
    # a genuinely new shard still appends fine
    new_shard = spark.createDataFrame(
        [(900, "fresh words only")], "doc_id bigint, text string"
    )
    write_bm25_index(new_shard, d, n_buckets=16, mode="append", epoch="s3")


def test_metrics_summary_macro_averages(spark):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
        retrieval_metrics_summary,
    )

    # qid 1: perfect (recall 1, mrr 1); qid 2: total miss (0, 0)
    hits = _hits(spark, [(1, 10, 1), (2, 98, 1)])
    truth = _truth(spark, [(1, 10), (2, 50)])
    (row,) = retrieval_metrics_summary(
        retrieval_metrics(hits, truth, k=3)
    ).collect()
    assert row["n_queries"] == 2
    assert abs(row["recall_at_k"] - 0.5) < 1e-9
    assert abs(row["mrr"] - 0.5) < 1e-9
    assert abs(row["ndcg"] - 0.5) < 1e-9


def test_bm25_index_tombstone_delete(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        delete_from_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_del")
    write_bm25_index(corpus, d, n_buckets=16)
    before = bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    victims = {r["nb_id"] for r in before if r["rk"] == 1}
    delete_from_bm25_index(spark, d, sorted(victims))
    after = bm25_query_index(queries, d, k=5, exclude_self=True).collect()
    assert not ({r["nb_id"] for r in after} & victims)
    assert len(after) > 0
    # fresh rebuild from the cleaned corpus purges physically AND clears
    # the tombstones: a re-used id in the new corpus is visible again
    cleaned = corpus.filter(~F.col("doc_id").isin(list(victims)))
    write_bm25_index(cleaned, d, n_buckets=16)
    rebuilt = bm25_query_index(queries, d, k=50, exclude_self=True).collect()
    assert not ({r["nb_id"] for r in rebuilt} & victims)
    write_bm25_index(corpus, d, n_buckets=16)  # ids return in a new build
    full = bm25_query_index(queries, d, k=50, exclude_self=True).collect()
    assert victims <= {r["nb_id"] for r in full}


def test_bm25_compaction_purges_tombstones_and_reconciles_stats(
    spark, tmp_path
):
    """r13: build → delete → compact must equal a FRESH REBUILD from the
    cleaned corpus — rows physically gone, df/avgdl/N reconciled (the
    Lucene deleted-docs drift closed), tombstones cleared, probe scores
    identical to the rebuild's."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_index_stats,
        bm25_query_index,
        compact_bm25_index,
        delete_from_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_purge")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s1",
    )
    victims = [3, 17, 41]
    delete_from_bm25_index(spark, d, victims)
    compact_bm25_index(spark, d)
    assert not has_tombstones(spark, d)
    live = {
        r.doc_id
        for r in spark.read.parquet(f"{d}/postings")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert not (set(victims) & live)
    # reference: a fresh rebuild from the cleaned corpus
    ref = str(tmp_path / "bm25_ref")
    write_bm25_index(
        corpus.filter(~F.col("doc_id").isin(victims)), ref, n_buckets=16
    )
    stat_cols = ("n_postings", "n_tokens", "n_docs", "max_df")
    got = bm25_index_stats(spark, d).collect()[0]
    want = bm25_index_stats(spark, ref).collect()[0]
    for c in stat_cols:
        assert got[c] == want[c], (c, got[c], want[c])
    # the raw stats frame too: N / tokened / total length all reconciled
    raw = lambda p: spark.read.parquet(f"{p}/stats").groupBy().sum(  # noqa: E731
        "n_docs", "n_docs_tokened", "sum_dl"
    ).collect()[0]
    assert tuple(raw(d)) == tuple(raw(ref))
    # probe scores (not just ids) equal the rebuild's — df/avgdl agree
    probe = lambda p: sorted(  # noqa: E731
        (r["qid"], r["rk"], r["nb_id"], round(r["score"], 9))
        for r in bm25_query_index(queries, p, k=5, exclude_self=True).collect()
    )
    got_p, want_p = probe(d), probe(ref)
    assert got_p == want_p and len(got_p) > 0
    # replaying a folded epoch is rejected; a new epoch appends fine
    import pytest as _pytest

    with _pytest.raises(ValueError, match="folded"):
        write_bm25_index(
            corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
            mode="append", epoch="s1",
        )
    write_bm25_index(
        spark.createDataFrame(
            [(901, "fresh unseen words")], "doc_id bigint, text string"
        ),
        d, n_buckets=16, mode="append", epoch="s2",
    )


def test_bm25_compaction_crash_window_still_reconciles(
    spark, tmp_path, monkeypatch
):
    """r14 (ADVICE): a crash BETWEEN the postings swap and the stats
    rewrite used to leave ``n_docs`` stale forever — the victims were
    gone from the postings, so the next compaction recounted 0 purged.
    The purge_pending frame (persisted before the swap) closes it: the
    resumed compaction must reconcile stats exactly to a fresh rebuild."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import index_compact
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        compact_bm25_index,
        delete_from_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_crash")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s1",
    )
    victims = [3, 17, 41]
    delete_from_bm25_index(spark, d, victims)

    real_swap = index_compact._swap_dir

    def dying_swap(spark_, tmp, final):
        if final.rstrip("/").endswith("/stats"):
            raise IOError("injected crash before the stats rewrite")
        return real_swap(spark_, tmp, final)

    monkeypatch.setattr(index_compact, "_swap_dir", dying_swap)
    with _pytest.raises(IOError, match="injected crash"):
        compact_bm25_index(spark, d)
    monkeypatch.undo()
    # mid-window state: victims physically gone from the postings (the
    # swap landed), stats still stale, pending frame + tombstones intact
    live = {
        r.doc_id
        for r in spark.read.parquet(f"{d}/postings")
        .select("doc_id").distinct().collect()
    }
    assert not (set(victims) & live)
    pending = {
        r.doc_id for r in spark.read.parquet(f"{d}/purge_pending").collect()
    }
    assert pending == set(victims)
    assert has_tombstones(spark, d)
    # resume: the next compaction must subtract the PERSISTED victims
    compact_bm25_index(spark, d)
    ref = str(tmp_path / "bm25_crash_ref")
    write_bm25_index(
        corpus.filter(~F.col("doc_id").isin(victims)), ref, n_buckets=16
    )
    raw = lambda p: spark.read.parquet(f"{p}/stats").groupBy().sum(  # noqa: E731
        "n_docs", "n_docs_tokened", "sum_dl"
    ).collect()[0]
    assert tuple(raw(d)) == tuple(raw(ref))
    probe = lambda p: sorted(  # noqa: E731
        (r["qid"], r["rk"], r["nb_id"], round(r["score"], 9))
        for r in bm25_query_index(queries, p, k=5, exclude_self=True).collect()
    )
    assert probe(d) == probe(ref) and len(probe(d)) > 0
    # consumed: pending gone, tombstones cleared; a THIRD compaction
    # must not double-subtract (n_docs unchanged)
    import os

    assert not os.path.exists(f"{d}/purge_pending")
    assert not has_tombstones(spark, d)
    before = tuple(raw(d))
    compact_bm25_index(spark, d)
    assert tuple(raw(d)) == before


def test_bm25_compaction_post_swap_crash_never_double_subtracts(
    spark, tmp_path, monkeypatch
):
    """r15 ADVICE (the OTHER side of the r14 crash window): a crash
    AFTER the stats swap lands but BEFORE the purge_pending delete used
    to leave a live-looking pending frame whose victims were ALREADY
    subtracted — the next compaction double-subtracted n_docs and IDF
    drifted low. The __target_epoch incarnation pin closes it: a pending
    frame whose target epoch is already a stats partition is stale and
    is consumed, not honored."""
    import os

    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import index_compact
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        has_tombstones,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        compact_bm25_index,
        delete_from_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_postswap")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s1",
    )
    victims = [5, 23, 47]
    delete_from_bm25_index(spark, d, victims)

    real_swap = index_compact._swap_dir

    def swap_lands_then_dies(spark_, tmp, final):
        real_swap(spark_, tmp, final)
        if final.rstrip("/").endswith("/stats"):
            raise IOError("injected crash after the stats swap")

    monkeypatch.setattr(index_compact, "_swap_dir", swap_lands_then_dies)
    with _pytest.raises(IOError, match="after the stats swap"):
        compact_bm25_index(spark, d)
    monkeypatch.undo()
    # mid-window state: stats RECONCILED, pending + tombstones intact
    raw = lambda p: tuple(  # noqa: E731
        spark.read.parquet(f"{p}/stats")
        .groupBy().sum("n_docs", "n_docs_tokened", "sum_dl")
        .collect()[0]
    )
    ref = str(tmp_path / "bm25_postswap_ref")
    write_bm25_index(
        corpus.filter(~F.col("doc_id").isin(victims)), ref, n_buckets=16
    )
    assert raw(d) == raw(ref)
    assert os.path.exists(f"{d}/purge_pending") and has_tombstones(spark, d)
    # resume: the stale pending frame must be consumed, NOT re-subtracted
    compact_bm25_index(spark, d)
    assert raw(d) == raw(ref)
    assert not os.path.exists(f"{d}/purge_pending")
    assert not has_tombstones(spark, d)
    probe = lambda p: sorted(  # noqa: E731
        (r["qid"], r["rk"], r["nb_id"], round(r["score"], 9))
        for r in bm25_query_index(queries, p, k=5, exclude_self=True).collect()
    )
    assert probe(d) == probe(ref) and len(probe(d)) > 0


def _downgrade_stats_to_int32(spark, stats_dir: str, epoch: str) -> None:
    """Rewrite one __epoch partition of a stats dir as int32 — the
    layout a pre-r14 revision persisted."""
    import shutil

    part = f"{stats_dir}/__epoch={epoch}"
    old = (
        spark.read.parquet(part)
        .select(
            F.col("n_docs").cast("int").alias("n_docs"),
            F.col("n_docs_tokened").cast("int").alias("n_docs_tokened"),
            F.col("sum_dl").cast("int").alias("sum_dl"),
        )
        .collect()
    )
    shutil.rmtree(part)
    spark.createDataFrame(
        old, "n_docs int, n_docs_tokened int, sum_dl int"
    ).write.parquet(part)


def test_bm25_stats_int32_artifact_migrates_on_write(spark, tmp_path):
    """r15 ADVICE: n_docs widened int -> bigint in r14; appending to an
    index persisted by the OLD revision left mixed int32/int64 stats
    schemas a plain parquet read can refuse. Probes must read the old
    AND the mixed layout (per-epoch fallback), and any write op (append
    or compact) must upgrade the dir to uniform bigint in place."""
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        compact_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_int32")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s1",
    )
    probe = lambda p: sorted(  # noqa: E731
        (r["qid"], r["rk"], r["nb_id"], round(r["score"], 9))
        for r in bm25_query_index(queries, p, k=5).collect()
    )
    want = probe(d)
    assert len(want) > 0

    # (a) uniformly-old index (every epoch int32): probe reads it as-is
    _downgrade_stats_to_int32(spark, f"{d}/stats", "base")
    _downgrade_stats_to_int32(spark, f"{d}/stats", "s1")
    assert probe(d) == want
    # (b) MIXED layout (the exact artifact the old append bug left):
    # one int32 epoch next to a bigint one — per-epoch fallback read
    write_bm25_index(
        spark.createDataFrame([], "doc_id bigint, text string"),
        d, n_buckets=16, mode="append", epoch="s2",
    )
    # the append itself migrated the dir; downgrade one epoch again to
    # recreate the historical mixed state
    _downgrade_stats_to_int32(spark, f"{d}/stats", "s1")
    assert probe(d) == want
    # (c) compaction upgrades in place to uniform bigint
    compact_bm25_index(spark, d)
    sch = spark.read.parquet(f"{d}/stats").schema
    assert all(
        sch[c].dataType.typeName() == "long"
        for c in ("n_docs", "n_docs_tokened", "sum_dl")
    )
    assert probe(d) == want


def test_bm25_overwrite_resets_folded_ledger(spark, tmp_path):
    """A fresh rebuild starts a new epoch namespace: the old
    incarnation's fold history must not reject re-used epoch names (the
    rebuild-then-reingest workflow, e.g. a stream checkpoint reset)."""
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        folded_epochs,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        compact_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    d = str(tmp_path / "bm25_ledger")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="stream-0",
    )
    compact_bm25_index(spark, d)
    assert "stream-0" in folded_epochs(spark, d)
    # rebuild (new incarnation) — the restarted stream's epoch names work
    write_bm25_index(corpus, d, n_buckets=16)
    assert folded_epochs(spark, d) == {}
    write_bm25_index(
        spark.createDataFrame(
            [(902, "another shard")], "doc_id bigint, text string"
        ),
        d, n_buckets=16, mode="append", epoch="stream-0",
    )


def test_serving_paths_default_candidate_rail(spark, tmp_path):
    """r13: the hybrid SERVING paths default max_df_ratio=0.25 (the
    bench's own unbounded batch hit 56 s on a boilerplate corpus), while
    the rail keeps planted relevant pairs at rank 1 and drops
    corpus-wide stopwords from candidate generation entirely."""
    import inspect

    from bayesiandatafusion_jl_spark.functions.rag import rag_retrieve_hybrid
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        hybrid_query_indexes,
        write_bm25_index,
    )

    # the contract: serving endpoints are railed by default, exact on None
    for fn in (hybrid_query_indexes, rag_retrieve_hybrid):
        assert inspect.signature(fn).parameters["max_df_ratio"].default == 0.25

    # every doc shares 3 stopwords (df = N); each doc has a unique payload
    corpus = _corpus(
        spark,
        [
            (i, f"the and of payload{i} extra{i % 4}")
            for i in range(40)
        ],
    )
    d = str(tmp_path / "bm25_rail")
    write_bm25_index(corpus, d, n_buckets=16)
    # planted pair: query contains doc 7's unique payload + the stopwords
    q = spark.createDataFrame(
        [(100, "the and of payload7")], "qid bigint, text string"
    )
    railed = bm25_query_index(q, d, k=3, max_df_ratio=0.25).collect()
    assert railed and railed[0]["nb_id"] == 7 and railed[0]["rk"] == 1
    # stopword-only query: the rail prunes EVERY term -> zero candidate
    # rows ever generated (the boundedness claim); exact mode still scans
    q_stop = spark.createDataFrame(
        [(101, "the and of")], "qid bigint, text string"
    )
    assert bm25_query_index(q_stop, d, k=3, max_df_ratio=0.25).count() == 0
    assert bm25_query_index(q_stop, d, k=3, max_df_ratio=None).count() > 0


def test_metrics_truth_bearing_query_with_no_hits_scores_zero(spark):
    """r13: a query the ranker returned NOTHING for (but which HAS
    relevant docs) must appear with all-zero metrics — dropping it would
    inflate macro averages exactly when the retriever fails hardest."""
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_metrics,
        retrieval_metrics_summary,
    )

    hits = _hits(spark, [(1, 10, 1)])  # qid 2 retrieved nothing
    truth = _truth(spark, [(1, 10), (2, 50)])
    rows = {r["qid"]: r for r in retrieval_metrics(hits, truth, k=3).collect()}
    assert set(rows) == {1, 2}
    z = rows[2]
    assert (
        z["hits_at_k"] == 0
        and z["recall_at_k"] == 0.0
        and z["mrr"] == 0.0
        and z["ndcg"] == 0.0
    )
    (s,) = retrieval_metrics_summary(
        retrieval_metrics(hits, truth, k=3)
    ).collect()
    assert s["n_queries"] == 2 and abs(s["recall_at_k"] - 0.5) < 1e-9


def test_retrieval_quality_rows_respect_floors(spark):
    """r13/r14: the driver-visible quality rows (q_llm_scale_suite tail)
    sit at or above their pinned floors at tiny SF; every family reports
    all three metrics plus the railed readout, and the planted-marker
    rows (SF-independent quality bars, floors >= 0.7) are present."""
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        retrieval_quality_rows,
    )

    rows = retrieval_quality_rows(spark, "/root/testdata/sf0.001")
    names = [r[0] for r in rows]
    assert names == [
        "bm25_index_recall@10",
        "bm25_index_mrr",
        "bm25_index_ndcg@10",
        "bm25_index_railed_recall@10",
        "planted_bm25_recall@10",
        "planted_bm25_mrr",
        "hybrid_index_recall@10",
        "hybrid_index_mrr",
        "hybrid_index_ndcg@10",
        "ivfpq_index_recall@10",
        "ivfpq_index_mrr",
        "ivfpq_index_ndcg@10",
        "planted_ivf_recall@10",
        "planted_ivfpq_recall@10",
    ]
    floors = {m: fl for m, _, _, fl in rows}
    # the planted floors are QUALITY bars, not breakage rails; the
    # ivfpq bar rose to the ivf one when OPQ landed (r15)
    assert floors["planted_bm25_recall@10"] >= 0.7
    assert floors["planted_ivf_recall@10"] >= 0.9
    assert floors["planted_ivfpq_recall@10"] >= 0.9
    for method, n, quality, floor in rows:
        assert n > 0, method
        if floor is not None:
            assert quality >= floor, (method, quality, floor)


def test_planted_eval_fixture_shape(spark):
    """The planted corpus only changes marked docs (marker tokens
    appended, base text intact) and queries hit ONLY their own doc's
    markers (df=1 per marker at any SF)."""
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        _PLANT_EVERY,
        planted_eval_corpus,
        planted_eval_queries,
    )

    sf = "/root/testdata/sf0.001"
    base = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    marked = {
        r["doc_id"]: r["text"]
        for r in planted_eval_corpus(spark, sf).collect()
    }
    assert set(marked) == set(base)
    for did, text in marked.items():
        if did % _PLANT_EVERY == 0:
            assert text.startswith(base[did])
            tail = text[len(base[did]):].split()
            assert tail == [f"qmk{did}m{j}" for j in range(3)]
        else:
            assert text == base[did]
    # each marker token appears in exactly one marked doc
    q = {r["qid"]: r["text"] for r in planted_eval_queries(spark, sf).collect()}
    all_marked_text = " ".join(
        t for d, t in marked.items() if d % _PLANT_EVERY == 0
    )
    for qid, qtext in q.items():
        for tokn in qtext.split():
            assert all_marked_text.count(tokn) == 1, (qid, tokn)


# --- token_df sidecar (r15 optimization) ------------------------------------
#
# The probe's df pass prefers the vocabulary-sized per-epoch (token, df)
# sidecar over re-counting posting rows, and trusts it ONLY when its
# epoch set equals the postings'. Every test pins the one contract that
# matters: sidecar or fallback, the probe equals the one-shot scorer.


def _scan_locations(df):
    import re

    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    return re.findall(r"Location:.*", formatted_plan(df))


def _probe_tuples(queries, d, **kw):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
    )

    return sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, d, k=5, **kw).collect()
    )


def test_bm25_df_sidecar_served_and_exact(spark, tmp_path):
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_df")
    write_bm25_index(corpus, d, n_buckets=16)
    probe_df = bm25_query_index(queries, d, k=5, exclude_self=True)
    locs = _scan_locations(probe_df)
    # df comes from the sidecar: exactly ONE posting-list scan remains
    # (the candidate join); the df input scan reads token_df instead
    assert sum("/token_df" in loc for loc in locs) == 1, locs
    assert sum("/postings" in loc for loc in locs) == 1, locs
    probe = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in probe_df.collect()
    )
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    )
    assert probe == oneshot and len(probe) > 0
    # the sidecar's per-epoch rows sum to exactly the posting-derived df
    side = {
        (r["token"], r["df"])
        for r in spark.read.parquet(f"{d}/token_df")
        .groupBy("token").agg(F.sum("df").alias("df")).collect()
    }
    derived = {
        (r["token"], r["df"])
        for r in spark.read.parquet(f"{d}/postings")
        .groupBy("token").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    assert side == derived


def test_bm25_df_sidecar_mismatch_falls_back(spark, tmp_path):
    import shutil

    from bayesiandatafusion_jl_spark.functions.index_meta import write_epoch
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_fb")
    write_bm25_index(corpus, d, n_buckets=16)
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    )
    # (a) sidecar absent (an index persisted before the sidecar existed)
    shutil.rmtree(f"{d}/token_df")
    probe_df = bm25_query_index(queries, d, k=5, exclude_self=True)
    locs = _scan_locations(probe_df)
    assert sum("/token_df" in loc for loc in locs) == 0, locs
    assert sum("/postings" in loc for loc in locs) == 2, locs
    assert _probe_tuples(queries, d, exclude_self=True) == oneshot
    # (b) sidecar carries an epoch the postings lack (a crashed append —
    # the sidecar lands BEFORE the postings): detected, exact fallback
    ghost = spark.createDataFrame(
        [("zzzghost", 1, 0)], "token string, df bigint, tok_bucket int"
    )
    write_epoch(ghost, f"{d}/token_df", "ghost", fresh=True,
                outer_cols=("tok_bucket",))
    probe_df = bm25_query_index(queries, d, k=5, exclude_self=True)
    assert sum("/token_df" in loc for loc in _scan_locations(probe_df)) == 0
    assert _probe_tuples(queries, d, exclude_self=True) == oneshot


def test_bm25_df_sidecar_append_replay_and_compaction(spark, tmp_path):
    import shutil

    from bayesiandatafusion_jl_spark.functions.index_meta import epoch_names
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        compact_bm25_index,
        delete_from_bm25_index,
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    queries = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_df_lc")
    write_bm25_index(corpus.filter(F.col("doc_id") < 30), d, n_buckets=16)
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s2",
    )
    # replay of the same (shard, epoch) is idempotent for the sidecar too
    write_bm25_index(
        corpus.filter(F.col("doc_id") >= 30), d, n_buckets=16,
        mode="append", epoch="s2",
    )
    assert epoch_names(spark, f"{d}/token_df", nested=True) == frozenset(
        {"base", "s2"}
    )
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    )
    assert _probe_tuples(queries, d, exclude_self=True) == oneshot
    # compaction rebuilds the sidecar from the PURGED postings: df drops
    # where victims' rows left, and the epoch sets stay equal
    victims = [3, 17, 41]
    delete_from_bm25_index(spark, d, victims)
    compact_bm25_index(spark, d)
    post_epochs = epoch_names(spark, f"{d}/postings", nested=True)
    assert epoch_names(spark, f"{d}/token_df", nested=True) == post_epochs
    side = {
        (r["token"], r["df"])
        for r in spark.read.parquet(f"{d}/token_df")
        .groupBy("token").agg(F.sum("df").alias("df")).collect()
    }
    derived = {
        (r["token"], r["df"])
        for r in spark.read.parquet(f"{d}/postings")
        .groupBy("token").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    assert side == derived
    ref = str(tmp_path / "bm25_df_lc_ref")
    write_bm25_index(
        corpus.filter(~F.col("doc_id").isin(victims)), ref, n_buckets=16
    )
    r9 = lambda t: [(q, rk, nb, round(s, 9)) for q, rk, nb, s in t]  # noqa: E731
    assert r9(_probe_tuples(queries, d, exclude_self=True)) == r9(
        _probe_tuples(queries, ref, exclude_self=True)
    )
    # a compaction over a sidecar-less index HEALS it (pre-sidecar
    # artifacts converge at the next maintenance op)
    shutil.rmtree(f"{d}/token_df")
    compact_bm25_index(spark, d)
    assert epoch_names(spark, f"{d}/token_df", nested=True) == epoch_names(
        spark, f"{d}/postings", nested=True
    )
    assert r9(_probe_tuples(queries, d, exclude_self=True)) == r9(
        _probe_tuples(queries, ref, exclude_self=True)
    )


def test_bm25_df_sidecar_torn_rebuild_never_trusted(spark, tmp_path):
    """r16 (closes the r15 ADVICE window): a fresh overwrite onto an
    EXISTING index deletes the old sidecar up front and writes the new
    one LAST, so a rebuild that crashes anywhere in between leaves the
    sidecar ABSENT — the probe falls back to the exact posting-derived
    df instead of trusting a sidecar from the wrong corpus whose epoch
    set happens to equal the fresh postings' ({base} == {base})."""
    import os

    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import index_compact
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )

    corpus = _index_corpus(spark)
    old = corpus.filter(F.col("doc_id") < 30)
    new = corpus.filter(F.col("doc_id") >= 10)  # overlapping, different df
    queries = new.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("qid"), "text"
    )
    d = str(tmp_path / "bm25_torn")
    write_bm25_index(old, d, n_buckets=16)

    # rebuild with the NEW corpus, dying after postings+stats+meta landed
    # but before the final sidecar write (reset_ledger sits in between)
    real = index_compact.reset_ledger

    def dying_reset(*a, **kw):
        raise IOError("injected kill before the sidecar write")

    index_compact.reset_ledger = dying_reset
    try:
        with _pytest.raises(IOError, match="injected kill"):
            write_bm25_index(new, d, n_buckets=16)
    finally:
        index_compact.reset_ledger = real
    assert not os.path.isdir(f"{d}/token_df")
    # the probe serves the NEW postings exactly, from the fallback path
    probe_df = __import__(
        "bayesiandatafusion_jl_spark.functions.sparse_retrieval",
        fromlist=["bm25_query_index"],
    ).bm25_query_index(queries, d, k=5, exclude_self=True)
    assert sum("/token_df" in loc for loc in _scan_locations(probe_df)) == 0
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(new, queries, k=5).collect()
    )
    assert _probe_tuples(queries, d, exclude_self=True) == oneshot
    # a clean rebuild restores the sidecar-served plan and stays exact
    write_bm25_index(new, d, n_buckets=16)
    probe_df = __import__(
        "bayesiandatafusion_jl_spark.functions.sparse_retrieval",
        fromlist=["bm25_query_index"],
    ).bm25_query_index(queries, d, k=5, exclude_self=True)
    assert sum("/token_df" in loc for loc in _scan_locations(probe_df)) == 1
    assert _probe_tuples(queries, d, exclude_self=True) == oneshot
