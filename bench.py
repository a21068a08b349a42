"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver-side collect overhead).

Measurement protocol (r2 verdict item #8): every query runs ITERATIONS
times (default 2) and reports the per-query MIN — the min is the
load-independent estimate, so round-over-round comparisons are not
polluted by sandbox noise (the r2→r4 "regressions" on unchanged queries
were exactly that). ``queries`` holds the mins; ``queries_max`` the maxes
(a large max/min spread flags a noisy run), and the active Spark conf is
embedded so runs are apples-to-apples.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bayesiandatafusion_jl_spark.registry import specs  # noqa: E402
from bayesiandatafusion_jl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_join_multiway",        # flagship: 5-way star join
    "q_agg_groupby",          # TPC-H Q1 shape
    "q_agg_count_distinct",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_rank_topk_per_group",
    "q_win_cumsum",
    "q_stream_session",
    "q_stream_sliding",
    "q_llm_knn",
    "q_llm_wordcount",  # demoted from the driver surface; still a headline op
    "q_llm_exact_dedup",
    "q_llm_near_dedup_lsh",
    "q_llm_knn_ivf",       # r6: map-side assignment + k-means centers — timed to pin the fix
    "q_llm_simhash",       # r7: posting-list + two-level-explode pair expansion
    "q_stream_ewma",       # r7: batch form of the applyInPandasWithState EWMA op
    "q_text_repetition",   # r7: Gopher repetition filters — 1 scan, 3 shrinking-key aggs
    "q_graph_components",  # r6: connected components (co-occurrence graph + CC rounds)
    "q_cdc_merge",         # r8: maintenance family — changelog merge onto snapshot
    "q_scd2_history",      # r8: maintenance family — validity-interval history
    "q_llm_pack_sequences",  # r8: checkpointed two-phase prefix scan
    "q_llm_pipeline_compose",  # r8: quality→decontaminate→mixture→pack chain
    "q_llm_dsir_weights",  # r8: DSIR hashed-n-gram importance weights
    "q_llm_semdedup",      # r8: SemDeDup cluster-then-prune semantic dedup
    "q_ml_predict_rmse",
    "q_win_auc",
    "q_agg_heavy_hitters",  # r11: exact Misra-Gries 2-pass heavy hitters
    "q_text_unigram_nll",   # r11: pin the 3-scans->1 checkpoint rewrite
    "q_text_bigram_nll",    # r11: pin the 4-scans->1 tagged-stream rewrite
    "q_join_bloom_pruned",  # r11: Bloom semi-join pushdown (map-side prune)
    "q_llm_knn_ivfpq",      # r11: residual-PQ ADC + exact refine re-rank
    "q_agg_cms",            # r11: count-min sketch build + top-20 validation
    "q_llm_rag_pipeline",   # r11: chunk -> hash-embed -> IVF retrieve chain
    "q_matview_rollup",     # r12: incremental matview split-merge refresh
    "q_events_funnel",      # r12: ordered funnel join cascade over events
    "q_matview_persisted",  # r12: build->append->compact->retract lifecycle
    "q_events_retention",   # r12: cohort retention matrix
    "q_scd2_asof",          # r12: as-of attribute lookup vs SCD2 history
    "q_table_checks",       # r12: one-pass expectation gate + FK anti-join
    "q_llm_token_budget",   # r12: grouped prefix-scan token-budget fill
    "q_llm_bm25",           # r12: BM25 posting-list scoring (lexical leg)
    "q_llm_hybrid_rrf",     # r12: dense+sparse RRF fusion
    "q_text_fuzzy_join",    # r12: exact edit-distance join, prefix filter
    "q_graph_pagerank",     # r12: decimal-exact power iteration
    "q_text_collocations",  # r12: PMI bigram collocation mining
    "q_llm_bm25_index",     # r12: persisted posting index, probe-only on iter 2
    "q_llm_hybrid_index",   # r12: hybrid serving from persisted indexes
    "q_events_transitions",  # r13: Markov transition matrix (1 user-grain window)
    "q_text_kl_drift",      # r13: corpus KL drift (vocab-grain outer join)
    "q_matview_topk",       # r13: incremental top-k state merge
    "q_llm_quality_model",  # r13: MLlib-LR seed classifier train + map-only sweep
    "q_text_set_sim_join",  # r13: exact Jaccard join, PPJoin prefix filter
    "q_events_anomaly",     # r13: per-user NLL under the transition matrix
    "q_llm_pipeline_persisted",  # r14: durable restartable pipeline build
    "q_llm_pipeline_classified",  # r15: + trained classifier stage (model
    # train-if-absent: the first-ever run pays training, steady state
    # serves from the persisted artifact — the deployment shape)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bdf-bench")

    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    all_specs = specs(include_demoted=True)
    timings: dict[str, float] = {}
    timings_max: dict[str, float] = {}
    # warm the JVM + parquet footer caches with one throwaway action
    all_specs["q_scan_filter_count"].fn(spark, sf_dir).count()

    for name in HEADLINE:
        fn = all_specs[name].fn
        runs = []
        for _ in range(iterations):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        timings_max[name] = round(max(runs), 3)

    # Persisted-index family (r11 verdict item): build each index ONCE
    # outside the timed loop, then time the PROBE leg alone — the
    # steady-state cost an incremental pipeline actually pays per shard.
    import shutil

    from pyspark.sql import functions as FF

    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        _twin_corpus,
        dedup_incremental,
        write_signature_index,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivf_query_index,
        write_ivf_index,
    )
    from bayesiandatafusion_jl_spark.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents").select("doc_id", "text")
    sig_dir = "/tmp/bdf_bench_sig_index"
    shutil.rmtree(sig_dir, ignore_errors=True)
    write_signature_index(docs, sig_dir)
    new_shard = _twin_corpus(spark, sf_dir).filter(FF.col("doc_id") >= 1_000_000)

    def time_probe(label: str, probe) -> None:
        runs = []
        for _ in range(iterations):
            t0 = time.time()
            probe().write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[label] = round(min(runs), 3)
        timings_max[label] = round(max(runs), 3)

    time_probe("dedup_index_probe", lambda: dedup_incremental(new_shard, sig_dir))

    emb = _lt(spark, sf_dir, "embeddings")
    ivf_dir = "/tmp/bdf_bench_ivf_index"
    shutil.rmtree(ivf_dir, ignore_errors=True)
    write_ivf_index(emb, ivf_dir, n_cells=16, n_assign=2)
    q_batch = emb.filter(FF.col("vec_id") < 100).select(
        FF.col("vec_id").alias("qid"), FF.col("embedding").alias("qe")
    )
    time_probe(
        "ivf_index_probe", lambda: ann_ivf_query_index(q_batch, ivf_dir, k=5, n_probe=6)
    )

    # r11: the PQ-bearing index's ADC probe leg — candidate scan reads
    # codes only (column pruning); built once outside the timed loop
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        ann_ivfpq_query_index,
    )

    ivfpq_dir = "/tmp/bdf_bench_ivfpq_index"
    shutil.rmtree(ivfpq_dir, ignore_errors=True)
    write_ivf_index(emb, ivfpq_dir, n_cells=16, n_assign=2, pq_m=16)
    time_probe(
        "ivfpq_index_probe",
        lambda: ann_ivfpq_query_index(q_batch, ivfpq_dir, k=5, n_probe=6, refine=4),
    )

    # r12: RAG serving steady-state — the persisted-index probe leg of
    # q_llm_rag_pipeline (whose own row still pays the per-call build,
    # by design: it is the self-contained end-to-end form). Build once
    # outside the timed loop; time chunk+embed(queries) + ADC probe +
    # refine only.
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )

    twin_corpus = _twin_corpus(spark, sf_dir)
    rag_dir = "/tmp/bdf_bench_rag_index"
    shutil.rmtree(rag_dir, ignore_errors=True)
    rag_build_index(
        twin_corpus.filter(FF.col("doc_id") < 1_000_000), rag_dir, n_cells=32
    )
    rag_queries = twin_corpus.filter(FF.col("doc_id") >= 1_000_000)
    time_probe(
        "rag_index_probe",
        lambda: rag_retrieve_index(rag_queries, rag_dir, k=3, n_probe=6),
    )
    # r12: the MMR-diversified serving leg — same probe plus the
    # k·pool shortlist embedding re-read and the per-qid pandas kernel
    time_probe(
        "rag_index_probe_mmr",
        lambda: rag_retrieve_index(
            rag_queries, rag_dir, k=3, n_probe=6, mmr_lambda=0.5
        ),
    )
    # r12: hybrid lexical+semantic serving — BM25 subindex over the same
    # chunks built once beside the dense index; probe = both legs + RRF
    from bayesiandatafusion_jl_spark.functions.rag import (
        _CHUNK_BITS,
        _encode_lineage,
        rag_retrieve_hybrid,
    )
    from bayesiandatafusion_jl_spark.functions.chunking import chunk_documents
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )

    assert _CHUNK_BITS  # chunk-id packing shared with the dense index
    # chunk params come from the PINNED rag_meta, never hardcoded: both
    # legs' lineage-packed chunk ids must come from the same chunking or
    # the RRF fusion silently joins misaligned chunks (ADVICE r12)
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        index_paths as _index_paths,
        read_meta as _read_meta,
    )

    (_rag_meta_path,) = _index_paths(rag_dir, "rag_meta")
    _rag_meta = _read_meta(spark, _rag_meta_path).asDict()
    write_bm25_index(
        chunk_documents(
            twin_corpus.filter(FF.col("doc_id") < 1_000_000),
            _rag_meta["chunk_tokens"],
            _rag_meta["overlap"],
        ).select(
            _encode_lineage().alias("doc_id"),
            FF.col("chunk_text").alias("text"),
        ),
        rag_dir.rstrip("/") + "/bm25",
        n_buckets=64,
    )
    # 100-query batch: the testdata vocabulary is ~50 words, so EVERY
    # term has df ≈ 20% of chunks and the lexical leg's candidate volume
    # (Σ_t df(t) per query) approaches all-pairs — a corpus pathology a
    # real vocabulary doesn't have (and max_df_ratio would rail against);
    # the bounded batch keeps the row measuring probe mechanics, not the
    # word-soup artifact
    rag_hq = rag_queries.filter(FF.col("doc_id") < 1_000_100)
    # max_df_ratio=None HERE ON PURPOSE: the r13 serving default (0.25)
    # would prune every term of this ~50-word synthetic vocabulary and
    # the row would time an empty lexical leg; the unrailed form keeps
    # measuring the probe mechanics the row exists for (the bounded
    # batch already contains the word-soup pathology — see BASELINE.md)
    time_probe(
        "rag_hybrid_probe",
        lambda: rag_retrieve_hybrid(
            rag_hq, rag_dir, k=3, leg_k=10, max_df_ratio=None
        ),
    )

    # r14: pipeline-append steady state — the cost a daily ingest pays
    # per shard (flags scan of the SHARD only + first-writer dedup join
    # + per-epoch pack + shard write; the base corpus is never re-read).
    # Base built once outside the timed loop; the probe replays the same
    # epoch, which is the idempotent-overwrite path a retried batch takes.
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        append_pipeline_shard,
        build_pipeline,
    )

    docs_all = _lt(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    pipe_dir = "/tmp/bdf_bench_pipeline"
    shutil.rmtree(pipe_dir, ignore_errors=True)
    cut = docs_all.agg(
        FF.expr("percentile_approx(doc_id, 0.9)").alias("c")
    ).first()["c"]
    build_pipeline(docs_all.filter(FF.col("doc_id") < cut), pipe_dir)
    pipe_shard = docs_all.filter(
        (FF.col("doc_id") >= cut) & (FF.col("source") != "src0")
    )
    time_probe(
        "pipeline_append_probe",
        lambda: append_pipeline_shard(pipe_shard, pipe_dir, "bench"),
    )

    # r15: EXACT incremental set-similarity probe — the shard tokenizes
    # itself, ranks under the FROZEN order, and PPJoin-probes the stored
    # token epochs (partition-pruned); base corpus never re-tokenized.
    # tau=0.8: the synthetic corpus's small vocabulary makes lower taus
    # emit O(corpus) true pairs, which would time the sink, not the probe
    from bayesiandatafusion_jl_spark.functions.setsim_index import (
        setsim_incremental,
        write_setsim_index,
    )

    ss_dir = "/tmp/bdf_bench_setsim_index"
    shutil.rmtree(ss_dir, ignore_errors=True)
    write_setsim_index(docs_all.filter(FF.col("doc_id") < cut), ss_dir)
    ss_shard = docs_all.filter(FF.col("doc_id") >= cut).select(
        "doc_id", "text"
    )
    time_probe(
        "setsim_index_probe",
        lambda: setsim_incremental(ss_shard, ss_dir, tau=0.8),
    )

    # r15: incremental MOSS span-overlap probe — the shard fingerprints
    # only itself; the stored (id, fp) scan is fp_bucket-pruned
    from bayesiandatafusion_jl_spark.functions.winnow_index import (
        winnow_overlap_incremental,
        write_winnow_index,
    )

    wn_dir = "/tmp/bdf_bench_winnow_index"
    shutil.rmtree(wn_dir, ignore_errors=True)
    write_winnow_index(docs_all.filter(FF.col("doc_id") < cut), wn_dir)
    time_probe(
        "winnow_index_probe",
        lambda: winnow_overlap_incremental(ss_shard, wn_dir, min_shared=2),
    )

    # ML sweep throughput: one BPMF Gibbs sweep (I3 kernel both entities +
    # moments + NW) on the events-derived matrix, K=16 (BASELINE.md (c))
    from pyspark.sql import functions as F  # noqa: E402

    from bayesiandatafusion_jl_spark.catalog import load_table  # noqa: E402
    from bayesiandatafusion_jl_spark.ml.bpmf import MacauTrainer  # noqa: E402
    from bayesiandatafusion_jl_spark.ml.relation import (  # noqa: E402
        Relation,
        RelationData,
        split_train_test,
    )

    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("user_id").alias("u"),
            F.crc32(F.col("event_type")).cast("long").alias("t"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t")
        .agg(F.avg("value").alias("value"))
    )
    cells = split_train_test(cells, ["u", "t"], test_frac=0.2, seed=11)

    def time_sweeps(label: str, rd: RelationData, num_latent: int) -> None:
        """One full Gibbs sweep per iteration (moments + NW + kernel per
        entity; probit relations additionally pay the truncated-normal
        augmentation refresh) — min/max like the headline queries."""
        tr = MacauTrainer(spark, rd, num_latent=num_latent, burnin=1, psamples=0, seed=7)
        tr._init()
        runs = []
        for it in range(iterations):
            t0 = time.time()
            tr._gibbs_sweep(it)
            runs.append(time.time() - t0)
        tr._release_working_caches()
        timings[label] = round(min(runs), 3)
        timings_max[label] = round(max(runs), 3)

    rd = RelationData().add_relation(Relation(cells, ["u", "t"], alpha=10.0))
    time_sweeps("bpmf_sweep", rd, num_latent=16)

    # arity-3 tensor sweep: (user × type × day-of-week) CP model — the
    # Hadamard sufficient-stat motion per mode
    cells3 = (
        ev.select(
            F.col("user_id").alias("u"),
            F.crc32(F.col("event_type")).cast("long").alias("t"),
            F.dayofweek("ts").cast("long").alias("d"),
            F.log1p("value").alias("value"),
        )
        .groupBy("u", "t", "d")
        .agg(F.avg("value").alias("value"))
    )
    cells3 = split_train_test(cells3, ["u", "t", "d"], test_frac=0.2, seed=11)
    rd3 = RelationData().add_relation(Relation(cells3, ["u", "t", "d"], alpha=10.0))
    time_sweeps("tensor_sweep", rd3, num_latent=8)

    # probit sweep: binary likelihood — adds the Albert–Chib z refresh
    # (Arrow truncnorm UDF) to every sweep
    cut = cells.agg(F.expr("percentile_approx(value, 0.5)").alias("c")).first()["c"]
    rdp = RelationData().add_relation(
        Relation(cells, ["u", "t"], class_cut=float(cut), probit=True)
    )
    time_sweeps("probit_sweep", rdp, num_latent=8)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "iterations": iterations,
                "queries_max": timings_max,
                "conf": {
                    "master": spark.sparkContext.master,
                    "shuffle_partitions": spark.conf.get(
                        "spark.sql.shuffle.partitions"
                    ),
                    "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
