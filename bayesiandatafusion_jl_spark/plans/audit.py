"""SCALE_AUDIT.md table generator.

The audit table is plan EVIDENCE, not prose: every row is counted from the
query's actual ``explain("formatted")`` output at the benchmark SF. This
script regenerates the table in place so the numbers can never drift from
the code (the pre-r6 table was produced by an ad-hoc session and then
hand-patched per change — this replaces that). Run from the repo root:

    python -m bayesiandatafusion_jl_spark.plans.audit [sf_dir]

Only the table block between the ``| query |`` header and the first
non-table line is replaced; the prose above/below survives. Per-query
analyst notes live in ``NOTES`` here, so they also survive regeneration.
"""

from __future__ import annotations

import re
import sys

from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

# Queries whose .fn() runs a training loop / eager metric computation —
# their "returned plan" is a driver-built summary frame, so a static plan
# audit is meaningless; the iterative harness is audited in prose above
# the table and in ml/bpmf.py's docstrings.
SKIP = {
    "q_ml_bpmf_events": "iterative (see ml/bpmf.py)",
    "q_ml_collective_events": "iterative (see ml/bpmf.py)",
    "q_ml_tensor_events": "iterative (see ml/bpmf.py)",
    "q_ml_factorization_suite": "iterative suite — trains 4 models (see ml/bpmf.py)",
    "q_ml_als_mllib": "iterative (MLlib ALS interop cross-check)",
    "q_ml_probit_events": "iterative (probit training on a planted matrix)",
    "q_llm_scale_suite": "eager quality-metric suite (5 pipelines + per-leg counts)",
    "q_table_compact": (
        "side-effecting maintenance op — fragments + rewrites files, returns"
        " a driver-built stats row (see operators/maintenance.py)"
    ),
    "q_index_compact": (
        "side-effecting maintenance op — folds index __epoch partitions"
        " via tmp-dir rewrite + FS swap, returns a driver-built stats"
        " frame (see functions/index_compact.py)"
    ),
    "q_llm_quality_model": (
        "eager MLlib LR training on the planted seed (iterative"
        " treeAggregate); the corpus sweep's shuffle-free scoring plan is"
        " asserted in tests/test_quality_model.py"
    ),
    "q_llm_pipeline_persisted": (
        "side-effecting persisted lifecycle — builds the restartable"
        " pipeline artifact (flags/packed/shards + manifest) under /tmp"
        " and returns the manifest readout; stage plans are the composed"
        " query's (audited as q_llm_pipeline_compose), resume/refusal"
        " pytest-gated (tests/test_pipeline.py)"
    ),
    "q_llm_pipeline_classified": (
        "r15: same side-effecting persisted lifecycle as"
        " q_llm_pipeline_persisted plus the train-if-absent quality"
        " model; the classifier verdict is scored MAP-ONLY onto the one"
        " flags scan (zero extra shuffles — plan asserted in"
        " tests/test_pipeline.py), manifest gains a classifier row"
    ),
}

NOTES = {
    "q_llm_planted_probe": (
        "r14: marker-query probe of the persisted planted-corpus BM25"
        " index (built once per fingerprint outside the returned plan) —"
        " partition-pruned posting read, df from the probed lists, rail"
        " exact on df=1 markers; oracle rebuilds the marked corpus in SQL"
    ),
    "q_text_shingle_sim_join": (
        "r14: exact char-6-shingle Jaccard join — same PPJoin"
        " prefix+positional candidate machinery as q_text_set_sim_join,"
        " elements are shingles; oracle brute all-pairs"
    ),
    "q_text_winnow": (
        "r14: MOSS winnowing fingerprints — one text scan, map-side"
        " k-gram hash explode, ONE doc-partitioned window (rightmost-min"
        " struct over w rows, no global sort), one distinct on the"
        " selections; oracle is the O(n·w) window join"
    ),
    "q_text_winnow_incremental": (
        "r15: incremental MOSS overlap — shard fingerprinted once"
        " (checkpointed: one scan + one doc window), stored (id, fp)"
        " scan partition-pruned to the shard's fp buckets, ONE"
        " fp-collision join covers cross + intra pairs, one pair-grain"
        " agg; base corpus never re-fingerprinted; oracle = full"
        " winnowing + all-pairs SQL restricted to shard-touching pairs"
    ),
    "q_text_winnow_stats": (
        "r15: winnow fp-skew health row — one fingerprint scan, one"
        " fp-grain df agg, one 1-row aggregate; skew as max·n_fps/"
        "n_entries (single fixed-order double division, oracle"
        " bit-parity); pair_rows = exact pair-join input size"
    ),
    "q_text_winnow_overlap_railed": (
        "r15: winnow overlap with the hot-fingerprint rail — fps shared"
        " by > max_df docs are anti-joined out BEFORE the pair join"
        " (boilerplate cut, bounds pair fan-out at max_df·df per fp);"
        " oracle mirrors the cap with a HAVING on fp df"
    ),
    "q_events_transitions": (
        "r13: Markov transition matrix — ONE events scan, ONE user-grain"
        " window (no global sort), one agg onto |types|²; the marginal is"
        " a window SUM over the matrix, so nothing re-reads the events"
    ),
    "q_multimodal_ingest": (
        "r13: file-grain media ingest — binaryFile source (recursive"
        " listing + glob pushdown, one row per file), per-kind codec"
        " dispatch in ONE mapInPandas, per-kind summary agg; 0 parquet"
        " scans by design (the source IS the file tree)"
    ),
    "q_text_kl_drift": (
        "r13: corpus KL drift — one token-count agg per snapshot, a"
        " vocab-grain outer join (checkpointed: it feeds the totals AND"
        " the term sum), 1-row totals broadcast, one final agg"
    ),
    "q_matview_topk": (
        "r13: incremental top-k — per split ONE window keeps k rows per"
        " key (|keys|·k state), merge explodes states and re-ranks; cost"
        " scales with |keys|·k·n_states, never the fact rows"
    ),
    "q_events_anomaly": (
        "r13: behavioral anomaly — the checkpointed pair stream feeds"
        " BOTH the |types|² matrix and the per-user scoring (events read"
        " once); matrix joins back broadcast; −ln p float32-collapsed,"
        " decimal-summed per user"
    ),
    "q_text_set_sim_join": (
        "r13: exact Jaccard>=tau join — PPJoin prefix filter (rarest"
        " tokens by global frequency), length filter, array_intersect"
        " verify; oracle is brute-force all-pairs, so parity proves the"
        " filter lossless"
    ),
    "q_stream_attribution": (
        "r7: stream-stream click→purchase range join, batch form —"
        " purchase side broadcast at this SF; at scale it degrades to a"
        " user_id-shuffled range join; streaming semantics"
        " (cross-micro-batch state, watermark-bounded buffers)"
        " pytest-gated"
    ),
    "q_llm_decontaminate": (
        "r7: GPT-3-style benchmark decontamination — tiny eval n-gram set"
        " broadcast, corpus grams stream map-side through the broadcast"
        " join; shuffles are the eval distinct + per-doc hit count only"
    ),
    "q_text_quality_filter": (
        "r7: composed Gopher-rule keep/drop cascade with"
        " first-failing-rule column — map-only, zero exchanges"
    ),
    "q_text_token_count": (
        "r7: map-only token counting (whitespace + GPT-2 pretokenizer"
        " regex), zero exchanges"
    ),
    "q_text_repetition": (
        "r7: tokens count as 1-grams, so all metrics come from ONE scan and"
        " one explode pass (n=1,2,3 gram stream); 3 partial-agg groupBys on"
        " shrinking keys ((doc,n,gram) → (doc,n) → doc), no join — linear"
        " motion; per-row O(len²) array_max alternative rejected"
    ),
    "q_llm_simhash": (
        "r7: posting-list pair expansion — 3 LINEAR shuffles (sig agg,"
        " (band,sub) buckets, pair distinct), no join; pairs stream from"
        " a two-level explode with O(bucket) per-row memory, so giant"
        " collision buckets cannot OOM a task. The r6 2-exchange count"
        " hid a corpus-derived BROADCAST join side and a duplicated"
        " signature subplan (4 scans → 2)"
    ),
    "q_graph_components": (
        "r6: single-shuffle posting-list pair build; CC rounds are 1 groupBy"
        " + 1 join each over localCheckpoint'ed edges; returned plan reads"
        " the converged star edges (0 scans)"
    ),
    "q_llm_dedup_clusters": "r6: same CC over the near-dup pair graph + keep/drop flag",
    "q_join_anti": (
        "r6: right side restricted to urgent orders (pushed to the scan) so"
        " the result is non-empty at every SF"
    ),
    "q_ml_auc": (
        "r6 demoted (slot → q_graph_components); same auc_components kernel"
        " as q_win_auc"
    ),
    "q_ml_coldstart": "anti-join side broadcast; dot is codegen'd fold",
    "q_sample_bernoulli": "r6: identity-hash Bernoulli — map-only, zero shuffle",
    "q_sample_stratified": (
        "r6: exact-N per stratum — one shuffle on the strata key, bounded"
        " per-stratum top-n"
    ),
    "q_llm_knn_ivf": (
        "r6: map-side argmax assignment vs literal k-means centers; probe"
        " side broadcast; quantizer fit cached per corpus"
    ),
    "q_llm_near_dedup_lsh": (
        "r6: both inputs executor-resident checkpoints (0 scans here);"
        " upstream passes: 1 shingle-sig shuffle + 1 bucket groupBy + 1"
        " candidate-pruned collect_set. r7: pair expansion streams from a"
        " two-level explode, O(bucket) per-row memory (giant-bucket OOM"
        " guard)"
    ),
    "q_join_salted": (
        "r7: pre-salted skew join — mid side replicated n_salt=4× by an"
        " in-task explode, fact rows routed by whole-row hash; one extra"
        " map-side projection vs the plain join, same shuffle count"
    ),
    "q_udaf_group_median": (
        "r6: GROUPED_AGG pandas UDF — no partial agg BY DESIGN (API-surface"
        " pin; built-in percentile is the data-scaled path)"
    ),
    "q_win_auc": (
        "single-job auc_components materializes its 1-row result eagerly"
        " (persist→collect→unpersist), so the returned plan is a local"
        " relation; the pass itself is 1 groupBy(score) + bounded windows"
    ),
    "q_cdc_merge": (
        "r7: changelog folded map-side by max_by (shuffles key"
        " cardinality, not the changelog), snapshot anti-joined on the"
        " touched keys + union — the snapshot is never windowed/sorted;"
        " AQE broadcasts the touched-keys side for small changelogs"
    ),
    "q_scd2_history": (
        "r7: two windows over ONE (key, seq, tiebreak) partitioning and"
        " ordering — single exchange, single sort, both frames in one"
        " physical pass; r8: second window tiebreak-ordered like the first"
    ),
    "q_text_pii_redact": (
        "r8: PII scrub (email/phone/IP regex families, Java≡RE2 dialect"
        " subset) — count + replace are codegen regexp expressions over one"
        " scan, zero exchanges; planted spans make the oracle non-vacuous"
    ),
    "q_text_unigram_nll": (
        "r11: corpus-self-trained unigram-LM quality score — ONE token"
        " pass (dsir pattern): tokenize+explode into a checkpointed"
        " (doc,token) count frame; vocab model, N=Σc (1-row broadcast, no"
        " count() action) and scoring all derive from it; the KB-sized"
        " top-V vocab is broadcast so scoring never reshuffles; NLL·c"
        " float32-absorbed exact-in-double, decimal-exact per-doc mean"
    ),
    "q_shuffle_shards": (
        "r8: epoch-deterministic corpus shuffle — seeded identity-hash pos"
        " + shard as map-only expressions, no sort-by-rand() total shuffle;"
        " write_shuffled_shards persists one pos-sorted file per shard"
    ),
    "q_llm_dsir_weights": (
        "r8: DSIR importance log-weights — ONE explode builds the hashed"
        " 1/2-gram stream (arrays concatenated pre-explode), one shuffle to"
        " (doc,bucket) counts which are checkpoint_df'd so the model branch"
        " and the scoring branch read one materialization — text tokenized"
        " exactly once, hence 0 parquet scans in this plan; the ≤4096-row"
        " bucket model + 1-row totals broadcast back; sha256-prefix buckets"
        " keep the whole method DuckDB-oracle-checkable"
    ),
    "q_llm_semdedup": (
        "r8: SemDeDup cluster-then-prune — driver-fit quantizer (bounded"
        " sample), map-side nearest-centroid assignment (zero shuffle),"
        " ONE exchange on cell_id into a memory-linear greedy pandas prune"
        " (never materializes the c-by-c similarity matrix);"
        " max_cluster_rows is enforced by a groupBy(cell_id).count()"
        " pre-pass BEFORE the pandas stage (r9: ADVICE fix — the former"
        " in-kernel check fired only after the group was already buffered),"
        " so oversized clusters fail while still a lazy plan; O(N^2)"
        " becomes sum over clusters of O(c^2)"
    ),
    "q_text_bigram_nll": (
        "r11: interpolated-bigram LM score — ONE corpus pass: unigram and"
        " bigram grams ride one tagged stream (NULL cur marks unigrams;"
        " bigrams a map-side zip of two array slices, no positional"
        " self-join) into a checkpointed (doc,prev,cur) count frame that"
        " feeds both top-K broadcast models, N (1-row broadcast, no"
        " count() action) and the count-weighted scoring"
    ),
    "q_fn_scalar_suite": (
        "r11: H1+H2+H3+H6 consolidated — three map-only legs (lineitem"
        " math / part string / orders date) unpivoted via the stack"
        " generator into one op-tagged long schema; key-modulus filters"
        " push to the scans; zero exchanges"
    ),
    "q_stream_windows": (
        "r11: J7+J8 consolidated — tumbling and sliding window aggs as"
        " op-tagged legs; one partial-agg shuffle per leg on (window,type)"
        " shrinking keys; UNION ALL is shuffle-free"
    ),
    "q_llm_remove_dup_spans_minlen": (
        "r11: span removal with the Lee-et-al. minimum-run guard — same"
        " linear profile shuffles; covered starts fold into maximal runs"
        " per doc (sorted-starts interval aggregate HOF, no extra"
        " exchange), only runs >= L excised"
    ),
    "q_text_bpe_token_count": (
        "r11: corpus-trained BPE (bounded identity-hash sample collected"
        " to the driver, quantizer-fit precedent) applied via an"
        " Arrow-batched pandas UDF with broadcast merge ranks + pretoken"
        " LRU — map-only, zero exchanges beyond the scan"
    ),
    "q_llm_pack_bpe": (
        "r11: pack_sequences driven by the BPE token counts — the same"
        " checkpointed two-phase prefix scan at tokenizer grain"
    ),
    "q_win_suite": (
        "r11: E3+E4+E5 op-tagged legs — each keeps its own single window"
        " shuffle (user / global-day-after-preagg / customer); UNION ALL"
        " shuffle-free"
    ),
    "q_join_semi_anti": (
        "r11: C5+C6 op-tagged legs — orders filters pushed below each"
        " semi/anti hash join; UNION ALL shuffle-free"
    ),
    "q_agg_rollup_cube": (
        "r11: D5+D6 op-tagged grouping-sets legs — keys shrink with the"
        " grouping, never grow with the data"
    ),
    "q_filter_suite": (
        "r12: A1+A2+B1+B2+B3 op-tagged legs (scan_project absorbed) —"
        " map-only filter+project, all predicates pushed to the scans,"
        " zero exchanges"
    ),
    "q_win_rank_topk_per_group": (
        "r12: E1+F1+F2 legs — the window leg keeps its single"
        " partitioning exchange; the global_topk leg is"
        " TakeOrderedAndProject (per-partition local top-k, k*P driver"
        " merge, no global sort materializes)"
    ),
    "q_profile_histograms": (
        "r12: bounds-from-data histograms — one min/max scan collects"
        " the per-column bounds (bounded 1-row collect), one counting"
        " scan explodes per-row (col,bucket) structs into a groupBy over"
        " the |cols|*n_buckets key grid (map-side partial agg); dense"
        " completion is a driver-built grid frame broadcast-joined"
    ),
    "q_join_inner_left": (
        "r11: C1+C4 op-tagged legs — one shuffle per join key; the left"
        " leg's groupBy reuses the join partitioning"
    ),
    "q_fn_events_suite": (
        "r11: H5+H7 share the events-by-type grain — both capability rows"
        " ride ONE partial-agg shuffle"
    ),
    "q_sample_mixture": (
        "r7: per-stratum mixture rates as a map-only identity-hash CASE"
        " filter — zero exchanges; rate-nested per stratum so re-weighting"
        " never churns kept rows"
    ),
    "q_llm_dup_spans": (
        "r7: Lee-et-al. grain cross-doc span profile — one explode pass"
        " over the shingle stream, 3 linear shuffles on shrinking keys"
        " (span → (doc,span) → doc), no self-join; hash-the-span variant"
        " documented for the 100 TB string-shuffle case"
    ),
    "q_profile_numeric": (
        "r11: one-scan numeric audit — all per-column metrics ride ONE"
        " wide aggregation (exact countDistinct via Expand: rows"
        " duplicated per column inside the exchange but the SCAN runs"
        " once), unpivoted with stack; swap approx_count_distinct at"
        " 100 TB if the HLL +-2% suffices"
    ),
    "q_agg_histogram": (
        "r11: equi-width histogram — map-side IEEE bucket arithmetic,"
        " ONE groupBy over exactly n_buckets keys, dense zero-filled"
        " completion via broadcast join against spark.range(n); nothing"
        " data-scaled but the single linear scan"
    ),
    "q_sample_weighted": (
        "r11: derandomized A-ES — map-side u^(1/w) key from the identity"
        " hash, global TakeOrdered(k) (never a full sort) or per-stratum"
        " window top-k; NULL/non-positive weights excluded"
    ),
    "q_llm_ann_index_pq": (
        "r11: persisted IVF-PQ — pq_code column in the SAME postings"
        " file; ADC probes project codes only, so parquet column pruning"
        " (plan-asserted: ReadSchema without embedding) gives the 32x"
        " I/O cut on top of cell_id partition pruning; embeddings read"
        " only for the |Q|*refine*k shortlist; appends encode under the"
        " META-pinned codebooks, refit retrains them with the centers"
    ),
    "q_llm_rag_pipeline": (
        "r12: now composes the PERSISTED index — rag_build_index (chunk"
        " -> hash-embed -> write_ivf_index, amortizable) then"
        " rag_retrieve_index (probe-only: codes-only partition-pruned ADC"
        " scan + shortlist refine, zero corpus re-read — plan-asserted in"
        " tests/test_rag.py); this self-contained driver form still pays"
        " the build per call, the steady-state probe is benched as"
        " rag_index_probe; planted-twin top-1 0.97 gated in tests"
    ),
    "q_llm_chunk_docs": (
        "r11: RAG chunking — ONE map-side expression chain (split,"
        " arithmetic chunk count, explode sequence, slice) in whole-stage"
        " codegen; zero exchanges plan-asserted; fan-out bounded at"
        " ceil(len/stride) rows/doc"
    ),
    "q_join_salted_heavy": (
        "r11: SELECTIVE salting — Misra-Gries detection bounds the heavy"
        " set (<=1/phi keys collected), only heavy fact keys hash-salt"
        " and only heavy mid rows replicate n_salt-fold; light mid rows"
        " single-copy, empty heavy set degrades to the plain join;"
        " result oracle-identical to the unsalted join"
    ),
    "q_join_bloom_pruned": (
        "r11: Bloom semi-join pushdown — dim keys hashed into a dense"
        " bitmap by groupBy(word).bit_or (two linear passes, output"
        " sized by the fpp budget), embedded as a LITERAL forall"
        " predicate on the fact scan (the scalar-subquery shape of"
        " Spark's injected runtime filter: no join, no per-row bitmap"
        " copy), so non-matching fact rows die map-side BEFORE the join"
        " exchange; result is exactly the plain join (FPs removed by"
        " the real join), plan-asserted join-and-exchange-free in"
        " tests/test_bloom.py; r12 adds size rails — broadcast-bitmap"
        " Arrow fallback above the literal threshold, hard cap with"
        " sizing math past 1 GiB"
    ),
    "q_llm_knn_ivfpq": (
        "r11: IVFADC — coarse cells prune candidates (map-side argmax,"
        " broadcast probe side, corpus never shuffles), residual PQ codes"
        " (ONE Arrow encode pass, checkpointed index of M smallints/row ="
        " 32x less memory than raw embeddings) score survivors via M"
        " element_at lookups in codegen; exact re-rank touches only"
        " |Q|*refine*k original vectors"
    ),
    "q_agg_cms": (
        "r11: count-min sketch = explode d seeded-xxhash64 cells +"
        " groupBy(r,c) — map-side partial agg caps per-task output at d*w"
        " cells, so data motion is the sketch size, not the stream;"
        " checkpointed sketch feeds both the broadcast estimate join and"
        " the N readout; validation top-20 groupBy is the measured-exact"
        " leg, not the sketch path"
    ),
    "q_agg_approx_quantile": (
        "r7: GK sketch (approx_percentile) vs full-buffer exact percentile"
        " with measured rel_err column — partial-agg sketch merge, one"
        " scalar exchange"
    ),
    "q_llm_remove_dup_spans": (
        "r8: cleaned-corpus emission over the span profile's dictionary —"
        " posexplode spans, 2 hash aggs for the dup dictionary, starts"
        " re-grouped per doc, ONE doc-keyed join back; the rewrite itself"
        " is a map-side transform/exists HOF expression"
    ),
    "q_text_setsim_incremental": (
        "r15: EXACT incremental PPJoin — shard tokenized+ranked once"
        " (checkpointed) under the FROZEN build-time frequency order;"
        " candidate scan partition-pruned to the shard's prefix-token"
        " buckets; ONE token-collision join covers cross + intra pairs;"
        " verify re-reads stored tokens for candidate ids only; oracle"
        " is brute-force all-pairs SQL restricted to shard-touching"
        " pairs"
    ),
    "q_llm_dedup_incremental": (
        "r8: new shard shingled/signed once (checkpointed), probe is one"
        " (band,bucket) equi-join against the range-sorted bucket parquet;"
        " old corpus text never re-read, old signatures never recomputed"
        " (plan-asserted in tests) — scoring is the MinHash component-match"
        " estimator, no old-side shingle sets"
    ),
    "q_llm_pipeline_compose": (
        "r8: train TEXT read once — quality metrics ride the 4-gram"
        " explode, eval grams broadcast in, one per-doc partial agg folds"
        " metrics+hit back to doc grain; flags checkpointed (doc-grain,"
        " tiny) so the stage aggregate and packing leg share one"
        " execution; stage counts are conditional aggregates"
    ),
    "q_agg_heavy_hitters": (
        "r8: two-pass Misra-Gries — candidate pass is map-only mapInPandas"
        " (k=501 counters/partition), verify pass semi-joins the broadcast"
        " candidate set so the count shuffle is bounded by k·P keys, never"
        " the vocabulary; output EXACTLY equals the full groupBy (oracle)"
    ),
    "q_llm_ann_index": (
        "r8: persisted IVF — postings parquet partitioned by cell_id;"
        " probe scan carries a STATIC cell_id IN(...) partition filter"
        " (plan-asserted: only probed cell directories are listed);"
        " probe side broadcast, corpus postings never shuffle;"
        " append mode assigns a new shard under stored centers, no refit"
    ),
    "q_llm_pack_chunks": (
        "r8: writer-grain chunks — map-side sequence-explode over the"
        " checkpointed pack_sequences placement; integer arithmetic only"
    ),
    "q_llm_pack_sequences": (
        "r8: two-phase distributed prefix scan — range shuffle executed"
        " ONCE (checkpoint_df pins the sampled partition boundaries for"
        " both the per-partition totals collect and the output plan), then"
        " per-partition windows + broadcast prefix-offset join; bin_id by"
        " integer div (exact past 2^53). Returned plan reads the"
        " checkpointed RDD, hence 0 parquet scans here"
    ),
}


def _n(plan: str, node: str) -> int:
    """Count a node's DETAIL-section headers ("(4) Exchange"): formatted
    explain renders every operator twice (once in the tree, once in the
    details), so a raw substring count overstates everything 2×."""
    return len(re.findall(rf"^\(\d+\) {node}", plan, re.M))


def audit_row(spark, name: str, fn, sf_dir: str) -> str:
    if name in SKIP:
        return f"| {name} | - | - | - | - | - | {SKIP[name]} |"
    df = fn(spark, sf_dir)
    plan = formatted_plan(df)
    # single-partition exchanges (Arguments: SinglePartition under an
    # Exchange block) are 1-row scalar motions, not data shuffles
    ex = _n(plan, "Exchange") - plan.count("Arguments: SinglePartition")
    bhj = _n(plan, "BroadcastHashJoin") + _n(plan, "BroadcastNestedLoopJoin")
    smj = _n(plan, "SortMergeJoin")
    # every Python-executing node class (pandas_udf scalar/agg, apply/map
    # InPandas, UDTF eval) carries Python/Pandas/Arrow in its node name
    arrow = _n(plan, r"\S*(?:Python|Pandas)\S*")
    scans = _n(plan, "Scan parquet")
    note = NOTES.get(name, "")
    return f"| {name} | {ex} | {bhj} | {smj} | {arrow} | {scans} | {note} |"


def audit_rows(spark, sf_dir: str, progress: bool = False) -> list[str]:
    """All audit-table rows (sorted by query name) for one session +
    SF — shared by the regenerating ``main()`` and the staleness-guard
    pytest (tests/test_scale_audit.py), so the guard counts plans with
    exactly the same code path that writes the committed artifact."""
    from bayesiandatafusion_jl_spark.registry import specs

    rows = []
    for name, spec in sorted(specs(include_demoted=True).items()):
        rows.append(audit_row(spark, name, spec.fn, sf_dir))
        if progress:
            print(rows[-1], flush=True)
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    # fail fast BEFORE the expensive Spark audit run: the rewrite below
    # needs the '| query |' header row to splice the table in place
    path = "SCALE_AUDIT.md"
    text = open(path).read()
    lines = text.splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    except StopIteration:
        sys.exit(
            f"{path} has no '| query |' table header — restore the table "
            "block (header + separator row) before running the audit"
        )
    # the splice below keeps lines[:start+2] (header + separator) — a
    # header without its |---| separator row would survive the header
    # check and then duplicate the following prose line into the table
    if start + 1 >= len(lines) or not lines[start + 1].startswith("|"):
        sys.exit(
            f"{path} table header has no '|---|' separator row beneath it — "
            "restore the separator before running the audit"
        )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("scale-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = audit_rows(spark, sf_dir, progress=True)
    spark.stop()

    # re-read just before splicing: the audit run takes minutes and edits
    # made to the file meanwhile must not be clobbered by the pre-run
    # snapshot (the read above exists only for the fail-fast checks)
    lines = open(path).read().splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    except StopIteration:
        sys.exit(
            f"{path} table header disappeared during the audit run — "
            "table not rewritten; audit rows were printed above"
        )
    end = start + 2
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    out = lines[: start + 2] + rows + lines[end:]
    open(path, "w").write("\n".join(out) + "\n")
    print(f"rewrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
