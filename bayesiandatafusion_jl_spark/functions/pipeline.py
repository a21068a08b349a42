"""End-to-end LLM training-data pipeline composition.

The r7 pieces exist as independent operators; a real pipeline chains them
on ONE pass budget: quality filter → benchmark decontamination → mixture
sampling → sequence packing. This module registers the composed query so
the chain's interplay is itself oracle-checked — per-stage document and
token counts, ending with the number of context windows the packed stream
occupies.

Scale shape: the train corpus's TEXT is read exactly ONCE — the per-doc
quality metrics ride along the 4-gram explode (map-side expressions on
the same projected row), the gram stream joins the broadcast eval-gram
set, and one per-doc partial aggregate folds both the metrics (``first``)
and the contamination hit (``max``) back to doc grain. Stage counts are
then conditional aggregates over that one flags frame. The naive
alternatives both lose at 100 TB: filter→count per stage re-executes the
pipeline per stage, and computing quality and contamination as separate
legs reads the text column twice. The eval side is a second, tiny read
(source-pruned). Packing then runs only over the final survivors, which
is where a pipeline would hand off to the training-data writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.packing import pack_sequences
from bayesiandatafusion_jl_spark.functions.text import (
    _LANG_MARKERS,
    _ngrams,
    _QF_MAX_DUP_FRAC,
    _QF_MAX_TOKENS,
    _QF_MIN_LANG_SCORE,
    _QF_MIN_TOKENS,
    _QF_REASON_SQL,
)
from bayesiandatafusion_jl_spark.operators.sampling import (
    _MIX_CASE,
    _MIX_DEFAULT,
    _MIX_RATES,
    _MOD,
    _bucket,
    _sql_bucket,
)
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import checkpoint_df

_CAPACITY = 256
_EVAL_SOURCE = "src0"
_DECON_N = 4


_DEDUP_PREFIX_TOKENS = 8


def _eval_grams(docs: DataFrame) -> DataFrame:
    """(g): the DISTINCT decontamination n-grams of the corpus's eval
    source — the benchmark set. The pipeline store persists this at
    build time so later shard appends decontaminate against the PINNED
    benchmark without re-reading the base corpus (and without a late
    shard silently redefining what 'contaminated' means)."""
    toks = docs.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("tk")
    )
    return (
        toks.filter(F.col("source") == _EVAL_SOURCE)
        .select(F.explode(_ngrams("tk", _DECON_N)).alias("g"))
        .distinct()
    )


def _pipeline_flags(
    docs: DataFrame,
    ev_grams: DataFrame | None = None,
    include_cfp: bool = False,
) -> DataFrame:
    """The ONE-text-scan doc-grain flags frame every stage derives from:
    (doc_id, n_tokens, keep_q, keep_mix, __fp, contam, keep_dd). Shared
    by the composed counts query (which checkpoints it) and the
    persisted pipeline store (which parquets it as the first stage
    artifact) — one implementation, two materialization policies.
    ``ev_grams`` (r14): an explicit benchmark n-gram frame (column
    ``g``) — shard appends pass the PERSISTED build-time set; None
    derives it from ``docs`` (the one-shot form). ``__keep_clf`` (r15):
    an optional precomputed trained-classifier verdict column rides the
    same scan (see the gate comment below). ``include_cfp`` (r16): add
    the per-document corpus-fingerprint hash as a ``__cfp`` column, so
    the pipeline store's fresh build recovers its snapshot pin from the
    written artifact instead of paying a separate full-corpus pass;
    the composed counts query keeps its unchanged plan (False)."""
    cfp_cols = []
    if include_cfp:
        from bayesiandatafusion_jl_spark.functions.pipeline_store import (
            _fp_hash,
        )

        cfp_cols = [_fp_hash().alias("__cfp")]
    toks = docs.select(
        "doc_id",
        "source",
        F.split(F.lower("text"), " ").alias("tk"),
        *cfp_cols,
        *(["__keep_clf"] if "__keep_clf" in docs.columns else []),
    )
    n_tok = F.size("tk")
    dup = F.lit(1.0) - F.size(F.array_distinct("tk")).cast("double") / n_tok
    en = list(_LANG_MARKERS["en"])
    en_score = (
        F.size(F.filter("tk", lambda t: t.isin(en))).cast("double") / n_tok
    )
    keep_q = ~(
        (n_tok < _QF_MIN_TOKENS)
        | (n_tok > _QF_MAX_TOKENS)
        | (dup > _QF_MAX_DUP_FRAC)
        | (en_score < _QF_MIN_LANG_SCORE)
    )

    ev = (
        _eval_grams(docs) if ev_grams is None else ev_grams.select("g")
    ).withColumn("__h", F.lit(1))

    thr: F.Column = F.lit(int(_MIX_DEFAULT * _MOD))
    for k in sorted(_MIX_RATES):
        thr = F.when(
            F.col("source") == k, F.lit(int(_MIX_RATES[k] * _MOD))
        ).otherwise(thr)
    keep_mix = _bucket(["doc_id"]) < thr

    fp = F.sha2(
        F.concat_ws(" ", F.slice("tk", 1, _DEDUP_PREFIX_TOKENS)), 256
    )
    # optional trained-classifier gate (r15): a caller that scored the
    # corpus map-only (pipeline_store wiring the persisted quality
    # model) passes the verdict as a __keep_clf column; without it the
    # gate is vacuously true and every count below is bit-identical to
    # the heuristic-only pipeline
    keep_clf = (
        F.coalesce(F.col("__keep_clf"), F.lit(False))
        if "__keep_clf" in docs.columns
        else F.lit(True)
    )
    exploded = toks.filter(F.col("source") != _EVAL_SOURCE).select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        keep_q.alias("keep_q"),
        keep_clf.alias("keep_clf"),
        keep_mix.alias("keep_mix"),
        fp.alias("__fp"),
        *(["__cfp"] if include_cfp else []),
        F.explode_outer(_ngrams("tk", _DECON_N)).alias("g"),
    )
    flags = (
        exploded.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("keep_q").alias("keep_q"),
            F.first("keep_clf").alias("keep_clf"),
            F.first("keep_mix").alias("keep_mix"),
            F.first("__fp").alias("__fp"),
            *(
                [F.first("__cfp").alias("__cfp")]
                if include_cfp
                else []
            ),
            F.coalesce(F.max("__h") == 1, F.lit(False)).alias("contam"),
        )
    )
    wd = W.partitionBy("__fp")
    # representative election over FULL-quality survivors (heuristic AND
    # classifier) — the r12 rule: a gate-failing representative must not
    # erase its whole duplicate family
    return flags.withColumn(
        "keep_dd",
        F.min(
            F.when(F.col("keep_q") & F.col("keep_clf"), F.col("doc_id"))
        ).over(wd)
        == F.col("doc_id"),
    )


def _with_clf_column(flags: DataFrame) -> DataFrame:
    """Legacy-artifact guard (r15): flags frames persisted before the
    classifier gate lack ``keep_clf``; the gate is vacuously true for
    them, keeping every count bit-identical. Null rows (an epoch
    written before the column existed, surfacing in a merged read) mean
    'never scored' — also vacuously true, never silently dropped."""
    if "keep_clf" not in flags.columns:
        return flags.withColumn("keep_clf", F.lit(True))
    return flags.withColumn(
        "keep_clf", F.coalesce(F.col("keep_clf"), F.lit(True))
    )


def _survive(stage: str) -> F.Column:
    """Cumulative survival predicate per stage over the flags frame.
    (A function, not a module dict: Column construction needs an active
    SparkContext in pyspark 4.)"""
    q = F.col("keep_q") & F.col("keep_clf")
    preds = {
        "quality": F.col("keep_q"),
        # heuristic + trained-classifier gate; keep_clf is vacuously
        # true when no model is wired, so every downstream count is
        # bit-identical to the heuristic-only pipeline (r15)
        "classifier": q,
        "dedup": q & F.col("keep_dd"),
        "decontaminated": q & F.col("keep_dd") & ~F.col("contam"),
        "mixture": q
        & F.col("keep_dd")
        & ~F.col("contam")
        & F.col("keep_mix"),
    }
    return preds[stage]


def _stage_count_rows(
    flags: DataFrame, include_classifier: bool = False
) -> DataFrame:
    """(stage, n_docs, n_tokens) for the flag-derived stages, from ONE
    aggregate over the doc-grain flags frame. ``include_classifier``
    (r15) adds the trained-gate row between quality and dedup — only the
    model-wired pipeline store asks for it; the composed counts query
    keeps its five-row shape."""

    flags = _with_clf_column(flags)

    def _cnt(pred):
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long")

    def _tok(pred):
        return F.sum(F.when(pred, F.col("n_tokens")).otherwise(0)).cast("long")

    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        F.sum("n_tokens").cast("long").alias("t0"),
        _cnt(_survive("quality")).alias("c1"),
        _tok(_survive("quality")).alias("t1"),
        _cnt(_survive("classifier")).alias("c1c"),
        _tok(_survive("classifier")).alias("t1c"),
        _cnt(_survive("dedup")).alias("c1d"),
        _tok(_survive("dedup")).alias("t1d"),
        _cnt(_survive("decontaminated")).alias("c2"),
        _tok(_survive("decontaminated")).alias("t2"),
        _cnt(_survive("mixture")).alias("c3"),
        _tok(_survive("mixture")).alias("t3"),
    )
    clf = ", 'classifier', c1c, t1c" if include_classifier else ""
    n = 6 if include_classifier else 5
    return agg.selectExpr(
        f"stack({n}, 'raw', c0, t0, 'quality', c1, t1{clf},"
        " 'dedup', c1d, t1d,"
        " 'decontaminated', c2, t2, 'mixture', c3, t3)"
        " AS (stage, n_docs, n_tokens)"
    )


def pipeline_stage_counts(
    docs: DataFrame, capacity: int = _CAPACITY
) -> DataFrame:
    """(stage, n_docs, n_tokens) per pipeline stage over a (doc_id,
    source, text) frame: raw → quality → dedup → decontaminated →
    mixture → packed (where n_docs is the count of distinct context
    windows in which a surviving document STARTS).

    The dedup stage (r11) is prefix-fingerprint exact dedup: documents
    sharing the sha256 of their first ``_DEDUP_PREFIX_TOKENS`` lowercased
    tokens keep only the lowest-doc_id QUALITY-SURVIVING representative
    (r12: electing over all docs let a quality-failing representative
    erase its whole duplicate family) — the cheap
    boilerplate/prefix-duplicate heuristic a pipeline runs before the
    expensive near-dup pass (full-content exact dedup is
    ``q_llm_exact_dedup``; MinHash near-dup its own operator family). The
    fingerprint rides the same one text scan as everything else; the
    keep flag costs ONE extra shuffle — over the doc-grain flags frame
    (fixed-width hash keys), never the text.

    ONE text read for the train side: quality metrics + mixture flag are
    map-side columns on the same row as the gram explode (explode_outer
    keeps sub-n-gram docs), the eval-gram set broadcasts into the
    stream, and one per-doc partial agg (first/max fold map-side)
    restores doc grain with the contamination hit attached; prefix-dedup
    elects the lowest-id QUALITY SURVIVOR per fingerprint (r12:
    electing over all docs let a quality-failing representative erase
    its whole duplicate family). See ``_pipeline_flags``.
    """
    # flags is doc-grain (no text — tiny vs the corpus) and feeds BOTH the
    # stage aggregate and the packing leg; materialize once so the
    # text-scan pipeline above runs a single time, not once per consumer
    flags = checkpoint_df(_pipeline_flags(docs))
    stages = _stage_count_rows(flags)
    survivors = flags.filter(_survive("mixture")).select("doc_id", "n_tokens")
    packed = (
        pack_sequences(survivors, ["doc_id"], "n_tokens", capacity)
        .agg(
            F.countDistinct("bin_id").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(F.lit("packed").alias("stage"), "n_docs", "n_tokens")
    )
    return stages.unionByName(packed)


@register(
    "q_llm_pipeline_compose",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, string_split(LOWER(text), ' ') AS tk
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             len(tk) AS n_tokens,
             1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
               AS dup_frac,
             CAST(len(list_filter(tk,
                  t -> t IN ('the','of','and','fast','slow','table','key')))
                  AS DOUBLE) / len(tk) AS en_score,
             sha256(array_to_string(tk[1:{_DEDUP_PREFIX_TOKENS}], ' ')) AS fp
      FROM base WHERE source <> '{_EVAL_SOURCE}'
    ),
    g AS (
      SELECT doc_id, source,
             UNNEST(list_transform(range(1, len(tk) - {_DECON_N - 2}),
                    i -> array_to_string(tk[i:i+{_DECON_N - 1}], ' '))) AS g
      FROM base
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE source = '{_EVAL_SOURCE}'),
    contam AS (
      SELECT DISTINCT t.doc_id FROM g t JOIN ev USING (g)
      WHERE t.source <> '{_EVAL_SOURCE}'
    ),
    flags AS (
      SELECT m.doc_id, m.n_tokens,
             ({_QF_REASON_SQL}) IS NULL AS keep_q,
             (MIN(CASE WHEN ({_QF_REASON_SQL}) IS NULL THEN m.doc_id END)
                OVER (PARTITION BY m.fp) = m.doc_id) AS keep_dd,
             (c.doc_id IS NOT NULL) AS contam,
             ({_sql_bucket(['doc_id'])} <
              CASE {_MIX_CASE} ELSE {int(_MIX_DEFAULT * _MOD)} END)
               AS keep_mix
      FROM m LEFT JOIN contam c USING (doc_id)
    )
    SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM flags
    UNION ALL
    SELECT 'quality', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM flags WHERE keep_q
    UNION ALL
    SELECT 'dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM flags
    WHERE keep_q AND keep_dd
    UNION ALL
    SELECT 'decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM flags
    WHERE keep_q AND keep_dd AND NOT contam
    UNION ALL
    SELECT 'mixture', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM flags
    WHERE keep_q AND keep_dd AND NOT contam AND keep_mix
    UNION ALL
    SELECT 'packed', CAST(COUNT(DISTINCT p // {_CAPACITY}) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM (
      SELECT n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
      FROM (
        SELECT doc_id, n_tokens, {_sql_bucket(['doc_id'])} AS ord
        FROM flags WHERE keep_q AND keep_dd AND NOT contam AND keep_mix
      )
    )
    """,
    tags=("text-quality", "sampling", "packing", "pipeline"),
)
def q_llm_pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-data pipeline (quality → prefix-dedup →
    decontaminate → mixture → pack) as per-stage (n_docs, n_tokens)
    counts — proves the r7/r8/r11 pieces chain on one pass budget; the
    oracle re-derives every stage in SQL including the packed-window
    count. The dedup stage is non-vacuous on this corpus (22 prefix
    collisions at sf0.01)."""
    return pipeline_stage_counts(load_table(spark, sf_dir, "documents"))
