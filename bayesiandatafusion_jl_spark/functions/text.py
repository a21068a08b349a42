"""Text analysis (SURVEY §2 J5, J6 + north-star text ops).

Tokenization, term stats, TF-IDF, language-ID heuristic, quality scoring,
token counting, document fingerprinting — all over ``documents``. Every hot
path is built-in functions (split/explode/regexp) — the only shuffles are
the groupBys on (term) / (doc), which is the minimal motion for DF/TF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

# Tiny per-language marker lists for the n-gram/stopword heuristic. The
# testdata text is an analytics word soup, so this exercises the plumbing;
# real corpora would swap in proper stopword tables (broadcast join —
# the plan shape is what matters).
_LANG_MARKERS = {
    "en": ("the", "of", "and", "fast", "slow", "table", "key"),
    "es": ("el", "de", "la", "rapido"),
    "de": ("der", "die", "und"),
    "fr": ("le", "de", "et"),
    "zh": ("de", "shi"),
}


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Split into lowercase whitespace tokens, one row per token."""
    return df.withColumn(
        "token", F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
    ).filter(F.col("token") != "")


@register(
    "q_llm_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (
      SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents
    ) t
    WHERE token <> ''
    GROUP BY token
    """,
    tags=("J5",),
    demoted=True,
)
def q_llm_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — corpus term stats: term frequency + document frequency."""
    docs = load_table(spark, sf_dir, "documents")
    return tokens(docs).groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )


@register(
    "q_llm_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents WHERE doc_id < 50
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok WHERE token <> '' GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < 50)
    SELECT tf.doc_id, tf.token,
           CAST(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS REAL) AS tfidf
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    """,
    tags=("J5", "J6"),
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+J6 — TF-IDF per (doc, term) on a bounded doc subset; the tf/df
    term-statistics aggregates (J5, corpus-wide form demoted as
    q_llm_wordcount) are the two inner aggregations here.

    df is a tiny aggregate → broadcast back against tf; n_docs is a scalar
    cross join (1 row). At corpus scale the same plan holds: the df table
    is |vocab|-sized, still broadcastable.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = tokens(docs).select("doc_id", "token")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")))
            .cast("float")
            .alias("tfidf"),
        )
    )


@register(
    "q_text_analysis",
    oracle="""
    SELECT doc_id, lang, source,
           LENGTH(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens,
           LENGTH(REPLACE(text, ' ', '')) AS n_nonspace,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           CAST(len(list_filter(string_split(LOWER(text), ' '),
                t -> t IN ('the','of','and','fast','slow','table','key'))) AS BIGINT)
             AS en_hits,
           ROUND(CAST(len(list_filter(string_split(LOWER(text), ' '),
                t -> t IN ('the','of','and','fast','slow','table','key'))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS en_score,
           sha256(array_to_string(list_sort(list_distinct(string_split(LOWER(text), ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
    tags=("text-quality", "text-langid", "text-fingerprint"),
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis in ONE pass, no explode/shuffle at all:

    - quality-scoring features: char/token counts, average token length
      (the length/punct/stopword-ratio family);
    - language-ID heuristic: marker-token hit-rate (``en_hits`` /
      ``en_score``; per-language scores are the same expressions per
      language, here the English marker set);
    - order-insensitive content fingerprint: sha256 of the sorted
      distinct token set (the rolling-hash family's canonical-form
      variant — exactly reproducible in any engine).

    Everything is array built-ins over split() — a narrow map-only plan
    that scales embarrassingly: at 100 TB this reads text once and writes
    one row per doc, zero exchanges. (Single-facet variants q_text_stats /
    q_text_langid / q_text_fingerprint are demoted to the local gate.)"""
    docs = load_table(spark, sf_dir, "documents")
    en = list(_LANG_MARKERS["en"])
    n_tok = F.size(F.split(F.col("text"), " "))
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    en_hits = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t.isin(en))
    ).cast("bigint")
    canon = F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " ")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        n_nonspace.alias("n_nonspace"),
        F.round(n_nonspace.cast("double") / n_tok, 4).alias("avg_token_len"),
        en_hits.alias("en_hits"),
        F.round(en_hits.cast("double") / n_tok, 4).alias("en_score"),
        F.sha2(canon, 256).alias("fingerprint"),
    )


@register(
    "q_text_stats",
    oracle="""
    SELECT doc_id, lang, source,
           LENGTH(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens,
           LENGTH(REPLACE(text, ' ', '')) AS n_nonspace,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
    tags=("text-quality",),
    demoted=True,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring features: char/token counts, average token length
    (the length/punct/stopword-ratio family — punct ratio is 0 on this
    corpus by construction, so the informative stats are kept)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        n_nonspace.alias("n_nonspace"),
        F.round(n_nonspace.cast("double") / n_tok, 4).alias("avg_token_len"),
    )


@register(
    "q_text_langid",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(SUM(CASE WHEN token IN ('the','of','and','fast','slow','table','key')
                    THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
           COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CASE WHEN token IN ('the','of','and','fast','slow','table','key')
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS en_score
    FROM tok
    GROUP BY doc_id, lang
    """,
    tags=("text-langid",),
    demoted=True,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token hit-rate per doc (the stopword
    n-gram heuristic; per-language scores are the same plan per language)."""
    docs = load_table(spark, sf_dir, "documents")
    en = list(_LANG_MARKERS["en"])
    hit = F.when(F.col("token").isin(en), 1).otherwise(0)
    return tokens(docs).groupBy("doc_id", "lang").agg(
        F.sum(hit).alias("en_hits"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 4).alias("en_score"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(array_to_string(list_sort(list_distinct(string_split(LOWER(text), ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
    tags=("text-fingerprint",),
    demoted=True,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: order-insensitive content hash — sha256 of the
    sorted distinct token set. Robust to token reordering (the rolling-hash
    family's canonical-form variant, chosen because it is exactly
    reproducible in any engine)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " ")
    return docs.select("doc_id", F.sha2(canon, 256).alias("fingerprint"))


def _ngrams(arr_col: str, n: int) -> "F.Column":
    """Sliding-window word ``n``-grams of a token-array column as one
    map-side array expression (space-joined); empty array below ``n``
    tokens. The single place the off-by-one-prone sequence/slice bounds
    live — q_text_repetition and q_llm_decontaminate both build on it."""
    if n == 1:
        return F.col(arr_col)
    return F.when(
        F.size(arr_col) >= n,
        F.expr(
            f"transform(sequence(0, size({arr_col})-{n}),"
            f" i -> concat_ws(' ', slice({arr_col}, i+1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "q_text_repetition",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id, 1 AS ln, UNNEST(tk) AS g FROM tok
      UNION ALL
      SELECT doc_id, 2 AS ln,
             UNNEST(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i+1])) AS g
      FROM tok
      UNION ALL
      SELECT doc_id, 3 AS ln,
             UNNEST(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      FROM tok
    ),
    gc AS (SELECT doc_id, ln, g, COUNT(*) AS c FROM grams GROUP BY doc_id, ln, g),
    top AS (SELECT doc_id, ln, MAX(c) AS top_n, SUM(c) AS tot,
                   COUNT(*) AS n_grams
            FROM gc GROUP BY doc_id, ln)
    SELECT t1.doc_id,
           CAST(t1.tot AS BIGINT) AS n_tokens,
           CAST(t1.n_grams AS BIGINT) AS n_distinct,
           ROUND(1.0 - CAST(t1.n_grams AS DOUBLE) / t1.tot, 4)
             AS dup_token_frac,
           CAST(t2.top_n AS BIGINT) AS top_2gram_n,
           ROUND(CAST(t2.top_n AS DOUBLE) / t2.tot, 4) AS top_2gram_frac,
           CAST(t3.top_n AS BIGINT) AS top_3gram_n,
           ROUND(CAST(t3.top_n AS DOUBLE) / t3.tot, 4) AS top_3gram_frac
    FROM top t1
    LEFT JOIN top t2 ON t1.doc_id = t2.doc_id AND t2.ln = 2
    LEFT JOIN top t3 ON t1.doc_id = t3.doc_id AND t3.ln = 3
    WHERE t1.ln = 1
    """,
    tags=("text-quality",),
    demoted=True,
)
def q_text_repetition(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Within-document repetition metrics — the pretraining-data quality
    filters of Rae et al. (Gopher, 2021) §A1.1: repeated-token fraction
    and most-frequent-n-gram fraction (n = 2, 3). Docs dominated by one
    n-gram or by token repeats are boilerplate/spam candidates.

    Shape: tokens count as 1-grams, so ALL metrics come from one explode
    pass over ONE scan of the text column: a map-side transform emits the
    (n, gram) stream for n = 1, 2, 3; one partial-agg groupBy counts
    (doc, n, gram); one per-(doc, n) reduction yields top/total/distinct;
    one final per-doc pivot — linear motion, no self-join, no second scan
    (the 100 TB text read is the dominant cost, so it happens once). The
    per-row O(len²) array_max alternative was rejected. Line-level
    duplicate metrics are omitted deliberately: the corpus contract has no
    newlines (single-line docs make them vacuous)."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.lower("text"), " ").alias("tk"))
    g2 = _ngrams("tk", 2)
    g3 = _ngrams("tk", 3)

    def tag(arr, n):
        return F.transform(arr, lambda g: F.struct(F.lit(n).alias("ln"), g.alias("g")))

    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(tag(F.col("tk"), 1), tag(g2, 2), tag(g3, 3))
        ).alias("t"),
    ).select("doc_id", "t.ln", "t.g")
    gc = grams.groupBy("doc_id", "ln", "g").agg(F.count(F.lit(1)).alias("c"))
    top = gc.groupBy("doc_id", "ln").agg(
        F.max("c").alias("top_n"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    wide = top.groupBy("doc_id").agg(
        F.max(F.when(F.col("ln") == 1, F.col("tot"))).alias("n_tokens"),
        F.max(F.when(F.col("ln") == 1, F.col("n_grams"))).alias("n_distinct"),
        F.max(F.when(F.col("ln") == 2, F.col("top_n"))).alias("top_2gram_n"),
        F.max(F.when(F.col("ln") == 2, F.col("tot"))).alias("n_2grams"),
        F.max(F.when(F.col("ln") == 3, F.col("top_n"))).alias("top_3gram_n"),
        F.max(F.when(F.col("ln") == 3, F.col("tot"))).alias("n_3grams"),
    )
    return wide.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens"), 4
        ).alias("dup_token_frac"),
        F.col("top_2gram_n").cast("bigint").alias("top_2gram_n"),
        F.round(F.col("top_2gram_n").cast("double") / F.col("n_2grams"), 4).alias(
            "top_2gram_frac"
        ),
        F.col("top_3gram_n").cast("bigint").alias("top_3gram_n"),
        F.round(F.col("top_3gram_n").cast("double") / F.col("n_3grams"), 4).alias(
            "top_3gram_frac"
        ),
    )


# GPT-2-style pretokenizer (contractions | space-prefixed letter runs |
# digit runs | punctuation runs) restricted to the regex subset RE2 and
# Java regex implement identically, so the count is engine-reproducible.
# A real BPE would merge within these pretokens; the PRETOKEN count is the
# standard fast token-budget estimator (merges only split within them).
_BPE_PRETOKEN_RE = r"'(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9']+"


@register(
    "q_text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           CAST(len(regexp_extract_all(LOWER(text),
                '{_BPE_PRETOKEN_RE.replace("'", "''")}')) AS BIGINT)
             AS n_pretokens,
           LENGTH(text) AS n_chars,
           ROUND(CAST(LENGTH(text) AS DOUBLE)
                 / len(regexp_extract_all(LOWER(text),
                       '{_BPE_PRETOKEN_RE.replace("'", "''")}')), 4)
             AS chars_per_pretoken
    FROM documents
    """,
    tags=("text-tokens",),
    demoted=True,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (the LLM budget estimators): whitespace
    tokens and BPE-style PREtokens (GPT-2 pretokenizer regex — see
    ``_BPE_PRETOKEN_RE``), plus chars-per-pretoken. One map-only pass,
    zero exchanges: at 100 TB this is a single read of the text column
    with both counts computed inside whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    n_pre = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PRETOKEN_RE), F.lit(0))
    )
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        n_pre.cast("bigint").alias("n_pretokens"),
        F.length("text").alias("n_chars"),
        F.round(F.length("text").cast("double") / n_pre, 4).alias(
            "chars_per_pretoken"
        ),
    )


# Default quality-filter thresholds — the ONE place they live: both the
# Python defaults and the registered oracle SQL below interpolate these,
# so the two cannot drift. The registered oracle is equivalent to the
# DEFAULT parameterization only; callers overriding thresholds get a
# frame the stored SQL no longer describes (same for every parameterized
# query in the registry — the oracle pins the spec's driver-run form).
_QF_MIN_TOKENS = 20
_QF_MAX_TOKENS = 95
_QF_MAX_DUP_FRAC = 0.6
_QF_MIN_LANG_SCORE = 0.12

_QF_REASON_SQL = f"""CASE WHEN n_tokens < {_QF_MIN_TOKENS} THEN 'too_short'
                WHEN n_tokens > {_QF_MAX_TOKENS} THEN 'too_long'
                WHEN dup_frac > {_QF_MAX_DUP_FRAC} THEN 'repetitive'
                WHEN en_score < {_QF_MIN_LANG_SCORE} THEN 'lang'
           END"""


@register(
    "q_text_quality_filter",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(tk) AS n_tokens,
             1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS dup_frac,
             CAST(len(list_filter(tk,
                  t -> t IN ('the','of','and','fast','slow','table','key')))
                  AS DOUBLE) / len(tk) AS en_score
      FROM (SELECT doc_id, string_split(LOWER(text), ' ') AS tk FROM documents)
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(dup_frac, 4) AS dup_token_frac,
           ROUND(en_score, 4) AS en_score,
           {_QF_REASON_SQL} AS reject_reason,
           ({_QF_REASON_SQL}) IS NULL AS keep
    FROM m
    """,
    tags=("text-quality",),
)
def q_text_quality_filter(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = _QF_MIN_TOKENS,
    max_tokens: int = _QF_MAX_TOKENS,
    max_dup_frac: float = _QF_MAX_DUP_FRAC,
    min_lang_score: float = _QF_MIN_LANG_SCORE,
) -> DataFrame:
    """Composed document-quality filter — the per-document keep/drop
    decision a pretraining pipeline runs over every shard (Gopher-style
    rule cascade: length band, repeated-token fraction, language score).
    Emits the decision AND the first failing rule (``reject_reason``) so
    rejection-rate dashboards need no second pass.

    Thresholds compare UNROUNDED doubles (bit-identical across engines
    since all inputs are integer counts); the surfaced fractions are
    rounded for display only. One map-only pass over one scan, zero
    exchanges — the filter adds nothing to the 100 TB read cost."""
    docs = load_table(spark, sf_dir, "documents")
    en = list(_LANG_MARKERS["en"])
    tk = F.split(F.lower("text"), " ")
    n_tok = F.size(tk)
    dup = F.lit(1.0) - F.size(F.array_distinct(tk)).cast("double") / n_tok
    en_score = F.size(F.filter(tk, lambda t: t.isin(en))).cast("double") / n_tok
    reason = (
        F.when(n_tok < min_tokens, "too_short")
        .when(n_tok > max_tokens, "too_long")
        .when(dup > max_dup_frac, "repetitive")
        .when(en_score < min_lang_score, "lang")
    )
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(dup, 4).alias("dup_token_frac"),
        F.round(en_score, 4).alias("en_score"),
        reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


@register(
    "q_llm_decontaminate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, string_split(LOWER(text), ' ') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             UNNEST(list_transform(range(1, len(tk) - 2),
                    i -> array_to_string(tk[i:i+3], ' '))) AS g
      FROM tok
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE source = 'src0'),
    hits AS (
      SELECT t.doc_id, COUNT(DISTINCT t.g) AS n_hit_grams
      FROM g t JOIN ev ON t.g = ev.g
      WHERE t.source <> 'src0'
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
           COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    tags=("text-quality", "J2"),
)
def q_llm_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = 4,
    eval_source: str = "src0",
) -> DataFrame:
    """Benchmark decontamination — flag every training document sharing an
    ``n``-gram with the held-out evaluation set (the GPT-3 appendix-C /
    PaLM procedure; n = 13 on real corpora, 4 here so the word-soup corpus
    actually collides). Output: one row per train doc with the count of
    distinct leaked n-grams and the contaminated flag.

    Scale shape: the eval side of any decontamination run is tiny
    (benchmarks are KB–MB against a 100 TB corpus), so its distinct n-gram
    set BROADCASTS; the TEXT column is read once (the gram leg), its
    n-grams stream map-side through the broadcast hash join, and the only
    data shuffle is the per-doc partial-agg count of matched grams. The
    left-join spine re-scans only the pruned (doc_id, source) columns —
    3 scans in the audit row, but one text read. Never collected, never
    self-joined. The registered oracle pins the DEFAULT parameterization
    (n=4, src0); overriding n/eval_source yields a frame the stored SQL
    does not describe."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("tk")
    )

    def grams(df: DataFrame) -> DataFrame:
        return df.select("doc_id", F.explode(_ngrams("tk", n)).alias("g"))

    ev = grams(toks.filter(F.col("source") == eval_source)).select("g").distinct()
    train = toks.filter(F.col("source") != eval_source)
    hits = (
        grams(train)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_hit_grams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint").alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_spans: bool = False,
) -> DataFrame:
    """Cross-document duplicated-span profile (the word-n-gram-grain
    variant of Lee et al. 2022's "Deduplicating Training Data Makes
    Language Models Better" substring dedup): per document, how many of
    its distinct n-gram spans also occur in at least one OTHER document.

    Output: (id_col, n_spans, n_shared_spans, shared_frac); documents
    shorter than ``n`` tokens have no spans and no row.

    Scale shape — three LINEAR shuffles, no self-join, nothing collected:

    1. distinct (doc, span) pairs (explode is map-side; the distinct is
       a hash aggregate with map-side combine);
    2. span → doc-count (hash aggregate on the span key) filtered to
       count ≥ 2 — the duplicated-span dictionary;
    3. pairs left-semi-ish joined against the dictionary and re-grouped
       by doc for the per-doc counts.

    At 100 TB the span STRING never needs to shuffle twice:
    ``hash_spans=True`` swaps the raw span for xxhash64(span) right after
    the explode, so every shuffle carries a fixed-width int64 instead of
    an n-token string — collisions only over-count shared spans by
    ~N²/2⁶⁴ (equivalence vs the string path is pytest-pinned on the
    planted corpus). The oracle-checked query uses the string path so
    DuckDB reproduces it bit-exactly.
    """
    toks = docs.select(id_col, F.split(F.lower(text_col), " ").alias("tk"))
    g = F.explode(_ngrams("tk", n)).alias("g")
    spans = toks.select(id_col, g)
    if hash_spans:
        spans = spans.select(id_col, F.xxhash64("g").alias("g"))
    spans = spans.distinct()
    dup = (
        spans.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("g")
    )
    joined = spans.join(dup.withColumn("__dup", F.lit(1)), "g", "left")
    shared = F.sum(F.when(F.col("__dup").isNotNull(), 1).otherwise(0))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        shared.cast("bigint").alias("n_shared_spans"),
        F.round(shared.cast("double") / F.count(F.lit(1)), 4).alias("shared_frac"),
    )


@register(
    "q_llm_dup_spans",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS tk FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+2], ' '))) AS g
      FROM tok
    ),
    dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) >= 2)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_shared_spans,
           ROUND(SUM(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS shared_frac
    FROM g LEFT JOIN dup ON g.g = dup.g
    GROUP BY g.doc_id
    """,
    tags=("J2", "text-quality"),
    demoted=True,
)
def q_llm_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span profile over 3-gram spans (see
    ``duplicated_spans``). Demoted: the driver surface is capped at 50;
    locally oracle-parity-checked like every demoted spec."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, n=3)


def remove_duplicated_spans(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_spans: bool = False,
    min_span_tokens: int = 0,
) -> DataFrame:
    """Rewrite each document with cross-document duplicated spans EXCISED —
    the output side of Lee et al. 2022's substring dedup (word-n-gram
    grain): ``duplicated_spans`` profiles the duplication, this emits the
    cleaned corpus a training pipeline actually feeds downstream.

    A token is covered iff it sits inside at least one n-gram span that
    occurs in ``min_docs`` or more DISTINCT documents. Covered positions
    are merged into maximal contiguous runs, and a run is removed only
    when it is at least ``min_span_tokens`` tokens long — Lee et al.
    excise only duplicated runs of ~50+ tokens, because short n-gram
    matches ("in the end", "new york times") are ordinary language, and
    removing every one of them shreds normal text. ``min_span_tokens=0``
    (or any value ≤ n, the minimum possible run) removes every covered
    token — the pre-guard behavior. Matching is over the lowercased token
    stream (same normalization as the profiler), and the cleaned text is
    rebuilt from that stream.

    Output: (id_col, text_cleaned, n_tokens, n_removed) — one row per
    input document, including fully-clean and fully-excised ones.

    Scale shape — linear shuffles only, no self-join, nothing collected:

    1. positional spans (posexplode — map-side);
    2. duplicated-span dictionary: distinct (doc, span) → span doc-count
       ≥ min_docs (two hash aggregates with map-side combine);
    3. span starts joined against the dictionary, re-grouped per doc into
       a covered-starts set (bounded by the doc's own span count);
    4. one doc-keyed join back onto the token arrays; the rebuild itself
       is a map-side higher-order-function expression (transform/exists),
       O(tokens × covered_starts) per doc — bounded by doc length squared
       in the worst (fully duplicated) case, which is the per-doc grain
       Lee et al. accept.

    As with the profiler, at 100 TB the span string shuffles once: swap
    the raw span for xxhash64(span) after step 1 and carry the hash.
    """
    toks = docs.select(id_col, F.split(F.lower(text_col), " ").alias("tk"))
    pos_spans = toks.select(
        id_col, F.posexplode(_ngrams("tk", n)).alias("p", "g")
    )
    if hash_spans:
        # 100 TB path: shuffles carry a fixed-width int64, never the span
        # string (same collision bound as duplicated_spans)
        pos_spans = pos_spans.select(id_col, "p", F.xxhash64("g").alias("g"))
    dup = (
        pos_spans.select(id_col, "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("g")
    )
    starts = (
        pos_spans.join(dup, "g")
        .groupBy(id_col)
        .agg(F.collect_set("p").alias("__starts"))
    )
    # materialize the kept-token array ONCE (HOF expressions don't get
    # codegen subexpression elimination, and the exists-scan is the
    # acknowledged O(tokens × covered_starts) worst case — paying it twice
    # per doc for text_cleaned AND n_removed would double the rebuild)
    joined = toks.join(starts, id_col, "left").withColumn(
        "__s", F.coalesce("__starts", F.array().cast("array<int>"))
    )
    if min_span_tokens > n:
        # run-merge path: fold the SORTED starts into maximal covered
        # intervals (s' <= b+1 ⇒ its coverage touches the previous run),
        # keep only runs >= min_span_tokens long, then test tokens against
        # the surviving runs. All per-doc HOF expressions — the merge is
        # O(covered_starts) and adds no shuffle.
        runs = (
            f"filter(aggregate(array_sort(__s),"
            f" cast(array() as array<struct<a:int,b:int>>),"
            f" (acc, s) -> CASE"
            f"   WHEN size(acc) > 0 AND s <= element_at(acc, -1).b + 1"
            f"   THEN concat(slice(acc, 1, size(acc) - 1),"
            f"        array(struct(element_at(acc, -1).a AS a,"
            f"        greatest(element_at(acc, -1).b, s + {int(n)} - 1) AS b)))"
            f"   ELSE concat(acc, array(struct(s AS a, s + {int(n)} - 1 AS b)))"
            f" END),"
            f" r -> r.b - r.a + 1 >= {int(min_span_tokens)})"
        )
        kept = (
            "filter(transform(tk, (t, i) -> struct(t AS t, i AS i)),"
            " x -> NOT exists(__runs, r -> r.a <= x.i AND x.i <= r.b))"
        )
        joined = joined.withColumn("__runs", F.expr(runs))
    else:
        kept = (
            f"filter(transform(tk, (t, i) -> struct(t AS t, i AS i)),"
            f" x -> NOT exists(__s, s -> s <= x.i AND x.i < s + {int(n)}))"
        )
    return (
        joined.withColumn("__kept", F.expr(kept))
        .select(
            id_col,
            F.expr("concat_ws(' ', transform(__kept, x -> x.t))").alias(
                "text_cleaned"
            ),
            F.size("tk").cast("bigint").alias("n_tokens"),
            (F.size("tk") - F.size("__kept")).cast("bigint").alias("n_removed"),
        )
    )


@register(
    "q_llm_remove_dup_spans",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS tk FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(range(1, len(tk) - 1)) AS p,
             UNNEST(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+2], ' '))) AS g
      FROM tok
    ),
    dup AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM g)
      GROUP BY g HAVING COUNT(*) >= 2
    ),
    covered AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (g)),
    tokpos AS (
      SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS j, UNNEST(tk) AS t
      FROM tok
    ),
    removed AS (
      SELECT DISTINCT tp.doc_id, tp.j
      FROM tokpos tp JOIN covered c
        ON tp.doc_id = c.doc_id AND tp.j BETWEEN c.p AND c.p + 2
    )
    SELECT tp.doc_id,
           COALESCE(string_agg(CASE WHEN r.j IS NULL THEN tp.t END,
                               ' ' ORDER BY tp.j), '') AS text_cleaned,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN r.j IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_removed
    FROM tokpos tp
    LEFT JOIN removed r ON tp.doc_id = r.doc_id AND tp.j = r.j
    GROUP BY tp.doc_id
    """,
    tags=("J2", "text-quality"),
    demoted=True,
)
def q_llm_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus under 3-gram cross-doc span removal (see
    ``remove_duplicated_spans``); the DuckDB oracle rebuilds the same
    cleaned text token-by-token via an interval join."""
    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, n=3)


@register(
    "q_llm_remove_dup_spans_minlen",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS tk FROM documents
    ),
    g AS (
      SELECT doc_id,
             UNNEST(range(1, len(tk) - 1)) AS p,
             UNNEST(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+2], ' '))) AS g
      FROM tok
    ),
    dup AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM g)
      GROUP BY g HAVING COUNT(*) >= 2
    ),
    covered AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (g)),
    tokpos AS (
      SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS j, UNNEST(tk) AS t
      FROM tok
    ),
    covpos AS (
      SELECT DISTINCT tp.doc_id, tp.j
      FROM tokpos tp JOIN covered c
        ON tp.doc_id = c.doc_id AND tp.j BETWEEN c.p AND c.p + 2
    ),
    runs AS (
      SELECT doc_id, j,
             j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS grp
      FROM covpos
    ),
    removed AS (
      SELECT doc_id, j FROM (
        SELECT doc_id, j, COUNT(*) OVER (PARTITION BY doc_id, grp) AS runlen
        FROM runs
      ) WHERE runlen >= 5
    )
    SELECT tp.doc_id,
           COALESCE(string_agg(CASE WHEN r.j IS NULL THEN tp.t END,
                               ' ' ORDER BY tp.j), '') AS text_cleaned,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN r.j IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_removed
    FROM tokpos tp
    LEFT JOIN removed r ON tp.doc_id = r.doc_id AND tp.j = r.j
    GROUP BY tp.doc_id
    """,
    tags=("J2", "text-quality"),
)
def q_llm_remove_dup_spans_minlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span removal with the Lee-et-al. minimum-run guard: covered
    positions merge into maximal runs (SQL island detection in the
    oracle, a sorted-starts interval fold in Spark) and only runs of
    ≥ 5 tokens are excised — short incidental n-gram matches survive.
    L=5 (not the paper's 50) so the guard actually bites on this corpus's
    short synthetic docs; the semantics are length-parameter-independent."""
    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, n=3, min_span_tokens=5)


# --- PII redaction ---------------------------------------------------------
#
# Pattern subset chosen to mean the SAME thing in Java regex (Spark) and
# RE2 (DuckDB oracle): character classes, bounded repetition, \b word
# boundaries — no lookarounds, no backrefs. The patterns are deliberately
# conservative (precision over recall): a pretraining scrub that mangles
# non-PII text is worse than one that misses an exotic format.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Scrub PII spans from ``text_col``: each pattern family is counted
    (``n_<name>s``, on the ORIGINAL text) then replaced with a typed
    placeholder (``[EMAIL]`` / ``[PHONE]`` / ``[IP]``) in
    ``<text_col>_redacted``.

    Map-only — counting and replacement are whole-stage-codegen regexp
    expressions over one scan, zero exchanges: at 100 TB the scrub costs
    nothing beyond the read the pipeline already pays. The default families
    are non-overlapping, so replacement order cannot change the result;
    custom ``patterns`` are applied in dict order."""
    pats = patterns if patterns is not None else _PII_PATTERNS
    out = df
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}s",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"),
        )
    red = F.col(text_col)
    for name, pat in pats.items():
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return out.withColumn(f"{text_col}_redacted", red)


# The testdata word-soup contains no PII, so the registered query plants
# deterministic spans (keyed on doc_id, identical CONCAT in both engines)
# before scrubbing — the oracle then exercises real match+replace parity
# instead of vacuously passing on zero matches.
_PII_SEED_SQL = """
         text ||
         CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 11 = 0
              THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 13 = 0
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.' || CAST(doc_id % 100 AS VARCHAR)
              ELSE '' END
"""


@register(
    "q_text_pii_redact",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, {_PII_SEED_SQL} AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '{_PII_PATTERNS["email"]}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
                '{_PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text,
                '{_PII_PATTERNS["ip"]}')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '{_PII_PATTERNS["email"]}', '[EMAIL]', 'g'),
               '{_PII_PATTERNS["phone"]}', '[PHONE]', 'g'),
             '{_PII_PATTERNS["ip"]}', '[IP]', 'g') AS text_redacted
    FROM seeded
    """,
    tags=("text-quality", "pii"),
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over ``documents`` with deterministically planted
    email/phone/IP spans (see ``redact_pii``); counts are taken pre-scrub,
    the redacted text is surfaced for byte-level parity checking."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call 555-010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return redact_pii(seeded).select(
        "doc_id", "n_emails", "n_phones", "n_ips", "text_redacted"
    )


# --- unigram-LM quality score ----------------------------------------------


def unigram_nll(
    df: DataFrame, text_col: str = "text", vocab_size: int = 1000
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood — the LM-based
    quality proxy (CCNet-style: score each doc against a language model
    trained on the corpus itself; here the LM is the corpus unigram
    distribution). High mean NLL = the doc is full of rare/unknown tokens
    relative to the corpus; a quality cascade thresholds or buckets on it.

    ONE pass over the token stream (the ``dsir_logweights`` pattern):
    tokenize + explode + one shuffle onto (doc_id, token) counts, which
    are CHECKPOINTED; everything else — the top-``vocab_size`` vocab model
    (count desc, token asc), the corpus normalizer N = Σc (a 1-row
    broadcast cross join, not a separate ``count()`` action), and the
    per-doc scoring — derives from that checkpointed count frame, so the
    corpus text is read and tokenized exactly once.

    The vocab broadcast is what makes this 100 TB-safe: the join carries a
    ``vocab_size``-row table to every task instead of shuffling the token
    stream a second time. Per-token NLL = ln(N / count) (OOV floored at
    count 1) is cast to float32 to absorb last-ulp libm differences (the
    q_fn_math convention); the per-doc mean weights each distinct token's
    NLL by its in-doc count c — the float32·c product is exact in double
    (24-bit mantissa × small integer), so both engines round the identical
    value into the decimal accumulator."""
    from pyspark.sql.functions import broadcast

    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    tok = tokens(df, text_col).select("doc_id", "token")
    dt = checkpoint_df(
        tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        dt.groupBy("token")
        .agg(F.sum("c").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
    )
    tot = dt.agg(F.sum("c").cast("double").alias("total"))
    nll = (
        F.log(F.col("total") / F.coalesce(F.col("cnt"), F.lit(1)))
        .cast("float")
    )
    return (
        dt.crossJoin(broadcast(tot))
        .join(broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("cnt").isNull(), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_oov"),
            # float32 absorbs libm ulp noise; the explicit double hop
            # before the decimal cast matters: DuckDB scales REAL→DECIMAL
            # in float precision (3.4061794f*1e6 rounds to 3406179.5 →
            # .406180) while Spark goes through exact double — hopping to
            # double first makes both engines round the same exact value
            (
                F.sum((nll.cast("double") * F.col("c")).cast(DEC)).cast("double")
                / F.sum("c")
            ).alias("mean_nll"),
        )
    )


@register(
    "q_text_unigram_nll",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents
    ),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    dt AS (
      SELECT doc_id, token, COUNT(*) AS c FROM tok2 GROUP BY doc_id, token
    ),
    n AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM dt),
    vocab AS (
      SELECT token, CAST(SUM(c) AS BIGINT) AS cnt FROM dt
      GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 1000
    )
    SELECT t.doc_id,
           CAST(SUM(t.c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.cnt IS NULL THEN t.c ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CAST(CAST(CAST(LN((SELECT total FROM n)
                 / COALESCE(v.cnt, 1))
                 AS REAL) AS DOUBLE) * t.c AS DECIMAL(38,6))) AS DOUBLE)
             / SUM(t.c)
             AS mean_nll
    FROM dt t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
    tags=("text-quality",),
    # r15: demoted to free a driver slot for q_llm_planted_probe (the
    # only HASH-CHECKED retrieval-quality query); the bigram form keeps
    # the NLL family driver-visible and exercises a strict superset of
    # this query's machinery (same tokenize/vocab/OOV path + the
    # conditional backoff). Identical local parity gate applies.
    demoted=True,
)
def q_text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained unigram-LM quality score per document (see
    ``unigram_nll``): top-1000 vocab, OOV floored at count 1."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram_nll(docs, vocab_size=1000)


def _token_array(text_col: str = "text") -> "F.Column":
    """Lowercased non-empty token ARRAY on the module's ' '-split grain —
    the one tokenizer expression shared by every oracle-paired array
    consumer here (the DuckDB side is always
    ``list_filter(string_split(LOWER(text), ' '), x -> x <> '')``; keeping
    a single Spark twin of it means a tokenization change cannot
    desynchronize one pipeline silently)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
    )


def dsir_logweights(
    docs: DataFrame,
    target,
    text_col: str = "text",
    n_buckets_hex: int = 3,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    Fits two bag-of-hashed-n-grams unigram models — one on the ``target``
    subset, one on the whole (raw) corpus — and scores every document with
    its log importance weight Σ_f c_f · [ln p_target(f) − ln p_raw(f)]
    (add-1 smoothing over the observed buckets). High-weight docs look
    like the target domain; importance RESAMPLING is then just
    ``sample_mixture``/``bernoulli`` on a transform of the weight.

    Features are word 1- and 2-grams hashed into 16^``n_buckets_hex``
    buckets via a sha256-hex prefix — a hash both engines (and any other)
    reproduce byte-for-byte, so the whole pipeline is oracle-checkable
    (the usual DSIR murmur-hash is engine-specific; the bucket STATISTICS,
    not the hash family, carry the method).

    Plan shape (and why it holds at 100 TB):

    - ONE explode pass builds the gram stream (unigram and bigram arrays
      concatenated before the explode — no second scan per order);
    - per-(doc, bucket) counts ``c`` shuffle once on (doc_id, bucket);
    - the bucket-model table is a ≤16^n_buckets_hex-row aggregate of that
      frame — broadcast back, never shuffled;
    - totals attach as a 1-row broadcast cross join (the q_llm_tfidf
      scalar convention).
    The (doc, bucket) frame feeds both the model branch and the scoring
    branch, so it is materialized ONCE via ``checkpoint_df`` (its subplan
    is deterministic, so this is an efficiency choice, not a correctness
    requirement): the corpus text is tokenized and exploded exactly one
    time, and both branches read the checkpointed counts.

    Per-bucket log ratio is cast to float32 to absorb last-ulp libm
    differences (q_fn_math convention); the per-doc sum is decimal-exact
    (order-independent) per the registry discipline.

    ``target`` is any boolean Column over ``docs``'s columns.
    """
    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    base = docs.select(
        "doc_id", target.alias("__tgt"), _token_array(text_col).alias("tk")
    )
    grams = base.select(
        "doc_id",
        "__tgt",
        F.explode(F.concat(_ngrams("tk", 1), _ngrams("tk", 2))).alias("g"),
    ).select(
        "doc_id", "__tgt", F.substring(F.sha2(F.col("g"), 256), 1, int(n_buckets_hex)).alias("b")
    )
    db = checkpoint_df(
        grams.groupBy("doc_id", "__tgt", "b").agg(F.count(F.lit(1)).alias("c"))
    )
    bs = db.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("c")).otherwise(F.lit(0)))
        .alias("tgt_c"),
        F.sum("c").alias("raw_c"),
    )
    tot = bs.agg(
        F.sum("tgt_c").alias("t_tgt"),
        F.sum("raw_c").alias("t_raw"),
        F.count(F.lit(1)).alias("nb"),
    )
    lr = (
        bs.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.col("tgt_c") + 1) / (F.col("t_tgt") + F.col("nb")))
                - F.log((F.col("raw_c") + 1) / (F.col("t_raw") + F.col("nb")))
            )
            .cast("float")
            .alias("lr"),
        )
    )
    return (
        db.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_features"),
            F.sum((F.col("lr").cast("double") * F.col("c")).cast(DEC))
            .cast("double")
            .alias("log_weight"),
        )
    )


@register(
    "q_llm_dsir_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS tgt,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id, tgt,
             UNNEST(list_concat(
               tk,
               list_transform(range(1, len(tk)),
                              i -> tk[i] || ' ' || tk[i+1]))) AS g
      FROM tok
    ),
    db AS (
      SELECT doc_id, tgt, substr(sha256(g), 1, 3) AS b, COUNT(*) AS c
      FROM g GROUP BY doc_id, tgt, b
    ),
    bs AS (
      SELECT b, SUM(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_c,
             SUM(c) AS raw_c
      FROM db GROUP BY b
    ),
    tot AS (
      SELECT SUM(tgt_c) AS t_tgt, SUM(raw_c) AS t_raw, COUNT(*) AS nb
      FROM bs
    ),
    lr AS (
      SELECT b,
             CAST(LN((tgt_c + 1) / (t_tgt + nb))
                  - LN((raw_c + 1) / (t_raw + nb)) AS REAL) AS lr
      FROM bs CROSS JOIN tot
    )
    SELECT db.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_features,
           CAST(SUM(CAST(CAST(lr AS DOUBLE) * c AS DECIMAL(38,6)))
                AS DOUBLE) AS log_weight
    FROM db JOIN lr USING (b)
    GROUP BY db.doc_id
    """,
    tags=("text-quality", "data-selection"),
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights against the ``lang = 'en'`` target
    slice (see ``dsir_logweights``): hashed 1/2-gram bucket models,
    add-1 smoothing, decimal-exact per-doc sums."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_logweights(docs, F.col("lang") == "en")


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    bigram_size: int = 4000,
    lam: float = 0.5,
) -> DataFrame:
    """Per-document mean INTERPOLATED-BIGRAM negative log-likelihood — the
    distributed analog of CCNet's KenLM perplexity filter, one order up
    from ``unigram_nll``: p(w_i | w_{i-1}) = λ·p₂ + (1−λ)·p₁ with
    p₂ = c(w_{i-1} w_i)/c(w_{i-1}) over the top-``bigram_size`` bigram
    table and p₁ the floor-smoothed unigram model. Fluent token order
    scores low; shuffled/boilerplate text scores high even when its
    unigram profile looks normal — exactly what the bigram order adds.

    Plan shape (100 TB story identical to ``unigram_nll`` /
    ``dsir_logweights``): ONE pass over the corpus text. Unigram and
    bigram grams ride the SAME tagged stream (unigram structs carry a
    NULL ``cur``; bigrams are a zip of two array slices — map-side, no
    self-join on position), so a single explode + one shuffle produces
    the checkpointed per-(doc, prev, cur) count frame. Everything else
    derives from that frame:

    - both model tables are deterministic top-K aggregates (count desc,
      key asc) of it — KB-sized, BROADCAST back, never reshuffled (the
      unigram model is additionally checkpointed because it feeds BOTH
      the prev- and cur-side broadcast builds, which ReuseExchange
      cannot dedupe);
    - the corpus total N = Σc over the unigram rows attaches as a 1-row
      broadcast cross join — no separate ``count()`` action;
    - scoring runs over the bigram rows of the frame, each distinct
      (doc, prev, cur) weighted by its count c.

    λ defaults to 0.5 (a power of two: the interpolation multiply is
    exact in both engines). Per-position NLL is float32-cast (libm ulp
    absorption); the float32·c product is exact in double, and the
    per-doc mean is decimal-exact. Docs with < 2 tokens have no bigram
    positions and are absent from the output (inner semantics, mirrored
    by the oracle). Bigrams whose previous word falls outside the
    top-``vocab_size`` unigram table back off to the unigram term alone
    (p₂ = 0) — both models are honestly capped-vocab, which is what
    keeps them broadcastable at any corpus size."""
    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    base = df.select("doc_id", _token_array(text_col).alias("tk"))
    null_s = F.lit(None).cast("string")
    n1 = F.greatest(F.size("tk") - 1, F.lit(0))
    uni_structs = F.transform(
        "tk", lambda w: F.struct(w.alias("prev"), null_s.alias("cur"))
    )
    pair_structs = F.zip_with(
        F.slice("tk", 1, n1),
        F.slice("tk", 2, n1),
        lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
    )
    grams = base.select(
        "doc_id", F.explode(F.concat(uni_structs, pair_structs)).alias("g")
    ).select("doc_id", F.col("g.prev").alias("prev"), F.col("g.cur").alias("cur"))
    dg = checkpoint_df(
        grams.groupBy("doc_id", "prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    )
    du = dg.filter(F.col("cur").isNull()).select(
        "doc_id", F.col("prev").alias("w"), "c"
    )
    dp = dg.filter(F.col("cur").isNotNull())
    # the KB-sized unigram model feeds BOTH the prev- and cur-side joins;
    # checkpoint it so the top-K aggregate over the (corpus-scale)
    # checkpointed count frame executes once, not once per broadcast build
    c1 = checkpoint_df(
        du.groupBy("w")
        .agg(F.sum("c").cast("bigint").alias("c1"))
        .orderBy(F.col("c1").desc(), F.col("w").asc())
        .limit(vocab_size)
    )
    tot = du.agg(F.sum("c").cast("double").alias("total"))
    c2 = (
        dp.groupBy("prev", "cur")
        .agg(F.sum("c").cast("bigint").alias("c2"))
        .orderBy(F.col("c2").desc(), F.col("prev").asc(), F.col("cur").asc())
        .limit(bigram_size)
    )
    cp = c1.select(F.col("w").alias("prev"), F.col("c1").alias("c1p"))
    cc = c1.select(F.col("w").alias("cur"), F.col("c1").alias("c1c"))
    p2 = F.when(
        F.col("c2").isNotNull() & F.col("c1p").isNotNull(),
        F.col("c2") / F.col("c1p"),
    ).otherwise(F.lit(0.0))
    p1 = F.coalesce(F.col("c1c"), F.lit(1)) / F.col("total")
    nll = (-F.log(F.lit(lam) * p2 + F.lit(1.0 - lam) * p1)).cast("float")
    return (
        dp.crossJoin(F.broadcast(tot))
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(cp), "prev", "left")
        .join(F.broadcast(cc), "cur", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            (
                F.sum((nll.cast("double") * F.col("c")).cast(DEC)).cast("double")
                / F.sum("c")
            ).alias("mean_nll2"),
        )
    )


@register(
    "q_text_bigram_nll",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    du AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(tk) AS w FROM tok)
      GROUP BY doc_id, w
    ),
    c1 AS (
      SELECT w, CAST(SUM(c) AS BIGINT) AS c1 FROM du
      GROUP BY w ORDER BY c1 DESC, w ASC LIMIT 1000
    ),
    n AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM du),
    pr AS (
      SELECT doc_id,
             UNNEST(list_slice(tk, 1, len(tk) - 1)) AS prev,
             UNNEST(list_slice(tk, 2, len(tk))) AS cur
      FROM tok WHERE len(tk) >= 2
    ),
    dp AS (
      SELECT doc_id, prev, cur, COUNT(*) AS c FROM pr
      GROUP BY doc_id, prev, cur
    ),
    c2 AS (
      SELECT prev, cur, CAST(SUM(c) AS BIGINT) AS c2 FROM dp
      GROUP BY prev, cur ORDER BY c2 DESC, prev ASC, cur ASC LIMIT 4000
    ),
    sc AS (
      SELECT dp.doc_id, dp.c,
             CAST(-LN(
               0.5 * (CASE WHEN c2.c2 IS NOT NULL AND cp.c1 IS NOT NULL
                           THEN c2.c2 / cp.c1 ELSE 0.0 END)
               + 0.5 * (COALESCE(cc.c1, 1) / (SELECT total FROM n))
             ) AS REAL) AS nll
      FROM dp
      LEFT JOIN c2 ON dp.prev = c2.prev AND dp.cur = c2.cur
      LEFT JOIN c1 cp ON dp.prev = cp.w
      LEFT JOIN c1 cc ON dp.cur = cc.w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(CAST(nll AS DOUBLE) * c AS DECIMAL(38,6)))
                AS DOUBLE) / SUM(c) AS mean_nll2
    FROM sc GROUP BY doc_id
    """,
    tags=("text-quality",),
)
def q_text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM quality score per document (see
    ``bigram_nll``): top-1000 unigram + top-4000 bigram models, λ = 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_nll(docs)


@register(
    "q_text_collocations",
    oracle="""
    WITH tok AS (
      SELECT list_filter(string_split(LOWER(text), ' '), t -> t <> '') AS tk
      FROM documents
    ),
    pr AS (
      SELECT UNNEST(list_slice(tk, 1, len(tk) - 1)) AS prev,
             UNNEST(list_slice(tk, 2, len(tk))) AS cur
      FROM tok WHERE len(tk) >= 2
    ),
    cab AS (SELECT prev, cur, COUNT(*) AS pair_count FROM pr GROUP BY prev, cur),
    cw AS (
      SELECT w, COUNT(*) AS cw
      FROM (SELECT UNNEST(tk) AS w FROM tok) GROUP BY w
    ),
    n AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_tokens FROM cw)
    SELECT cab.prev, cab.cur, cab.pair_count,
           CAST(LN((CAST(n.n_tokens AS DOUBLE) * cab.pair_count)
                   / (CAST(ca.cw AS DOUBLE) * cb.cw)) AS REAL) AS pmi
    FROM cab
    JOIN cw ca ON ca.w = cab.prev
    JOIN cw cb ON cb.w = cab.cur
    CROSS JOIN n
    WHERE cab.pair_count >= 10
    ORDER BY pmi DESC, cab.prev ASC, cab.cur ASC
    LIMIT 50
    """,
    tags=("text-collocations", "J5"),
    demoted=True,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent-token bigrams by pointwise
    mutual information, PMI = ln(N·c(a,b) / (c(a)·c(b))) with N the
    corpus token count (Church & Hanks, "Word Association Norms, Mutual
    Information, and Lexicography", 1990 — public paper). The
    min-pair-count floor (≥ 10) is the standard guard against PMI's
    rare-pair bias (a 1-occurrence pair of two rare words maximizes PMI).

    Plan: the bigram stream is the same map-side prev/cur slice-zip as
    ``bigram_nll``; counts are three shrinking-key aggs; the unigram
    table joins back twice (broadcast — |vocab|-sized); N is a 1-row
    cross join; top-50 is TakeOrdered (never a global sort). PMI is
    float-cast with a full (pmi, prev, cur) total order so the top-50
    boundary is deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("tk")
    )
    n1 = F.size("tk") - 1
    pairs = (
        tok.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("tk", 1, n1),
                    F.slice("tk", 2, n1),
                    lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
                )
            ).alias("pc")
        )
        .select("pc.prev", "pc.cur")
    )
    cab = pairs.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    cw = (
        tok.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    n_tokens = cw.agg(F.sum("cw").cast("bigint").alias("n_tokens"))
    ca = cw.select(F.col("w").alias("prev"), F.col("cw").alias("ca"))
    cb = cw.select(F.col("w").alias("cur"), F.col("cw").alias("cb"))
    return (
        cab.filter(F.col("pair_count") >= 10)
        .join(F.broadcast(ca), "prev")
        .join(F.broadcast(cb), "cur")
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "prev",
            "cur",
            "pair_count",
            F.log(
                (F.col("n_tokens").cast("double") * F.col("pair_count"))
                / (F.col("ca").cast("double") * F.col("cb"))
            )
            .cast("float")
            .alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("prev"), F.asc("cur"))
        .limit(50)
    )


def token_kl_drift(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row (vocab, n_tokens_a, n_tokens_b, kl_ab, kl_ba): KL
    divergence between two corpus snapshots' unigram token distributions
    — the corpus-drift monitor. A retrained tokenizer, an upstream
    source change, or contamination shows up here before it shows up in
    model metrics; kl_ab ≈ kl_ba ≈ 0 means the snapshots are
    interchangeable, a large asymmetric pair says which side gained
    novel mass.

    Distributions are add-one smoothed over the UNION vocabulary
    (p(t) = (c(t)+1)/(N+V)), so both KLs are finite even for tokens one
    side has never seen. Plan: one token-count aggregation per side, a
    vocab-grain full outer join (checkpointed — it feeds both the
    scalar totals and the term sum), one broadcast 1-row totals frame,
    one final aggregate. Nothing is ever quadratic; the widest frame is
    the union vocabulary.

    Determinism: p ratios are exact-int divisions (identical doubles in
    both engines), each ln is collapsed to float32 (libm last-ulp
    absorption, the q_fn_math convention), each term p·ln is rounded
    into decimal(38,6) and summed order-independently — the exact
    ``unigram_nll`` parity discipline.
    """
    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    ca = (
        tokens(docs_a, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    cb = (
        tokens(docs_b, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_b"))
    )
    j = checkpoint_df(
        ca.join(cb, "token", "full_outer").select(
            "token",
            F.coalesce(F.col("c_a"), F.lit(0)).cast("bigint").alias("c_a"),
            F.coalesce(F.col("c_b"), F.lit(0)).cast("bigint").alias("c_b"),
        )
    )
    tot = j.agg(
        F.sum("c_a").cast("double").alias("na"),
        F.sum("c_b").cast("double").alias("nb"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    pa = (F.col("c_a") + F.lit(1)).cast("double") / (F.col("na") + F.col("v"))
    pb = (F.col("c_b") + F.lit(1)).cast("double") / (F.col("nb") + F.col("v"))
    term_ab = (pa * F.log(pa / pb).cast("float").cast("double")).cast(DEC)
    term_ba = (pb * F.log(pb / pa).cast("float").cast("double")).cast(DEC)
    return j.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c_a").cast("bigint").alias("n_tokens_a"),
        F.sum("c_b").cast("bigint").alias("n_tokens_b"),
        F.sum(term_ab).cast("double").alias("kl_ab"),
        F.sum(term_ba).cast("double").alias("kl_ba"),
    )


@register(
    "q_text_kl_drift",
    oracle="""
    WITH ta AS (
      SELECT UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents WHERE doc_id % 2 = 0
    ),
    tb AS (
      SELECT UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents WHERE doc_id % 2 = 1
    ),
    ca AS (SELECT token, COUNT(*) AS c_a FROM ta WHERE token <> ''
           GROUP BY token),
    cb AS (SELECT token, COUNT(*) AS c_b FROM tb WHERE token <> ''
           GROUP BY token),
    j AS (
      SELECT COALESCE(ca.token, cb.token) AS token,
             CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
             CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
      FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
    ),
    n AS (
      SELECT CAST(SUM(c_a) AS DOUBLE) AS na, CAST(SUM(c_b) AS DOUBLE) AS nb,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(c_a) AS BIGINT) AS n_tokens_a,
           CAST(SUM(c_b) AS BIGINT) AS n_tokens_b,
           CAST(SUM(CAST(
             (CAST(c_a + 1 AS DOUBLE) / (n.na + n.v))
             * CAST(CAST(LN((CAST(c_a + 1 AS DOUBLE) / (n.na + n.v))
                          / (CAST(c_b + 1 AS DOUBLE) / (n.nb + n.v)))
                     AS REAL) AS DOUBLE)
           AS DECIMAL(38,6))) AS DOUBLE) AS kl_ab,
           CAST(SUM(CAST(
             (CAST(c_b + 1 AS DOUBLE) / (n.nb + n.v))
             * CAST(CAST(LN((CAST(c_b + 1 AS DOUBLE) / (n.nb + n.v))
                          / (CAST(c_a + 1 AS DOUBLE) / (n.na + n.v)))
                     AS REAL) AS DOUBLE)
           AS DECIMAL(38,6))) AS DOUBLE) AS kl_ba
    FROM j, n
    """,
    tags=("text-drift",),
    demoted=True,
)
def q_text_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift KL between the even- and odd-doc_id halves of the
    documents table (see ``token_kl_drift``) — near-zero by construction
    (the halves are i.i.d. draws of the same synthesizer), which is
    exactly the null-hypothesis readout a monitor calibrates on."""
    docs = load_table(spark, sf_dir, "documents")
    return token_kl_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


# --- winnowing fingerprints (r14) ------------------------------------------

_WINNOW_K, _WINNOW_W, _WINNOW_HEX = 4, 4, 12


def winnow_fingerprints(
    docs: DataFrame,
    k: int = _WINNOW_K,
    w: int = _WINNOW_W,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, fp): winnowing document fingerprints — the
    local-minimum selection of Schleimer, Wilkerson & Aiken (SIGMOD'03,
    the MOSS algorithm), the span-grain fingerprinting a
    plagiarism/boilerplate detector runs where whole-document hashing is
    too coarse and every-k-gram too large.

    Each document's token k-grams are hashed (sha256 hex prefix — a hash
    BOTH engines compute identically, the dsir_logweights convention, so
    the whole selection is oracle-checkable); every window of ``w``
    consecutive hashes selects its minimum, rightmost on ties (the
    robust-winnowing tie rule, expressed as min over (h, −pos) structs);
    the distinct selections are the fingerprint set. Guarantees: any
    shared substring of ≥ w+k−1 tokens produces at least one shared
    fingerprint (detection), and gaps between selected positions are
    ≤ w (density ≤ 2/(w+1) expected) — tunable recall/size.

    Scale shape: one text scan, one map-side gram explode, ONE window
    partitioned by document (per-doc sort of its own grams — no global
    sort), one distinct on the doc-grain selections. Documents below
    w+k−1 tokens emit nothing (no complete window — matching MOSS).
    """
    from pyspark.sql import Window as _W

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " ").alias("tk"),
    )
    g = toks.select(
        "doc_id", F.posexplode(_ngrams("tk", k)).alias("pos", "g")
    ).select(
        "doc_id",
        "pos",
        F.substring(F.sha2("g", 256), 1, _WINNOW_HEX).alias("h"),
    )
    win = _W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = g.select(
        "doc_id",
        F.count(F.lit(1)).over(win).alias("__n"),
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(
            win
        ).alias("__sel"),
    ).filter(F.col("__n") == w)
    return (
        sel.select(
            "doc_id",
            (-F.col("__sel.np")).cast("bigint").alias("pos"),
            F.col("__sel.h").alias("fp"),
        )
        .distinct()
        .orderBy("doc_id", "pos")
    )


def fingerprint_overlap(
    docs: DataFrame,
    k: int = _WINNOW_K,
    w: int = _WINNOW_W,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the span-grain near-dup readout (two docs
    sharing a ≥ w+k−1-token run share a fingerprint BY GUARANTEE, so
    boilerplate/plagiarized spans surface without any all-pairs work:
    candidates come only from fingerprint collisions, like every other
    posting-list join in this engine).

    ``max_df`` (hot-fingerprint rail, r15 — default off = exact): a
    fingerprint shared by more than ``max_df`` documents generates
    ~df²/2 rows INSIDE the pair join before ``min_shared`` can prune
    anything, and a fingerprint that hot IS boilerplate (a license
    header shared by a million docs is not a plagiarism signal — the
    same stopword logic as BM25's ``max_df_ratio`` and PPJoin's prefix
    order). With the rail on, hot fingerprints are excluded BEFORE the
    join — pair candidates are bounded at max_df·df rows per
    fingerprint, and ``n_shared`` counts only informative (cold)
    collisions. ``winnow_stats`` reports the exact pair-row count with
    and without the rail, so the cap is chosen from measurement."""
    fp = winnow_fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    if max_df is not None:
        if max_df < 2:
            raise ValueError(f"max_df must be >= 2, got {max_df}")
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("fp")
        )
        # the hot list is tiny by construction (only boilerplate fps);
        # AQE turns this anti-join into a broadcast
        fp = fp.join(hot, "fp", "left_anti")
    a = fp.select(F.col("doc_id").alias("id_a"), "fp")
    b = fp.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_stats(
    docs: DataFrame,
    k: int = _WINNOW_K,
    w: int = _WINNOW_W,
    max_df: int | None = None,
) -> DataFrame:
    """One-row fingerprint-skew health report for a winnowing corpus —
    the ``index_stats``-style readout (r15) that tells an operator
    whether ``fingerprint_overlap`` needs its ``max_df`` rail BEFORE the
    pair join runs: ``pair_rows`` is the EXACT pair-join input size
    (Σ df·(df−1)/2 over fingerprints), ``pair_rows_railed`` the same sum
    restricted to fingerprints with df ≤ max_df, and ``fp_skew``
    (max_df_seen / mean df) the one-number hot-spot alarm, same
    threshold discipline as the persisted families' ``skew`` column.
    Cost: the fingerprint scan plus one fp-grain aggregate — no pair
    join is materialized."""
    fp = winnow_fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    dfc = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    # integer DIV, never float: df·(df−1) is always even, and 'exact
    # pair-join input size' must stay exact past 2^53 — the hot-
    # boilerplate regime this readout exists to measure
    pair = F.expr("(df * (df - 1)) div 2")
    cap = F.lit(max_df if max_df is not None else None).cast("bigint")
    return dfc.agg(
        F.countDistinct("fp").alias("n_fps"),
        F.sum("df").cast("bigint").alias("n_entries"),
        F.max("df").cast("bigint").alias("max_df_seen"),
        # max/mean as max·n_fps/n_entries — exact integers, ONE double
        # division in a fixed order, so the DuckDB oracle reproduces the
        # bits (the exprs.py cross-engine float discipline)
        (
            (F.max("df") * F.countDistinct("fp")).cast("double")
            / F.sum("df").cast("double")
        ).alias("fp_skew"),
        F.sum(pair).cast("bigint").alias("pair_rows"),
        F.sum(
            F.when(cap.isNull() | (F.col("df") <= cap), pair).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("pair_rows_railed"),
        F.sum(
            F.when(cap.isNotNull() & (F.col("df") > cap), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hot_fps"),
    )


@register(
    "q_text_winnow",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t
      FROM documents WHERE doc_id < 300
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             substr(sha256(array_to_string(
               t[i:i+{_WINNOW_K - 1}], ' ')), 1, {_WINNOW_HEX}) AS h
      FROM (SELECT doc_id, t,
                   UNNEST(range(1, len(t) - {_WINNOW_K} + 2)) AS i
            FROM tk WHERE len(t) >= {_WINNOW_K})
    ),
    n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
    win AS (
      SELECT doc_id, UNNEST(range(0, ng - {_WINNOW_W} + 1)) AS s
      FROM n WHERE ng >= {_WINNOW_W}
    ),
    m AS (
      SELECT win.doc_id, win.s, g.pos, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY win.doc_id, win.s
               ORDER BY g.h ASC, g.pos DESC
             ) AS rk
      FROM win JOIN g ON g.doc_id = win.doc_id
                     AND g.pos BETWEEN win.s AND win.s + {_WINNOW_W - 1}
    )
    SELECT DISTINCT doc_id AS doc_id, CAST(pos AS BIGINT) AS pos, h AS fp
    FROM m WHERE rk = 1
    ORDER BY doc_id, pos
    """,
    tags=("J5", "text", "fingerprint"),
    demoted=True,
)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints of the first 300 documents (k=4-gram
    hashes, window w=4, rightmost-min selection) — hash-exact vs an
    O(n·w) window-join oracle, proving the one-pass window formulation
    selects exactly the per-window rightmost minima."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return winnow_fingerprints(docs)


@register(
    "q_text_winnow_overlap",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t
      FROM documents WHERE doc_id < 300
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             substr(sha256(array_to_string(
               t[i:i+{_WINNOW_K - 1}], ' ')), 1, {_WINNOW_HEX}) AS h
      FROM (SELECT doc_id, t,
                   UNNEST(range(1, len(t) - {_WINNOW_K} + 2)) AS i
            FROM tk WHERE len(t) >= {_WINNOW_K})
    ),
    n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
    win AS (
      SELECT doc_id, UNNEST(range(0, ng - {_WINNOW_W} + 1)) AS s
      FROM n WHERE ng >= {_WINNOW_W}
    ),
    m AS (
      SELECT win.doc_id, win.s, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY win.doc_id, win.s
               ORDER BY g.h ASC, g.pos DESC
             ) AS rk
      FROM win JOIN g ON g.doc_id = win.doc_id
                     AND g.pos BETWEEN win.s AND win.s + {_WINNOW_W - 1}
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM m WHERE rk = 1)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    ORDER BY id_a, id_b
    """,
    tags=("J5", "text", "fingerprint"),
    demoted=True,
)
def q_text_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-grain overlap pairs from winnowing fingerprints over the
    first 300 documents (>= 2 shared selections) — hash-exact vs the
    oracle's all-pairs fingerprint join, so both the selection AND the
    collision counting are SQL-proven."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return fingerprint_overlap(docs, min_shared=2).orderBy("id_a", "id_b")


_WINNOW_MAX_DF = 5


@register(
    "q_text_winnow_stats",
    # the health readout itself is SQL-proven: same fp CTE as
    # q_text_winnow, then one df-grain aggregate — so the numbers an
    # operator picks max_df from are hash-checked, not just plausible
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t
      FROM documents WHERE doc_id < 300
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             substr(sha256(array_to_string(
               t[i:i+{_WINNOW_K - 1}], ' ')), 1, {_WINNOW_HEX}) AS h
      FROM (SELECT doc_id, t,
                   UNNEST(range(1, len(t) - {_WINNOW_K} + 2)) AS i
            FROM tk WHERE len(t) >= {_WINNOW_K})
    ),
    n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
    win AS (
      SELECT doc_id, UNNEST(range(0, ng - {_WINNOW_W} + 1)) AS s
      FROM n WHERE ng >= {_WINNOW_W}
    ),
    m AS (
      SELECT win.doc_id, win.s, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY win.doc_id, win.s
               ORDER BY g.h ASC, g.pos DESC
             ) AS rk
      FROM win JOIN g ON g.doc_id = win.doc_id
                     AND g.pos BETWEEN win.s AND win.s + {_WINNOW_W - 1}
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM m WHERE rk = 1),
    dfc AS (SELECT h, COUNT(*) AS df FROM fp GROUP BY h)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fps,
           CAST(SUM(df) AS BIGINT) AS n_entries,
           CAST(MAX(df) AS BIGINT) AS max_df_seen,
           CAST(MAX(df) * COUNT(*) AS DOUBLE) / CAST(SUM(df) AS DOUBLE)
             AS fp_skew,
           CAST(SUM((df * (df - 1)) // 2) AS BIGINT) AS pair_rows,
           CAST(SUM(CASE WHEN df <= {_WINNOW_MAX_DF}
                         THEN (df * (df - 1)) // 2 ELSE 0 END) AS BIGINT)
             AS pair_rows_railed,
           CAST(SUM(CASE WHEN df > {_WINNOW_MAX_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_fps
    FROM dfc
    """,
    tags=("J5", "text", "fingerprint", "stats"),
    demoted=True,
)
def q_text_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnowing fingerprint-skew health row over the first 300
    documents, at the railed query's max_df=5 — hash-checked, so
    ``pair_rows``/``pair_rows_railed``/``n_hot_fps`` (the numbers the
    rail is sized from) are SQL-proven, not merely asserted."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return winnow_stats(docs, max_df=_WINNOW_MAX_DF)


@register(
    "q_text_winnow_overlap_railed",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t
      FROM documents WHERE doc_id < 300
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             substr(sha256(array_to_string(
               t[i:i+{_WINNOW_K - 1}], ' ')), 1, {_WINNOW_HEX}) AS h
      FROM (SELECT doc_id, t,
                   UNNEST(range(1, len(t) - {_WINNOW_K} + 2)) AS i
            FROM tk WHERE len(t) >= {_WINNOW_K})
    ),
    n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
    win AS (
      SELECT doc_id, UNNEST(range(0, ng - {_WINNOW_W} + 1)) AS s
      FROM n WHERE ng >= {_WINNOW_W}
    ),
    m AS (
      SELECT win.doc_id, win.s, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY win.doc_id, win.s
               ORDER BY g.h ASC, g.pos DESC
             ) AS rk
      FROM win JOIN g ON g.doc_id = win.doc_id
                     AND g.pos BETWEEN win.s AND win.s + {_WINNOW_W - 1}
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM m WHERE rk = 1),
    cold AS (
      SELECT doc_id, h FROM fp
      WHERE h IN (SELECT h FROM fp GROUP BY h
                  HAVING COUNT(*) <= {_WINNOW_MAX_DF})
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    ORDER BY id_a, id_b
    """,
    tags=("J5", "text", "fingerprint"),
    demoted=True,
)
def q_text_winnow_overlap_railed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-fingerprint rail's semantics, SQL-proven: same overlap
    pairs as q_text_winnow_overlap but with fingerprints shared by more
    than max_df=5 documents excluded BEFORE the pair join
    (the boilerplate cut — see ``fingerprint_overlap``); the oracle
    mirrors the cap with a HAVING on the fingerprint df."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return fingerprint_overlap(
        docs, min_shared=2, max_df=_WINNOW_MAX_DF
    ).orderBy("id_a", "id_b")
