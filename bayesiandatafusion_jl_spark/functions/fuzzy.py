"""Exact edit-distance similarity join (prefix-filtered q-gram blocking).

Finds ALL string pairs within Levenshtein distance ``d`` — exactly, not
approximately — without an all-pairs comparison. The blocking is the
classic prefix filter from the string-similarity-join literature
(Xiao et al., "Ed-Join", VLDB 2008; Chaudhuri et al., SSJoin — public
papers): if ed(a,b) <= d then the q-gram multisets of a and b share at
least max(|a|,|b|) - q + 1 - q*d occurrence-tagged grams, so under ANY
global total order on (gram, occ) elements, a and b must share at least
one element among each string's (q*d + 1) SMALLEST elements. Ordering by
ascending global frequency makes those prefix elements the RAREST grams,
so hot grams (the quadratic-blowup hazard of plain posting-list joins)
are sorted to the tails and never generate candidates.

The pipeline is all shrinking-key DataFrame ops:

1. gram explode (map-side ``transform(sequence(...))``), occurrence
   index per (id, gram) — one window on (id, gram);
2. global (gram, occ) frequency — one agg, joined back (broadcast-sized
   for real alphabets);
3. per-string prefix = q*d+1 smallest by (freq, gram, occ) — one window;
4. candidates = self-join of the PREFIX rows on (gram, occ) with
   id_a < id_b — only strings sharing a rare gram ever pair;
5. verify: length filter |len_a - len_b| <= d, then built-in
   ``levenshtein`` (JVM codegen, no UDF) <= d.

Exactness contract: every string must have length >= q*(d+1). Below
that, the count-filter bound can drop to 0 — a qualifying pair could
share NO gram and be silently missed — so the operator REFUSES short
strings loudly instead (bucket them separately; a short-string set is
tiny by definition and can be banded all-pairs by the caller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def edit_distance_join(
    strings: DataFrame,
    d: int,
    q: int = 2,
    id_col: str = "id",
    str_col: str = "s",
) -> DataFrame:
    """(id_a, id_b, dist): every unordered pair with levenshtein <= d,
    id_a < id_b — EXACT result, prefix-filtered candidate generation.

    ``strings``: one row per string. All strings must satisfy
    len >= q*(d+1) (raised inside the job otherwise — see module
    docstring for why shorter strings would make the filter lossy).
    """
    if d < 0:
        raise ValueError(f"d must be >= 0, got {d}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    min_len = q * (d + 1)
    base = strings.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("len"),
    )
    # in-job guard: assert_true rides the gram expression, so a too-short
    # string fails the action loudly instead of silently losing pairs
    guarded = base.withColumn(
        "s",
        F.when(
            F.assert_true(
                F.col("len") >= min_len,
                F.concat(
                    F.lit(
                        f"edit_distance_join: string shorter than q*(d+1)="
                        f"{min_len} breaks the prefix-filter exactness bound"
                        " — offending id="
                    ),
                    F.col("id").cast("string"),
                ),
            ).isNull(),
            F.col("s"),
        ),
    )

    grams = guarded.select(
        "id",
        "len",
        F.posexplode(
            F.expr(f"transform(sequence(1, len - {q} + 1), i -> substring(s, i, {q}))")
        ).alias("pos", "gram"),
    )
    occ = grams.withColumn(
        "occ",
        F.row_number().over(W.partitionBy("id", "gram").orderBy("pos")),
    ).select("id", "len", "gram", "occ")

    freq = occ.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("freq"))
    prefix_len = q * d + 1
    ranked = occ.join(F.broadcast(freq), ["gram", "occ"]).withColumn(
        "prk",
        F.row_number().over(
            W.partitionBy("id").orderBy("freq", "gram", "occ")
        ),
    )
    index = ranked.filter(F.col("prk") <= prefix_len).select(
        "id", "len", "gram", "occ"
    )

    a = index.select(
        F.col("id").alias("id_a"), F.col("len").alias("len_a"), "gram", "occ"
    )
    b = index.select(
        F.col("id").alias("id_b"), F.col("len").alias("len_b"), "gram", "occ"
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= d)
        .select("id_a", "id_b")
        .distinct()
    )

    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("s_a", "s_b").alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )


@register(
    "q_text_fuzzy_join",
    oracle="""
    WITH s AS (
      SELECT doc_id AS id, substr(text, 1, 24) AS s
      FROM documents WHERE doc_id < 300
    )
    SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s) AS dist
    FROM s a JOIN s b ON a.id < b.id
    WHERE levenshtein(a.s, b.s) <= 8
    """,
    tags=("J2", "text", "fuzzy"),
)
def q_text_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fuzzy self-join: all document pairs whose 24-char text
    prefixes are within edit distance 8 — the oracle is the brute-force
    all-pairs formulation, so parity here PROVES the prefix-filtered
    plan loses no pair and invents none."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    strings = docs.select(
        F.col("doc_id").alias("id"), F.substring("text", 1, 24).alias("s")
    )
    return edit_distance_join(strings, d=8, q=2)


# THE PPJoin filter expressions — one implementation for the one-shot
# join below AND the persisted incremental index (setsim_index.py),
# whose exactness contract is literal equality with this join: a drift
# between two copies of the eps handling or the positional bound would
# silently break that pin (r15 review). The 1e-9 down-nudge direction
# is load-bearing: float error may only LENGTHEN prefixes / admit extra
# candidates for the verify to kill, never lose a pair.
_PPJ_EPS = 1e-9


def ppjoin_prefix_len(tau: float, n):
    """Prefix length n − ceil(tau·n) + 1 for a set of size ``n``."""
    return n - F.ceil(F.lit(tau) * n - F.lit(_PPJ_EPS)) + F.lit(1)


def ppjoin_length_filter(tau: float):
    """tau·|a| ≤ |b| and tau·|b| ≤ |a| over (n_a, n_b) columns."""
    lo = lambda x: F.ceil(F.lit(tau) * x - F.lit(_PPJ_EPS))  # noqa: E731
    return (F.col("n_b") >= lo(F.col("n_a"))) & (
        F.col("n_a") >= lo(F.col("n_b"))
    )


def ppjoin_positional_filter(tau: float):
    """PPJoin bound over (n_a, prk_a, n_b, prk_b) columns: overlap via
    this collision ≤ 1 + min(|a|−i, |b|−j), required ≥ alpha."""
    alpha = F.ceil(
        F.lit(tau / (1.0 + tau)) * (F.col("n_a") + F.col("n_b"))
        - F.lit(_PPJ_EPS)
    )
    ubound = F.lit(1) + F.least(
        F.col("n_a") - F.col("prk_a"), F.col("n_b") - F.col("prk_b")
    )
    return ubound >= alpha


def _set_sim_candidates(
    tok: DataFrame, tau: float, positional_filter: bool = True
) -> DataFrame:
    """(id_a, id_b) candidate pairs from prefix collisions over a
    distinct (id, token) frame — the generation stage of
    ``set_similarity_join``, factored out so the positional filter's
    candidate reduction is directly measurable (pytest pins it on a
    planted boilerplate corpus). ``positional_filter=False`` is the
    prefix+length-only form, kept for that measurement — production
    callers never pass it."""
    sz = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    prefix_len = ppjoin_prefix_len(tau, F.col("n"))
    ranked = (
        tok.join(F.broadcast(freq), "token")
        .join(sz, "id")
        .withColumn(
            "prk",
            F.row_number().over(W.partitionBy("id").orderBy("freq", "token")),
        )
        .filter(F.col("prk") <= prefix_len)
        .select("id", "n", "token", "prk")
    )
    a = ranked.select(
        F.col("id").alias("id_a"), F.col("n").alias("n_a"), "token",
        F.col("prk").alias("prk_a"),
    )
    b = ranked.select(
        F.col("id").alias("id_b"), F.col("n").alias("n_b"), "token",
        F.col("prk").alias("prk_b"),
    )
    cand = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ppjoin_length_filter(tau))
    )
    if positional_filter:
        # PPJoin: overlap via THIS collision is at most the matching
        # token plus everything after it in both ordered lists
        cand = cand.filter(ppjoin_positional_filter(tau))
    return cand.select("id_a", "id_b").distinct()


def set_similarity_join(
    docs: DataFrame,
    tau: float,
    id_col: str = "id",
    text_col: str = "text",
    shingle_k: int | None = None,
) -> DataFrame:
    """(id_a, id_b, overlap, jaccard): every unordered pair of documents
    whose DISTINCT-token Jaccard similarity is >= ``tau`` — EXACT (the
    registered query's oracle IS brute-force all-pairs), candidate
    generation prefix-filtered so hot tokens never pair the corpus.

    The prefix filter (Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
    VLDB/ICDE — public papers): J(a,b) >= tau implies the overlap
    o >= tau·max(|a|,|b|), and two sets sharing >= alpha elements must
    intersect within their (|x| - alpha + 1)-prefixes under ANY shared
    total order. Ordering tokens by ascending global frequency puts the
    RAREST tokens in the prefixes, so candidates come from rare-token
    collisions; a boilerplate token shared by half the corpus sorts to
    the suffixes and generates nothing. A length filter
    (tau·|a| <= |b| <= |a|/tau) prunes the survivors before the exact
    verify (``array_intersect`` on the two token sets — JVM-side).

    The POSITIONAL filter (PPJoin proper, r14): each collision carries
    the token's position in both ordered lists, which bounds the best
    possible overlap at 1 + min(|a|−i, |b|−j); a collision whose bound
    is below the Jaccard-required alpha = ceil(tau·(|a|+|b|)/(1+tau))
    cannot witness a match and is dropped BEFORE the pair reaches the
    verify. Lossless: for a true match, the FIRST common token in the
    global order sits inside both prefixes and its o−1 remaining common
    tokens all sort after it in both lists, so that collision's bound
    >= o >= alpha. On boilerplate-heavy corpora (short docs of mostly
    hot tokens) this is the rail that keeps prefix collisions from
    ballooning candidates — exactness-preserving, unlike widening tau.

    The ceil() in the prefix length runs on a down-nudged product
    (tau·n − 1e-9): float error can only LENGTHEN the prefix — the
    direction that admits extra candidates for the verify to kill,
    never the one that silently loses a pair. The alpha ceil() is
    down-nudged the same way (extra candidates, never a lost pair).
    Zero-token documents are excluded (Jaccard is undefined on empty
    sets).

    ``shingle_k`` (r14): compare character k-shingle sets instead of
    word-token sets — the n-gram Jaccard form that survives word-order
    edits and agglutinative text where word tokens are too coarse (the
    EXACT counterpart of the MinHash estimate ``lsh_near_dup_pairs``
    approximates). The entire candidate machinery (rarest-element
    prefixes, length filter, positional bound) applies unchanged: the
    elements are just shingles.
    """
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    from bayesiandatafusion_jl_spark.session import checkpoint_df

    # the distinct-token frame feeds FOUR consumers (sizes, frequencies,
    # the ranked prefixes, the verify-side token sets) — checkpoint it so
    # the corpus is tokenized once, not once per consumer (the
    # unigram_nll one-scan discipline; pre-checkpoint this plan re-read
    # the documents 8 times)
    lowered = F.lower(F.col(text_col))
    if shingle_k is None:
        elem = F.explode(F.split(lowered, r"\s+"))
    else:
        if shingle_k < 1:
            raise ValueError(f"shingle_k must be >= 1, got {shingle_k}")
        # Sub-k-length guard (r15 ADVICE): sequence(1, n) with n <= 0 is
        # the DESCENDING array [1, .., n] in Spark, not empty — without
        # the filter a doc shorter than k gets its whole text as a
        # spurious shingle (two 3-char docs would pair at jaccard=1.0
        # while a brute shingle oracle emits nothing for them). Docs with
        # no full-length shingle have an EMPTY shingle set and are
        # excluded, exactly like zero-token docs in word mode. The guard
        # measures the LOWERED text — the string the shingles are cut
        # from — because lowercasing can change length (e.g. U+0130
        # expands to two code points), and a raw-length guard would drop
        # docs that DO have full-length lowered shingles.
        docs = docs.filter(F.length(F.lower(F.col(text_col))) >= shingle_k)
        elem = F.explode(
            F.expr(
                f"transform(sequence(1, length(lower({text_col}))"
                f" - {shingle_k} + 1),"
                f" i -> substring(lower({text_col}), i, {shingle_k}))"
            )
        )
    tok = checkpoint_df(
        docs.select(F.col(id_col).alias("id"), elem.alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    cand = _set_sim_candidates(tok, tau)
    sets = tok.groupBy("id").agg(F.sort_array(F.collect_set("token")).alias("toks"))
    pa = sets.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    pb = sets.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    verified = (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("overlap"),
            F.size("toks_a").alias("n_a"),
            F.size("toks_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("overlap")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
    )
    return verified.select(
        "id_a", "id_b", F.col("overlap").cast("bigint").alias("overlap"), "jaccard"
    )


@register(
    "q_text_set_sim_join",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id AS id, token FROM (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
        FROM documents WHERE doc_id < 400
      ) t WHERE token <> ''
    ),
    sz AS (SELECT id, COUNT(*) AS n FROM tok GROUP BY id),
    ov AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS o
      FROM tok a JOIN tok b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT ov.id_a AS id_a, ov.id_b AS id_b,
           CAST(ov.o AS BIGINT) AS overlap,
           ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) AS jaccard
    FROM ov
    JOIN sz na ON na.id = ov.id_a
    JOIN sz nb ON nb.id = ov.id_b
    WHERE ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) >= 0.5
    """,
    tags=("J2", "text", "set-similarity"),
    demoted=True,
)
def q_text_set_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 self-join over the first 400 documents'
    token sets (see ``set_similarity_join``) — the oracle is brute-force
    all-pairs, so parity PROVES the prefix filter loses no pair."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return set_similarity_join(docs, tau=0.5, id_col="doc_id")


_SHINGLE_K = 6


@register(
    "q_text_shingle_sim_join",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, s FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(1, GREATEST(LENGTH(LOWER(text)) - {_SHINGLE_K} + 2, 1)),
                 i -> substr(LOWER(text), i, {_SHINGLE_K}))) AS s
        FROM documents WHERE doc_id < 150
      ) t WHERE s <> ''
    ),
    sz AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    ov AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS o
      FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT ov.id_a AS id_a, ov.id_b AS id_b,
           CAST(ov.o AS BIGINT) AS overlap,
           ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) AS jaccard
    FROM ov
    JOIN sz na ON na.id = ov.id_a
    JOIN sz nb ON nb.id = ov.id_b
    WHERE ROUND(CAST(ov.o AS DOUBLE) / (na.n + nb.n - ov.o), 6) >= 0.8
    """,
    tags=("J2", "text", "set-similarity", "shingle"),
    demoted=True,
)
def q_text_shingle_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-6-shingle Jaccard >= 0.8 self-join over the first
    150 documents — the n-gram Jaccard member of the dedup family (exact
    counterpart of the MinHash/LSH estimate), same PPJoin candidate
    machinery as ``q_text_set_sim_join``; oracle is brute-force
    all-pairs, so parity proves the filters lossless on shingle sets
    too."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return set_similarity_join(
        docs, tau=0.8, id_col="doc_id", shingle_k=_SHINGLE_K
    )
