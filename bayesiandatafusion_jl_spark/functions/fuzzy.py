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
