"""Broadcast-BPE tokenizer: bounded-sample training, distributed encode.

Closes the gap between the GPT-2 PREtokenizer estimate
(``q_text_token_count``) and what a trainer actually sees: a real merge
table applied within each pretoken, so token counts and packing
capacities are tokenizer-grain, not whitespace-grain.

Split of labor (the quantizer-fit precedent, ``vector._spherical_kmeans``):

- **Training is bounded by construction.** BPE vocabularies are trained on
  a corpus SAMPLE in every production pipeline; here a deterministic
  identity-hash sample (``pmod(xxhash64(id))``, map-only, no shuffle) of at
  most ``_BPE_TRAIN_MAX_ROWS`` docs is collected and the merge table is
  learned in pure Python on the driver. The collect is corpus-size
  independent. (A from-scratch census trainer would be one
  ``groupBy(pair)`` per merge round — possible, never necessary.)
- **Encoding is distributed and map-only.** The merge-rank table ships to
  executors ONCE via a SparkContext broadcast (a 50k-merge GPT-2-sized
  table is ~1 MB — per-task closure capture would re-serialize it per
  task); the encode itself is an Arrow-batched pandas UDF with an LRU
  cache over pretokens (Zipf makes the hit rate extreme), zero shuffles:
  at 100 TB the encode rides the scan the pipeline already pays.

Character-grain symbols (the test corpora are ASCII; byte-grain is the
same algorithm over a different initial alphabet), GPT-2-style pretoken
boundaries via the module's shared ``_BPE_PRETOKEN_RE`` on lowercased
text — merges never cross a pretoken boundary, exactly like GPT-2's
encoder (Sennrich et al. 2016 for BPE; the merge-application loop is the
standard public algorithm from GPT-2's encoder.py).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BPE_TRAIN_MAX_ROWS = 20_000

# non-capturing twin of text._BPE_PRETOKEN_RE (Python re.findall would
# return the inner group of the contraction branch, not the full match)
_PRETOKEN_PAT = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9']+"
)


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_PAT.findall(text.lower())


def train_bpe(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Learn a merge table from raw texts (pure Python, driver-side).

    Greedy BPE: count adjacent symbol pairs across all pretokens (weighted
    by pretoken frequency), merge the most frequent pair, repeat. Ties
    break deterministically to the lexicographically smallest pair, so the
    table is a pure function of the text multiset — any sample order or
    partitioning yields the identical table."""
    words = Counter()
    for t in texts:
        words.update(pretokenize(t))
    seqs = {w: tuple(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += freq
        if not pair_counts:
            break
        mx = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == mx)
        merges.append(best)
        a, b = best
        ab = a + b
        for w, s in seqs.items():
            if a not in s or b not in s:
                continue
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def train_bpe_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
) -> list[tuple[str, str]]:
    """Deterministic bounded-sample trainer over a DataFrame (see module
    docstring for why the sample, not the corpus, is the training set)."""
    from bayesiandatafusion_jl_spark.functions.vector import (
        bounded_identity_sample,
    )

    sample = bounded_identity_sample(df, id_col, _BPE_TRAIN_MAX_ROWS)
    texts = [r[0] for r in sample.select(text_col).collect()]
    return train_bpe(texts, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the merge table to one pretoken — the standard loop: find the
    lowest-rank adjacent pair, merge every occurrence, repeat."""
    s: list[str] = list(word)
    while len(s) >= 2:
        pairs = {(s[i], s[i + 1]) for i in range(len(s) - 1)}
        bigram = min(pairs, key=lambda p: ranks.get(p, 1 << 60))
        if bigram not in ranks:
            break
        a, b = bigram
        ab = a + b
        out, i = [], 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_prefix: str = "bpe",
) -> DataFrame:
    """Encode ``text_col`` under a trained merge table, appending
    ``<out_prefix>_tokens`` (array<string>) and ``<out_prefix>_n_tokens``.

    The ranks table is broadcast once per session (SparkContext broadcast);
    the UDF is Arrow-batched with an in-executor LRU over pretokens. The
    column mirrors the text scan — map-only, no exchange."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {(a, b): i for i, (a, b) in enumerate(merges)}
    )

    def _enc(texts):
        from functools import lru_cache

        ranks = bc.value

        @lru_cache(maxsize=65536)
        def one(word: str) -> tuple[str, ...]:
            return tuple(_encode_word(word, ranks))

        out = []
        for t in texts:
            toks: list[str] = []
            for w in pretokenize(t or ""):
                toks.extend(one(w))
            out.append(toks)
        return pd.Series(out)

    # annotations as OBJECTS (q_udaf_group_median precedent): postponed
    # annotations would hand pandas_udf unresolvable strings
    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    enc = pandas_udf(_enc, "array<string>")

    tok_col = f"{out_prefix}_tokens"
    return df.withColumn(tok_col, enc(F.col(text_col))).withColumn(
        f"{out_prefix}_n_tokens", F.size(tok_col).cast("bigint")
    )


# --- registered specs ------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from bayesiandatafusion_jl_spark.catalog import load_table  # noqa: E402
from bayesiandatafusion_jl_spark.registry import register  # noqa: E402

_Q_NUM_MERGES = 200


@register(
    "q_text_bpe_token_count",
    oracle=None,  # the merge-application loop is not SQL-expressible;
    # equivalence vs a pure-Python reference + partition invariance are
    # pytest-gated (tests/test_bpe.py)
    tags=("text-tokens", "bpe"),
    demoted=True,
)
def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-grain token counting: corpus-self-trained BPE merge table
    (bounded deterministic sample) applied distributed; reports per-doc
    BPE-token counts next to the pretoken estimate so the budget error of
    the estimator is visible."""
    from bayesiandatafusion_jl_spark.functions.text import _BPE_PRETOKEN_RE

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe_corpus(docs, num_merges=_Q_NUM_MERGES)
    enc = bpe_encode(docs, merges)
    n_pre = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PRETOKEN_RE), F.lit(0))
    )
    return enc.select(
        "doc_id",
        F.col("bpe_n_tokens"),
        n_pre.cast("bigint").alias("n_pretokens"),
        F.round(F.col("bpe_n_tokens") / n_pre, 4).alias("bpe_per_pretoken"),
    )


@register(
    "q_llm_pack_bpe",
    oracle=None,  # packing arithmetic is oracle-checked at the whitespace
    # grain (q_llm_pack_sequences); this spec swaps in the BPE length
    # column, whose values SQL cannot derive
    tags=("packing", "bpe"),
    demoted=True,
)
def q_llm_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing driven by REAL tokenizer counts: encode under the
    corpus-trained merge table, then ``pack_sequences`` on the BPE length
    column — the capacity a trainer actually fills, not the whitespace
    estimate."""
    from bayesiandatafusion_jl_spark.functions.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe_corpus(docs, num_merges=_Q_NUM_MERGES)
    enc = bpe_encode(docs, merges).select("doc_id", "bpe_n_tokens")
    packed = pack_sequences(enc, ["doc_id"], "bpe_n_tokens", capacity=512)
    return packed.select("doc_id", "bpe_n_tokens", "bin_id", "offset")
