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

Symbol grain (r12): ``grain="char"`` (the r11 behavior — fine for ASCII
corpora) or ``grain="byte"`` — UTF-8 bytes remapped through the GPT-2
byte↔unicode table (the public ``bytes_to_unicode`` construction from
GPT-2's encoder.py) so every possible input byte is a printable,
collision-free symbol and non-ASCII corpora tokenize correctly. On pure
ASCII the byte mapping is a per-char bijection, so merge learning is
isomorphic and token COUNTS are identical to char-grain (tested);
counts diverge only where multi-byte characters exist. GPT-2-style
pretoken boundaries via the module's shared ``_BPE_PRETOKEN_RE`` on
lowercased text — merges never cross a pretoken boundary, exactly like
GPT-2's encoder (Sennrich et al. 2016 for BPE; the merge-application
loop is the standard public algorithm from GPT-2's encoder.py).

Persistence (r12): ``save_bpe`` / ``load_bpe`` write the merge table to
parquet under a tokenizer dir with a one-row meta pinning (num_merges,
grain, pretokenizer fingerprint, merge-table fingerprint) — the same
pin/check discipline as the vector index's ``index_meta``. Two jobs
that encode via the same tokenizer dir are guaranteed the same
vocabulary; a dir written under a different pretokenizer version (or a
corrupted merges frame) is REFUSED at load, never silently mixed.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BPE_TRAIN_MAX_ROWS = 20_000

# non-capturing twin of text._BPE_PRETOKEN_RE (Python re.findall would
# return the inner group of the contraction branch, not the full match)
_PRETOKEN_PAT = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9']+"
)


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_PAT.findall(text.lower())


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's public byte↔unicode table: every byte value maps to a
    distinct printable unicode char (identity on most printable latin-1,
    the rest shifted past U+0100), so byte-grain BPE runs on strings."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_SYM = _bytes_to_unicode()
_SYM_BYTE = {c: b for b, c in _BYTE_SYM.items()}

_GRAINS = ("char", "byte")


def _symbolize(word: str, grain: str) -> str:
    """A pretoken as its initial symbol string for ``grain``: the chars
    themselves, or its UTF-8 bytes through the GPT-2 proxy table."""
    if grain == "char":
        return word
    return "".join(_BYTE_SYM[b] for b in word.encode("utf-8"))


def _check_grain(grain: str) -> None:
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")


def train_bpe(
    texts: list[str], num_merges: int, grain: str = "char"
) -> list[tuple[str, str]]:
    """Learn a merge table from raw texts (pure Python, driver-side).

    Greedy BPE: count adjacent symbol pairs across all pretokens (weighted
    by pretoken frequency), merge the most frequent pair, repeat. Ties
    break deterministically to the lexicographically smallest pair, so the
    table is a pure function of the text multiset — any sample order or
    partitioning yields the identical table."""
    _check_grain(grain)
    words = Counter()
    for t in texts:
        words.update(_symbolize(w, grain) for w in pretokenize(t))
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
        tied = (p for p, c in pair_counts.items() if c == mx)
        if grain == "byte":
            # tie-break on the UNDERLYING byte sequences, not the proxy
            # chars (whose code points sort differently — space → Ġ):
            # keeps merge selection isomorphic to char-grain on pure
            # ASCII, so counts diverge only where multi-byte chars exist
            best = min(
                tied,
                key=lambda p: tuple(
                    tuple(_SYM_BYTE[ch] for ch in s) for s in p
                ),
            )
        else:
            best = min(tied)
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
    grain: str = "char",
) -> list[tuple[str, str]]:
    """Deterministic bounded-sample trainer over a DataFrame (see module
    docstring for why the sample, not the corpus, is the training set)."""
    from bayesiandatafusion_jl_spark.functions.vector import (
        bounded_identity_sample,
    )

    sample = bounded_identity_sample(df, id_col, _BPE_TRAIN_MAX_ROWS)
    texts = [r[0] for r in sample.select(text_col).collect()]
    return train_bpe(texts, num_merges, grain=grain)


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


# Per-PROCESS pretoken→tokens cache, keyed by the merge-table
# fingerprint: a module-level dict survives across Arrow batches AND
# across tasks within a reused Python worker (a closure-local cache —
# the r11 shape — was rebuilt per batch, defeating the Zipf
# amortization the docstring promises). Bounded: cleared when it
# outgrows the cap (Zipf means the head re-fills instantly).
_PRETOKEN_CACHE: dict[str, dict[str, tuple]] = {}
_PRETOKEN_CACHE_MAX = 1 << 17


def _fingerprint(s: str) -> int:
    """Stable 28-bit content fingerprint (sha256 prefix) — fits the
    32-bit-int index_meta row; guards against accidental drift, not an
    adversary, so 28 bits is plenty."""
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:7], 16)


def _pretok_fp() -> int:
    """Fingerprint of the pretokenizer this module currently applies —
    pinned at save, checked at load: merges learned under a different
    pretokenization are meaningless to apply here."""
    return _fingerprint("lower|" + _PRETOKEN_PAT.pattern)


def _merges_content(merges: list[tuple[str, str]], grain: str) -> str:
    return grain + "|" + ";".join(repr(p) for p in merges)


def _merges_fp(merges: list[tuple[str, str]], grain: str) -> int:
    return _fingerprint(_merges_content(merges, grain))


def _merges_key(merges: list[tuple[str, str]], grain: str) -> str:
    """Full sha256 hex of the merge table — the CACHE key. The 28-bit
    ``_merges_fp`` exists only to fit the int meta row (drift guard);
    a cache keyed on 28 bits could collide two vocabularies in one
    process and silently serve wrong tokens."""
    return hashlib.sha256(
        _merges_content(merges, grain).encode("utf-8")
    ).hexdigest()


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    out_prefix: str = "bpe",
    grain: str = "char",
    tokenizer_dir: str | None = None,
) -> DataFrame:
    """Encode ``text_col`` under a trained merge table, appending
    ``<out_prefix>_tokens`` (array<string>) and ``<out_prefix>_n_tokens``.

    Pass EITHER ``merges`` (+ its ``grain``) or ``tokenizer_dir`` — the
    persisted, meta-pinned artifact from ``save_bpe``. The dir form is
    the production path: every job encoding through the same dir is
    guaranteed the same vocabulary, and a stale/foreign artifact is
    refused at load instead of silently mixing token spaces.

    The ranks table ships to executors once (SparkContext broadcast);
    the UDF is Arrow-batched with a per-worker-process pretoken cache
    (module-level, fingerprint-keyed — persists across batches and
    tasks). The column mirrors the text scan — map-only, no exchange."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if (merges is None) == (tokenizer_dir is None):
        raise ValueError("pass exactly one of merges / tokenizer_dir")
    if tokenizer_dir is not None:
        merges, grain = load_bpe(spark, tokenizer_dir)
    _check_grain(grain)
    bc = spark.sparkContext.broadcast(
        {(a, b): i for i, (a, b) in enumerate(merges)}
    )
    fp = _merges_key(merges, grain)

    def _enc(texts):
        ranks = bc.value
        cache = _PRETOKEN_CACHE.setdefault(fp, {})
        out = []
        for t in texts:
            toks: list[str] = []
            for w in pretokenize(t or ""):
                got = cache.get(w)
                if got is None:
                    if len(cache) >= _PRETOKEN_CACHE_MAX:
                        cache.clear()
                    got = tuple(_encode_word(_symbolize(w, grain), ranks))
                    cache[w] = got
                toks.extend(got)
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


# --- persisted tokenizer artifact (r12) -------------------------------------


def save_bpe(
    spark: SparkSession,
    merges: list[tuple[str, str]],
    tokenizer_dir: str,
    grain: str = "char",
) -> None:
    """Persist a trained merge table: ``merges`` parquet (rank, a, b)
    plus a one-row ``meta`` pinning (num_merges, grain, pretokenizer
    fingerprint, merge-table fingerprint) — the index_meta discipline
    applied to the tokenizer, closing the silent-vocabulary-drift gap
    (two jobs encoding with different in-session tables)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        driver_frame,
        index_paths,
        write_meta,
    )

    _check_grain(grain)
    if not merges:
        raise ValueError("refusing to persist an empty merge table")
    merges_path, meta_path = index_paths(tokenizer_dir, "merges", "meta")
    driver_frame(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).write.mode("overwrite").parquet(merges_path)
    write_meta(
        spark,
        meta_path,
        "overwrite",
        num_merges=len(merges),
        grain=_GRAINS.index(grain),
        pretok_fp=_pretok_fp(),
        merges_fp=_merges_fp(merges, grain),
    )


def load_bpe(
    spark: SparkSession, tokenizer_dir: str
) -> tuple[list[tuple[str, str]], str]:
    """Load (merges, grain) from a ``save_bpe`` artifact, REFUSING a dir
    whose pinned pretokenizer differs from this module's (the merge
    table would be applied to different pretokens than it was learned
    on) or whose merges frame does not match its pinned fingerprint
    (torn/mixed write)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        check_meta,
        index_paths,
        read_meta,
    )

    merges_path, meta_path = index_paths(tokenizer_dir, "merges", "meta")
    check_meta(
        spark,
        meta_path,
        "this tokenizer was saved under a DIFFERENT pretokenizer — its"
        " merge table does not apply to the pretokens this module"
        " produces; retrain and re-save it",
        pretok_fp=_pretok_fp(),
    )
    meta = read_meta(spark, meta_path).asDict()
    grain = _GRAINS[meta["grain"]]
    rows = spark.read.parquet(merges_path).orderBy("rank").collect()
    merges = [(r["a"], r["b"]) for r in rows]
    if _merges_fp(merges, grain) != meta["merges_fp"]:
        raise ValueError(
            f"tokenizer at {tokenizer_dir} is corrupt: the merges frame"
            " does not match the fingerprint pinned in meta — refusing a"
            " mixed-vocabulary encode; re-save the tokenizer"
        )
    return merges, grain


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
