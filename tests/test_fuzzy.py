"""Exact edit-distance join (functions/fuzzy.py).

Oracle parity (q_text_fuzzy_join vs brute-force all-pairs DuckDB
levenshtein) runs in test_oracle_parity.py; here: constructed-pair
semantics, the short-string exactness guard, brute-force equivalence on
a randomized corpus, and partition invariance.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from bayesiandatafusion_jl_spark.functions.fuzzy import edit_distance_join


def _strings(spark, rows):
    return spark.createDataFrame(rows, "id bigint, s string")


def test_known_distances(spark):
    df = _strings(
        spark,
        [
            (1, "abcdefghij"),
            (2, "abcdefghij"),   # dist 0 to 1
            (3, "abcdefghiX"),   # dist 1 to 1/2
            (4, "XbcdeYghiZ"),   # dist 3 to 1/2
            (5, "zzzzzzzzzz"),   # far from everything
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, d=3, q=2).collect()
    }
    assert out[(1, 2)] == 0
    assert out[(1, 3)] == 1 and out[(2, 3)] == 1
    assert out[(1, 4)] == 3 and out[(2, 4)] == 3
    assert all(v <= 3 for v in out.values())
    assert not any(5 in pair for pair in out)


def test_short_string_guard_raises(spark):
    # q*(d+1) = 2*4 = 8; a 5-char string must fail the in-job guard
    df = _strings(spark, [(1, "abcdefgh"), (2, "abcde")])
    with pytest.raises(Exception, match="prefix-filter"):
        edit_distance_join(df, d=3, q=2).collect()


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    alphabet = "abcd"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(12, 16))))
        for i in range(120)
    ]
    df = _strings(spark, rows)
    d = 4
    fast = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, d=d, q=2).collect()
    }
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    brute = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.levenshtein("s_a", "s_b").alias("dist"))
        .filter(F.col("dist") <= d)
        .collect()
    }
    assert fast == brute
    assert len(brute) > 0  # the test corpus must actually exercise pairs


def test_partition_invariance(spark):
    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(10)))
        for i in range(80)
    ]
    df = _strings(spark, rows)
    one = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, d=3, q=2).collect()
    )
    many = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df.repartition(13), d=3, q=2).collect()
    )
    assert one == many and len(one) > 0


# --- set-similarity join (r13) ---------------------------------------------


def test_set_sim_join_exact_on_constructed_sets(spark):
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # with 2: overlap 3, union 6 -> 0.5
            (2, "a b c e f"),
            (3, "a b c d"),          # duplicate of 1 -> 1.0
            (4, "x y z"),            # disjoint from all
            (5, "a q r s t u v w"),  # shares only hot 'a' -> low jaccard
        ],
        "id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): (r["overlap"], r["jaccard"])
        for r in set_similarity_join(docs, tau=0.5).collect()
    }
    assert out[(1, 2)] == (3, 0.5)
    assert out[(1, 3)] == (4, 1.0)
    assert out[(2, 3)] == (3, 0.5)
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    # a tighter tau keeps only the exact duplicate
    only_dup = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(docs, tau=0.6).collect()
    }
    assert only_dup == {(1, 3)}


def test_set_sim_join_tau_rails(spark):
    import pytest

    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    docs = spark.createDataFrame([(1, "a b")], "id long, text string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="tau"):
            set_similarity_join(docs, tau=bad)
    # tau=1.0: only exact set matches survive
    docs2 = spark.createDataFrame(
        [(1, "a b"), (2, "b a a"), (3, "a b c")], "id long, text string"
    )
    rows = set_similarity_join(docs2, tau=1.0).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]


def test_set_sim_join_partition_invariance(spark):
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 9}" for j in range(1, 8))) for i in range(60)],
        "id long, text string",
    )
    a = sorted(map(tuple, set_similarity_join(docs, tau=0.6).collect()))
    b = sorted(
        map(tuple, set_similarity_join(docs.repartition(13), tau=0.6).collect())
    )
    assert a == b and a  # non-vacuous


def test_testdata_text_is_single_space_tokenizable(spark):
    """Pin the repo-wide oracle convention (r13 ADVICE): Spark tokenizes
    with split on \\s+ while the DuckDB oracles use string_split(text,
    ' ') — parity holds ONLY while the testdata text contains single
    spaces and no tabs/newlines/leading/trailing/double spaces. If the
    corpus generator ever changes, this fails loudly instead of letting
    q_text_set_sim_join / q_text_kl_drift (and every other text oracle)
    drift silently."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bad = docs.filter(
            F.col("text").rlike(r"[\t\n\r]|  |^ | $")
        ).count()
        assert bad == 0, (
            f"{sf_dir}: {bad} documents violate the single-space"
            " tokenization assumption the DuckDB text oracles depend on"
        )


def test_positional_filter_cuts_candidates_losslessly(spark):
    """r14 (VERDICT #3): a boilerplate-heavy corpus (short docs of
    mostly-hot shared tokens) balloons prefix collisions; the PPJoin
    positional filter must cut the candidate count while the final
    pair set stays EXACTLY equal to brute force."""
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        _set_sim_candidates,
        set_similarity_join,
    )

    # 80 docs sharing a 6-token boilerplate header, each with 2 tokens
    # of its own drawn from a small pool: prefixes are mostly the same
    # hot tokens, so prefix-only collisions approach all-pairs
    boiler = "terms of service apply contact support"
    docs = spark.createDataFrame(
        [
            # i and i+40 are exact duplicates (J=1): matches exist
            (i, f"{boiler} u{((i % 40) * 7) % 23} v{((i % 40) * 11) % 19}")
            for i in range(80)
        ],
        "id long, text string",
    )
    tau = 0.8
    tok = (
        docs.select(
            "id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    n_prefix_only = _set_sim_candidates(
        tok, tau, positional_filter=False
    ).count()
    n_positional = _set_sim_candidates(tok, tau).count()
    assert n_positional < n_prefix_only, (n_positional, n_prefix_only)
    # exactness against brute force on the same corpus
    toks = {
        r["id"]: set(r["text"].lower().split()) for r in docs.collect()
    }
    brute = set()
    ids = sorted(toks)
    for x in ids:
        for y in ids:
            if x < y:
                o = len(toks[x] & toks[y])
                if o / len(toks[x] | toks[y]) >= tau:
                    brute.add((x, y))
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(docs, tau=tau).collect()
    }
    assert got == brute and brute  # non-vacuous: some pairs must match


# --- winnowing fingerprints (r14, functions/text.py) -----------------------


def test_winnow_guarantees_and_overlap(spark):
    """Winnowing invariants (Schleimer et al.): gaps between selected
    positions <= w (density), any shared run of >= w+k-1 tokens yields a
    shared fingerprint (detection), and fingerprint_overlap surfaces the
    planted boilerplate pair without all-pairs work."""
    from bayesiandatafusion_jl_spark.functions.text import (
        fingerprint_overlap,
        winnow_fingerprints,
    )

    k, w = 4, 4
    shared = "common boilerplate run of many identical tokens here"  # 8 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {shared} delta epsilon zeta eta theta"),
            (2, f"one two three four five {shared} six seven eight nine"),
            (3, "totally different words with nothing in common at all"
                " whatsoever in any position of this entire document"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, w=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    # density: consecutive selections never more than w apart
    for positions in by_doc.values():
        ps = sorted(positions)
        assert all(b - a <= w for a, b in zip(ps, ps[1:])), ps
    # detection: docs 1 and 2 share the 8-token run (>= w+k-1 = 7)
    f1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    f2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    f3 = {r["fp"] for r in fps if r["doc_id"] == 3}
    assert f1 & f2
    assert not (f1 & f3) and not (f2 & f3)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in fingerprint_overlap(docs, k=k, w=w, min_shared=1).collect()
    }
    assert set(pairs) == {(1, 2)}
    # partition invariance: same selections at any layout
    a = sorted(map(tuple, winnow_fingerprints(docs, k=k, w=w).collect()))
    b = sorted(
        map(tuple, winnow_fingerprints(docs.repartition(7), k=k, w=w).collect())
    )
    assert a == b


def test_winnow_hot_fp_rail_cuts_boilerplate_fanout(spark):
    """r15 (VERDICT #2): a TRUE boilerplate fingerprint shared by N docs
    feeds ~N²/2 rows into the pair join before min_shared can prune —
    the max_df rail must (a) drop boilerplate-only pairs entirely while
    (b) keeping pairs that share COLD fingerprints, and (c) winnow_stats
    must report the exact pair-join input shrinkage so the cap is chosen
    from measurement, not guessed."""
    from bayesiandatafusion_jl_spark.functions.text import (
        fingerprint_overlap,
        winnow_stats,
    )

    boiler = (
        "this document is provided under the standard corporate"
        " license agreement terms"
    )  # 11 tokens >= w+k-1, so every carrier shares interior fps
    rows = [
        (i, f"unique{i}x opening{i} words{i} {boiler} trailing{i} close{i}")
        for i in range(1, 13)
    ]
    plag = "a genuinely plagiarized span of nine specific tokens here"
    rows += [
        (20, f"first20 second20 {plag} tail20"),
        (21, f"other21 leading21 {plag} end21"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unrailed = {
        (r["id_a"], r["id_b"])
        for r in fingerprint_overlap(docs, min_shared=1).collect()
    }
    railed = {
        (r["id_a"], r["id_b"])
        for r in fingerprint_overlap(docs, min_shared=1, max_df=5).collect()
    }
    # unrailed: all 66 boilerplate pairs + the true pair
    assert (20, 21) in unrailed and len(unrailed) == 66 + 1
    # railed: boilerplate pairs gone, the cold-fp pair survives
    assert railed == {(20, 21)}

    (st,) = winnow_stats(docs, max_df=5).collect()
    assert st["n_hot_fps"] >= 1
    assert st["pair_rows_railed"] < st["pair_rows"]
    # each hot fp alone contributes C(12,2)=66 pair rows
    assert st["pair_rows"] - st["pair_rows_railed"] >= 66
    assert st["fp_skew"] > 3.0
    # rail off: the railed column degenerates to the exact count
    (st0,) = winnow_stats(docs).collect()
    assert st0["pair_rows_railed"] == st0["pair_rows"]
    assert st0["n_hot_fps"] == 0


def test_winnow_matches_pure_python_reference(spark):
    """The one-pass window formulation equals an independent sequential
    reference (min of each w-window, rightmost on ties) on random-ish
    token streams."""
    import hashlib

    from bayesiandatafusion_jl_spark.functions.text import (
        _WINNOW_HEX,
        winnow_fingerprints,
    )

    k, w = 3, 5
    rows = [
        (d, " ".join(f"t{(d * 31 + i * 7) % 13}" for i in range(30)))
        for d in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = set()
    for d, text in rows:
        tk = text.lower().split()
        hs = [
            hashlib.sha256(" ".join(tk[i:i + k]).encode()).hexdigest()[:_WINNOW_HEX]
            for i in range(len(tk) - k + 1)
        ]
        for s in range(len(hs) - w + 1):
            window = hs[s:s + w]
            m = min(window)
            pos = s + max(i for i, h in enumerate(window) if h == m)
            want.add((d, pos, m))
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs, k=k, w=w).collect()
    }
    assert got == want and want


def test_shingle_similarity_join_semantics(spark):
    """Char-shingle mode: word-order edits keep high shingle Jaccard
    (caught) while word-token Jaccard is identical anyway; disjoint text
    never pairs; shingle_k rails."""
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                   # identical -> J = 1.0
            (3, base.replace("dog", "cat")),  # small char edit -> high J
            (4, "entirely unrelated words occupy this one xyz qrs tuv"),
        ],
        "id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(docs, tau=0.6, shingle_k=5).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.6 <= out[(1, 3)] < 1.0
    assert not any(4 in p for p in out)
    with pytest.raises(ValueError, match="shingle_k"):
        set_similarity_join(docs, tau=0.5, shingle_k=0)


def test_shingle_join_excludes_sub_k_docs(spark):
    """r15 ADVICE regression: sequence(1, n<=0) is DESCENDING in Spark,
    so pre-fix a doc shorter than shingle_k got its whole text as a
    spurious shingle and two 3-char docs paired at jaccard=1.0 while the
    brute oracle emits nothing. Sub-k docs have an EMPTY shingle set and
    must never pair — with each other OR with long docs."""
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "abc"),            # shorter than k=6 -> no shingles
            (2, "abc"),            # identical short twin -> still no pair
            (3, "xy"),
            (4, "abcabcabc"),      # contains doc 1's text -> no pair either
            (5, "zzzzzzzz"),
            (6, "zzzzzzzz"),       # the one real pair
        ],
        "id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(docs, tau=0.5, shingle_k=6).collect()
    }
    assert pairs == {(5, 6)}


def test_featurize_handles_single_token_docs(spark):
    """r15 companion fix: the bigram transform in the quality featurizer
    had the same descending-sequence hole — a single-token doc hit
    element_at(toks, 0), an ANSI error. Must featurize cleanly now."""
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        _featurize,
    )

    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two tokens")], "id long, text string"
    )
    rows = _featurize(docs).select("id", "features").collect()
    nnz = {r["id"]: r["features"].numNonzeros() for r in rows}
    assert nnz[1] == 1          # one unigram, no bigrams
    assert nnz[3] == 3          # two unigrams + one bigram


def test_winnow_hypothesis_vs_reference(spark):
    """Randomized corpora (seeded, bounded) against the sequential
    reference — same invariant as the deterministic test, wider input
    coverage: repeated tokens, short docs below the window, ties."""
    import hashlib
    import random

    from bayesiandatafusion_jl_spark.functions.text import (
        _WINNOW_HEX,
        winnow_fingerprints,
    )

    for seed, k, w in ((3, 3, 4), (11, 4, 3), (42, 2, 6)):
        rng = random.Random(seed)
        rows = [
            (
                d,
                " ".join(
                    f"w{rng.randint(0, 5)}" for _ in range(rng.randint(1, 25))
                ),
            )
            for d in range(8)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        want = set()
        for d, text in rows:
            tk = text.lower().split()
            hs = [
                hashlib.sha256(" ".join(tk[i:i + k]).encode())
                .hexdigest()[:_WINNOW_HEX]
                for i in range(max(len(tk) - k + 1, 0))
            ]
            for s in range(len(hs) - w + 1):
                window = hs[s:s + w]
                m = min(window)
                pos = s + max(i for i, h in enumerate(window) if h == m)
                want.add((d, pos, m))
        got = {
            (r["doc_id"], r["pos"], r["fp"])
            for r in winnow_fingerprints(docs, k=k, w=w).collect()
        }
        assert got == want, (seed, k, w)


def test_shingle_guard_measures_lowered_length(spark):
    """r15 review: lowercasing can LENGTHEN a string (U+0130 'İ'
    lowercases to two code points on the JVM), and shingles are cut
    from lower(text) — the sub-k guard must measure the lowered form,
    or raw-5-char docs with valid lowered 6-shingles get dropped."""
    from bayesiandatafusion_jl_spark.functions.fuzzy import (
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [(1, "AİBİC"), (2, "AİBİC")],
        "id long, text string",
    )
    (n,) = docs.select(F.length(F.lower("text")).alias("n")).distinct().collect()
    if n["n"] < 6:
        import pytest as _pytest

        _pytest.skip("lowercasing did not expand on this JVM locale")
    pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in set_similarity_join(docs, tau=0.5, shingle_k=6).collect()
    }
    assert pairs == {(1, 2, 1.0)}
