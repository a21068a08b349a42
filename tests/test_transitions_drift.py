"""Semantics of the r13 analytics additions: the event transition matrix
(operators/temporal.py) and the corpus KL drift monitor
(functions/text.py). Oracle parity runs in test_oracle_parity.py; these
pin the math on constructed inputs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.text import token_kl_drift
from bayesiandatafusion_jl_spark.operators.temporal import event_transitions


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2026, 1, 1, 0, m), u, t) for i, (u, m, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_transitions_probabilities(spark):
    # user 1: a->b->a->c ; user 2: a->b  =>  from a: b twice, c once
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
            (2, 0, "a"), (2, 1, "b")]
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out  # c is terminal; no pair crosses users
    assert abs(sum(p for (f, _), (_, p) in out.items() if f == "a") - 1) < 1e-12


def test_transitions_tie_break_is_deterministic(spark):
    # two events share a timestamp; event_id orders them
    rows = [(1, 0, "x"), (1, 5, "y"), (1, 5, "z")]
    out = {(r["from_type"], r["to_type"]) for r in
           event_transitions(_events(spark, rows)).collect()}
    assert out == {("x", "y"), ("y", "z")}


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_kl_zero_on_identical_corpora(spark):
    a = _docs(spark, ["alpha beta gamma", "beta gamma delta"])
    (row,) = token_kl_drift(a, a).collect()
    assert row["vocab"] == 4
    assert row["n_tokens_a"] == row["n_tokens_b"] == 6
    assert abs(row["kl_ab"]) < 1e-9 and abs(row["kl_ba"]) < 1e-9


def test_kl_detects_novel_mass_and_direction(spark):
    base = ["alpha beta gamma delta"] * 4
    a = _docs(spark, base)
    b = _docs(spark, base + ["zzz zzz zzz zzz zzz zzz zzz zzz"], start=100)
    (row,) = token_kl_drift(a, b).collect()
    assert row["kl_ab"] > 0.01  # b holds mass a never explains
    assert row["kl_ba"] > row["kl_ab"]  # the side that GAINED mass diverges more
    sym = token_kl_drift(b, a).collect()[0]
    assert abs(sym["kl_ab"] - row["kl_ba"]) < 1e-9  # arguments swap exactly


def test_transitions_session_gap_breaks_chain(spark):
    # user 1: a --1min--> b --2h--> c : with a 30-min gap only a->b stays
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (0, t0, 1, "a"),
            (1, t0 + timedelta(minutes=1), 1, "b"),
            (2, t0 + timedelta(minutes=121), 1, "c"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    full = {(r["from_type"], r["to_type"])
            for r in event_transitions(ev).collect()}
    assert full == {("a", "b"), ("b", "c")}
    gated = {(r["from_type"], r["to_type"])
             for r in event_transitions(ev, session_gap_s=1800).collect()}
    assert gated == {("a", "b")}


def test_transition_anomaly_scores_outlier_highest(spark):
    """Users following the dominant a->b->a pattern score low; the one
    user with never-seen-elsewhere transitions scores highest."""
    from bayesiandatafusion_jl_spark.operators.temporal import (
        transition_anomaly,
    )

    rows = []
    for u in range(1, 6):  # 5 conformists: a b a b a
        for j, t in enumerate("ababa"):
            rows.append((u, j, t))
    rows += [(9, 0, "a"), (9, 1, "x"), (9, 2, "a")]  # outlier: a->x->a
    out = {
        r["user_id"]: r["mean_nll"]
        for r in transition_anomaly(_events(spark, rows)).collect()
    }
    assert max(out, key=out.get) == 9
    assert all(out[9] > out[u] for u in range(1, 6))
    # conformists all score identically (same transition multiset)
    assert len({round(out[u], 9) for u in range(1, 6)}) == 1


def test_transitions_partition_invariance(spark):
    rows = [(i % 7, i % 13, "t" + str((i * 3) % 5)) for i in range(300)]
    ev = _events(spark, [(u, m % 60, t) for u, m, t in rows])
    a = sorted(map(tuple, event_transitions(ev).collect()))
    b = sorted(map(tuple, event_transitions(ev.repartition(17)).collect()))
    assert a == b
