"""Constructed-frame semantics for the ordered funnel: strict time
ordering within a user, chain breaks, out-of-order events, and recovery
by a later in-order occurrence — branches the sf-data parity check
(q_events_funnel) can't isolate."""

from __future__ import annotations

from datetime import datetime

from bayesiandatafusion_jl_spark.operators.temporal import funnel_steps


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_funnel_strict_order_semantics(spark):
    rows = []
    # u1: A@1 B@2 C@3 — full conversion
    rows += [(1, "A", _ts(1)), (1, "B", _ts(2)), (1, "C", _ts(3))]
    # u2: A@1 only — stops at step 1
    rows += [(2, "A", _ts(1))]
    # u3: B@1 A@2 — B happened BEFORE A: step 2 not reached
    rows += [(3, "B", _ts(1)), (3, "A", _ts(2))]
    # u4: B@1 A@2 B@3 — the later B recovers the chain
    rows += [(4, "B", _ts(1)), (4, "A", _ts(2)), (4, "B", _ts(3))]
    # u5: A@1 C@2 B@3 — C precedes B, so step 3 unreached (C strictly
    # after the user's B is required), step 2 reached
    rows += [(5, "A", _ts(1)), (5, "C", _ts(2)), (5, "B", _ts(3))]
    # u6: never did A — absent from the funnel entirely
    rows += [(6, "B", _ts(1)), (6, "C", _ts(2))]
    # u7: simultaneous A and B (same ts) — strict > means B not counted
    rows += [(7, "A", _ts(1)), (7, "B", _ts(1))]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(ev, ["A", "B", "C"]).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 7}
    assert got[1] == (_ts(1), _ts(2), _ts(3))
    assert got[2] == (_ts(1), None, None)
    assert got[3] == (_ts(2), None, None)
    assert got[4] == (_ts(2), _ts(3), None)
    assert got[5] == (_ts(1), _ts(3), None)
    assert got[7] == (_ts(1), None, None)


def test_funnel_earliest_qualifying_step_time(spark):
    """Repeated step events: t_i is the EARLIEST occurrence after
    t_{i-1}, not the latest and not a pre-chain one."""
    rows = [
        (1, "A", _ts(5)),
        (1, "B", _ts(2)),  # before A — ignored
        (1, "B", _ts(7)),  # first qualifying B
        (1, "B", _ts(9)),  # later B — ignored
        (1, "C", _ts(8)),  # before t2=7? no: 8 > 7 — qualifies
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    (r,) = funnel_steps(ev, ["A", "B", "C"]).collect()
    assert (r["t1"], r["t2"], r["t3"]) == (_ts(5), _ts(7), _ts(8))


def test_funnel_max_gap_conversion_window(spark):
    """max_gap bounds each transition: a step landing outside the window
    breaks the chain; an in-window occurrence converts even when an
    out-of-window one also exists."""
    rows = [
        # u1: B 90 min after A — outside a 30-minute window
        (1, "A", _ts(0)), (1, "B", datetime(2024, 1, 1, 1, 30)),
        # u2: B at +10 min (in window), C at +50 min after B (outside)
        (2, "A", _ts(0)), (2, "B", _ts(10)), (2, "C", datetime(2024, 1, 1, 1, 0)),
        # u3: one B inside the window, another outside — converts on the
        # in-window one; the qualifying min ignores the stray
        (3, "A", _ts(0)), (3, "B", _ts(20)), (3, "B", datetime(2024, 1, 1, 1, 30)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    got = {
        r["user_id"]: (r["t2"], r["t3"])
        for r in funnel_steps(ev, ["A", "B", "C"], max_gap="30 minutes").collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (_ts(10), None)
    assert got[3] == (_ts(20), None)
    # without the window, u1 converts on its late B
    loose = {
        r["user_id"]: r["t2"]
        for r in funnel_steps(ev, ["A", "B", "C"]).collect()
    }
    assert loose[1] is not None


def test_cohort_retention_semantics(spark):
    """Cohort = first-seen week; period_n counts whole weeks since; a
    user absent in a period doesn't count; period 0 retention is 1.0."""
    from bayesiandatafusion_jl_spark.operators.temporal import (
        cohort_retention,
    )

    w0 = datetime(2024, 1, 1)   # a Monday
    w1 = datetime(2024, 1, 8)
    w2 = datetime(2024, 1, 15)
    rows = [
        # cohort w0: u1 active w0,w1,w2; u2 active w0 only; u3 w0,w2
        (1, w0), (1, w1), (1, w2),
        (2, w0),
        (3, w0), (3, w2),
        # cohort w1: u4 active w1 twice (distinct-period dedup), w2
        (4, w1), (4, datetime(2024, 1, 9)), (4, w2),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r["cohort"].date().isoformat(), r["period_n"]): (
            r["users"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (3, 3, 1.0)
    assert got[("2024-01-01", 1)] == (1, 3, round(1 / 3, 4))
    assert got[("2024-01-01", 2)] == (2, 3, round(2 / 3, 4))
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1, 1.0)
    assert len(got) == 5
    import pytest as _pt

    with _pt.raises(ValueError, match="grain"):
        cohort_retention(ev, grain="month")
