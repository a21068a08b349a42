"""Constructed-frame semantics for the table-expectation gate
(operators/checks.py): every check kind's violation counting, the
NULL/NaN rules, FK null-key exemption, and the raising gate form."""

from __future__ import annotations

import pytest

from bayesiandatafusion_jl_spark.operators.checks import (
    accepted_values,
    check_table,
    expect,
    foreign_key,
    in_range,
    not_null,
    unique,
)


def _report(df, checks):
    return {
        (r["check"], r["column"]): r["violations"]
        for r in check_table(df, checks).collect()
    }


def test_every_check_kind_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, 0.05, "A"),
            (1, 2.0, 0.10, "N"),     # dup key with row 1... (k=1 twice)
            (2, None, 0.30, "R"),    # null qty; discount out of range
            (3, float("nan"), -0.1, "X"),  # NaN qty; low discount; bad domain
            (None, 5.0, 0.15, "A"),  # null key: FK ignores, unique counts NULL key group
        ],
        "k int, qty double, disc double, flag string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "dk int")
    got = _report(
        df,
        [
            not_null("qty"),
            unique(["k"]),
            in_range("disc", 0.0, 0.2),
            accepted_values("flag", ["A", "N", "R"]),
            foreign_key(["k"], dim, ["dk"]),
        ],
    )
    assert got[("not_null", "qty")] == 2          # NULL + NaN
    # count(*) - count_distinct(k): 5 rows, distinct non-null k = 3 →
    # the NULL-key row and the duplicate both surface
    assert got[("unique", "k")] == 2
    assert got[("in_range", "disc")] == 2         # 0.30 and -0.1
    assert got[("accepted_values", "flag")] == 1  # 'X'
    assert got[("foreign_key", "k")] == 1         # k=3 orphan; NULL ignored


def test_clean_table_passes_and_gate_raises_on_dirty(spark):
    clean = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k int, qty double"
    )
    rep = check_table(clean, [not_null("qty"), unique(["k"])])
    assert all(r["passed"] for r in rep.collect())
    expect(clean, [not_null("qty"), unique(["k"])])  # no raise

    dirty = spark.createDataFrame(
        [(1, None), (1, 2.0)], "k int, qty double"
    )
    with pytest.raises(ValueError, match=r"not_null\(qty\): 1"):
        expect(dirty, [not_null("qty"), unique(["k"])])


def test_fk_only_checklist_and_arity_guard(spark):
    df = spark.createDataFrame([(1, 9)], "a int, b int")
    dim = spark.createDataFrame([(1, 8)], "x int, y int")
    got = _report(df, [foreign_key(["a", "b"], dim, ["x", "y"])])
    assert got[("foreign_key", "a,b")] == 1  # (1,9) not in dim
    with pytest.raises(ValueError, match="arity"):
        foreign_key(["a"], dim, ["x", "y"])
    with pytest.raises(ValueError, match="at least one"):
        check_table(df, [])
    with pytest.raises(ValueError, match="unknown check"):
        check_table(df, [{"kind": "nope"}])


def test_grouped_checks_isolate_broken_partition(spark):
    """A per-group report surfaces the one broken partition a global
    report would average away; groups with zero FK orphans still get a
    passed row."""
    df = spark.createDataFrame(
        [
            ("d1", 1, 1.0),
            ("d1", 2, 2.0),
            ("d2", 3, None),   # the broken day: null + orphan
            ("d2", 9, 4.0),    # 9 not in dim
        ],
        "day string, k int, qty double",
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "dk int")
    rep = {
        (r["day"], r["check"]): (r["violations"], r["passed"])
        for r in check_table(
            df,
            [not_null("qty"), foreign_key(["k"], dim, ["dk"])],
            by=["day"],
        ).collect()
    }
    assert rep[("d1", "not_null")] == (0, True)
    assert rep[("d1", "foreign_key")] == (0, True)  # zero-orphan group kept
    assert rep[("d2", "not_null")] == (1, False)
    assert rep[("d2", "foreign_key")] == (1, False)
