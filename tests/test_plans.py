"""Structural plan assertions: correctness at 100 TB is a PLAN property.

These pin the scale contract of representative queries — filters reach the
parquet scan, small dims broadcast, map-only suites stay exchange-free,
checkpoint-fed scorers never re-scan the corpus — so a regression that
keeps values right but breaks the plan (a dropped pushdown, a surprise
sort-merge join, a second corpus scan) fails loudly here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    n_exchanges,
    pushed_filters,
)
from bayesiandatafusion_jl_spark.registry import specs

from tests.conftest import SF_DIR_TINY

ALL = specs(include_demoted=True)


def _df(spark, name):
    return ALL[name].fn(spark, SF_DIR_TINY)


def test_filter_suite_pushes_predicates_and_stays_map_only(spark):
    df = _df(spark, "q_filter_suite")
    pushed = " ".join(pushed_filters(df))
    # range leg predicates reach the lineitem scan, IN/LIKE the customer scan
    assert "l_quantity" in pushed and "l_discount" in pushed, pushed
    assert "c_mktsegment" in pushed, pushed
    assert n_exchanges(df) == 0, formatted_plan(df)


def test_scalar_suite_is_map_only_with_pushdown(spark):
    df = _df(spark, "q_fn_scalar_suite")
    assert n_exchanges(df) == 0
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed, pushed


def test_events_suite_single_shuffle(spark):
    # H5+H7 share the events-by-type grain: ONE exchange total
    assert n_exchanges(_df(spark, "q_fn_events_suite")) == 1


def test_stream_windows_one_shuffle_per_leg(spark):
    assert n_exchanges(_df(spark, "q_stream_windows")) == 2


def test_multiway_join_broadcasts_dims(spark):
    df = _df(spark, "q_join_multiway")
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # the date filter pushes below the joins onto the orders scan
    assert any("o_orderdate" in p for p in pushed_filters(df)), plan


def test_broadcast_join_fact_side_never_shuffles_for_join(spark):
    df = _df(spark, "q_join_broadcast")
    assert has_broadcast_join(df)
    # only the final groupBy shuffles the joined stream
    assert n_exchanges(df) <= 1, formatted_plan(df)


def test_scan_project_prunes_columns(spark):
    df = _df(spark, "q_scan_project")
    plan = formatted_plan(df)
    i = plan.index("ReadSchema")
    line = plan[i : plan.index("\n", i)]
    # projection reaches the scan: absent columns are never read
    assert "l_comment" not in line and "l_tax" not in line, line


def test_lm_scorers_read_corpus_once(spark):
    """The returned plan of both LM scorers must feed from the checkpointed
    count frame — ZERO parquet scans (the corpus was read exactly once, at
    checkpoint build)."""
    from bayesiandatafusion_jl_spark.functions.text import bigram_nll, unigram_nll

    docs = load_table(spark, SF_DIR_TINY, "documents")
    for fn in (unigram_nll, bigram_nll):
        plan = formatted_plan(fn(docs))
        assert "Scan parquet" not in plan, plan[:2000]


def test_semi_anti_suite_filters_push_below_joins(spark):
    df = _df(spark, "q_join_semi_anti")
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed and "o_orderpriority" in pushed, pushed


def test_scale_report_counts_known_plan(spark):
    """scale_report on a plan with known structure: one broadcast join,
    one aggregation shuffle, pushed filter, no cartesian."""
    from bayesiandatafusion_jl_spark.plans.inspect import scale_report

    from bayesiandatafusion_jl_spark.catalog import load_table
    from tests.conftest import SF_DIR_TINY

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    orders = load_table(spark, SF_DIR_TINY, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    df = (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = scale_report(df)
    assert r["broadcast_joins"] == 1
    assert r["sortmerge_joins"] == 0 and not r["cartesian"]
    assert r["parquet_scans"] == 2
    assert r["exchanges"] >= 1  # the groupBy shuffle
    assert r["python_nodes"] == 0
    assert any("1-URGENT" in p for p in r["pushed_filters"])


# --- r14: hard-invariant CI gate over EVERY registered spec ----------------
#
# The audit snapshot (tests/test_scale_audit.py) catches DRIFT; this gate
# asserts the invariants that must hold absolutely, per spec, so a new
# query with a scale-killer plan fails by name on the first run:
#   - no CartesianProduct survived planning
#   - Python/Arrow nodes bounded (3: measured max is 2 across all 159
#     specs — the IVF-PQ assignment/codebook kernels)
#   - shuffle exchanges bounded (12: measured max is 10, the two-leg
#     hybrid RRF pipelines)
#   - no Filter sitting directly on a parquet scan that pushed nothing
#     (the filter-stopped-pushing regression class)

import pytest

from bayesiandatafusion_jl_spark.plans import audit as _audit
from bayesiandatafusion_jl_spark.plans.inspect import (
    scale_report,
    unpushed_filter_scans,
)

_GATED = [n for n in sorted(ALL) if n not in _audit.SKIP]


@pytest.mark.parametrize("name", _GATED)
def test_plan_hard_invariants(spark, name):
    df = ALL[name].fn(spark, SF_DIR_TINY)
    r = scale_report(df)
    assert not r["cartesian"], f"{name}: CartesianProduct survived planning"
    assert r["python_nodes"] <= 3, (
        f"{name}: {r['python_nodes']} Python/Arrow nodes — the slow path"
        " grew; justify and raise the cap only with a measured plan note"
    )
    assert r["exchanges"] <= 12, (
        f"{name}: {r['exchanges']} shuffle exchanges — a scale-killer"
        " shape at 100 TB; restructure or justify with a plan note"
    )
    bad = unpushed_filter_scans(df)
    assert not bad, (
        f"{name}: scan node(s) {bad} sit under a Filter that pushed"
        " NOTHING into the scan — pushdown regressed"
    )
