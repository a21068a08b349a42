"""Semantic tests for incremental materialized-rollup maintenance:
merge-order/tree invariance (decimal state), CDC retraction, the
min/max-retraction refusal, and a persisted-state refresh round-trip —
the branches the oracle-parity split (q_matview_rollup) can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.operators.matview import (
    rollup_merge,
    rollup_read,
    rollup_retract,
    rollup_state,
)
from tests.conftest import SF_DIR_TINY

KEYS = ["l_returnflag", "l_linestatus"]
MEAS = ["l_quantity", "l_extendedprice"]


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=repr
    )


def test_merge_tree_invariance(spark):
    """Any merge order / tree shape over the same deltas produces the
    identical state — the decimal-sum guarantee the module documents."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    parts = [
        rollup_state(li.filter(F.col("l_orderkey") % 4 == i), KEYS, MEAS)
        for i in range(4)
    ]
    flat = rollup_read(rollup_merge(parts, KEYS, MEAS), MEAS)
    nested = rollup_read(
        rollup_merge(
            [
                rollup_merge(parts[:2], KEYS, MEAS),
                rollup_merge(parts[2:][::-1], KEYS, MEAS),
            ],
            KEYS,
            MEAS,
        ),
        MEAS,
    )
    direct = rollup_read(rollup_state(li, KEYS, MEAS), MEAS)
    assert _rows(flat) == _rows(direct)
    assert _rows(nested) == _rows(direct)


def test_retract_restores_base_state(spark):
    """state(base ∪ extra) − extra ≡ state(base) for the retractable
    stats, and a fully-retracted key disappears."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 < 9)
    extra = li.filter(F.col("l_orderkey") % 10 == 9)
    grown = rollup_merge(
        [rollup_state(d, KEYS, MEAS, minmax=False) for d in (base, extra)],
        KEYS,
        MEAS,
        minmax=False,
    )
    shrunk = rollup_retract(grown, extra, KEYS, MEAS)
    want = rollup_state(base, KEYS, MEAS, minmax=False)
    assert _rows(rollup_read(shrunk, MEAS)) == _rows(rollup_read(want, MEAS))

    # retracting EVERYTHING empties the view (n_rows <= 0 keys dropped)
    gone = rollup_retract(
        rollup_state(li, KEYS, MEAS, minmax=False), li, KEYS, MEAS
    )
    assert gone.count() == 0


def test_retract_refuses_minmax_state(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem").limit(10)
    state = rollup_state(li, KEYS, MEAS)  # minmax=True
    with pytest.raises(ValueError, match="minmax=False"):
        rollup_retract(state, li, KEYS, MEAS)


def test_persisted_state_refresh_roundtrip(spark, tmp_path):
    """The deployment shape: state parquet on disk, a delta merged in
    WITHOUT re-reading base facts, result ≡ full recompute."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 < 8)
    delta = li.filter(F.col("l_orderkey") % 10 >= 8)
    path = str(tmp_path / "state")
    rollup_state(base, KEYS, MEAS).write.parquet(path)
    stored = spark.read.parquet(path)
    refreshed = rollup_merge(
        [stored, rollup_state(delta, KEYS, MEAS)], KEYS, MEAS
    )
    direct = rollup_state(li, KEYS, MEAS)
    assert _rows(rollup_read(refreshed, MEAS)) == _rows(
        rollup_read(direct, MEAS)
    )
