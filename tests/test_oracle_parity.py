"""The main correctness gate, run locally at sf0.001 (the driver runs the
same comparison at sf0.01): every registered query with an oracle must
match DuckDB on row count, schema, and order-insensitive values."""

from __future__ import annotations

import pytest

from bayesiandatafusion_jl_spark.registry import specs

from tests.conftest import SF_DIR_TINY
from tests.parity import compare

# Demoted specs (driver surface is capped at 50 queries) get the SAME
# local parity verification as registered ones.
ALL_SPECS = specs(include_demoted=True)
ORACLE_SPECS = [(name, s) for name, s in ALL_SPECS.items() if s.oracle is not None]
ROWS_ONLY_SPECS = [(name, s) for name, s in ALL_SPECS.items() if s.oracle is None]


def test_driver_surface_within_cap():
    # The driver hash-checks only the first 50 sorted registered queries;
    # everything registered must land inside that window.
    assert len(specs()) <= 50


DRIVER_VISIBLE = set(specs())


def _assert_no_perrow_decimal(name: str, df) -> None:
    """Registry lint (VERDICT r12 #1): driver-visible outputs must not
    carry per-row DecimalType columns. Decimal is an INTERNAL exact-sum
    device (functions/exprs.py) — always cast back to double (or emit
    cents as BIGINT) before the result surfaces, because Spark's Decimal
    keeps trailing zeros ('912.90') while DuckDB's fetch path can yield
    float64 ('912.9'), and any stringify-style value hash then diverges
    on a correct answer (the r12 q_join_bloom_pruned failure class)."""
    from pyspark.sql.types import DecimalType

    if name not in DRIVER_VISIBLE:
        return
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, (
        f"{name}: driver-visible output has per-row DECIMAL columns {bad}; "
        "cast to double or emit cents as BIGINT (see functions/exprs.py)"
    )


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_parity(spark, duck_tiny, name, spec):
    df = spec.fn(spark, SF_DIR_TINY)
    _assert_no_perrow_decimal(name, df)
    ok, msg = compare(df, duck_tiny, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name,spec", ROWS_ONLY_SPECS, ids=[n for n, _ in ROWS_ONLY_SPECS])
def test_rows_only_queries_run(spark, name, spec):
    df = spec.fn(spark, SF_DIR_TINY)
    _assert_no_perrow_decimal(name, df)
    # mirror the driver's weaker check: runs, stable schema, >=0 rows
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
