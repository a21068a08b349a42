from __future__ import annotations

import os

import duckdb
import pytest

from bayesiandatafusion_jl_spark.session import get_spark

SF_DIR_TINY = "/root/testdata/sf0.001"
SF_DIR_SMALL = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark("bdf-tests", cpus=cpus)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each table as a DuckDB view."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck_tiny():
    con = make_duck(SF_DIR_TINY)
    yield con
    con.close()
