"""Local replica of the driver's t2 compare: row count + schema (column
names) + order-insensitive value comparison between a Spark DataFrame and a
DuckDB oracle result.

Stricter than a hash: reports the first differing cells, so failures are
debuggable. Floats are compared exactly by default — queries are expected
to be formulated deterministically (decimal sums / matched rounding); a
tolerance is available only for diagnosing, not for passing.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).fetchdf()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        return False, f"schema mismatch: spark={s_cols} duck={d_cols}"
    if len(s_pdf) != len(d_pdf):
        return False, f"row count mismatch: spark={len(s_pdf)} duck={len(d_pdf)}"

    s_rows, d_rows = _canon(s_pdf), _canon(d_pdf)
    n_bad = 0
    first = ""

    def _typed(row):
        # The driver's hash distinguishes 742 (bigint) from 742.0 (HUGEINT →
        # float64), so `==` alone is too lenient: require matching types too.
        return tuple((type(v).__name__, v) for v in row)

    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if _typed(sr) != _typed(dr):
            n_bad += 1
            if not first:
                first = f"first diff at sorted-row {i} (cols={s_cols}):\n  spark={sr}\n  duck ={dr}"
    if n_bad:
        return False, f"{n_bad}/{len(s_rows)} rows differ; {first}"
    return True, f"OK ({len(s_rows)} rows)"
