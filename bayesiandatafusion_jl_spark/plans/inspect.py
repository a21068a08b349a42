"""Physical-plan inspection helpers.

Used by tests/test_plans.py to assert scale properties *structurally*:
filters pushed to parquet, dims broadcast, shuffle counts bounded. A query
that is correct but plans a cartesian product or a full-column scan fails
these tests — correctness at 100 TB is a plan property, not just a result
property.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan.

    Counts DETAIL-section headers only — formatted explain prints every
    operator twice (tree + details), so a raw substring count doubles —
    and subtracts single-partition (1-row scalar) exchanges, which carry
    "SinglePartition" on the detail block's Arguments line, not inline.
    """
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) - plan.count(
        "Arguments: SinglePartition"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
