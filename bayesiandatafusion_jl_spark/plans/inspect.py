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


def unpushed_filter_scans(df: DataFrame) -> list[str]:
    """Parquet-scan node ids that sit DIRECTLY beneath a Filter in the
    physical-plan tree yet pushed no predicates — the filter-stopped-
    pushing regression class (a predicate Catalyst once pushed into the
    scan now evaluated row-by-row above it). Tree adjacency is read
    from the formatted explain's tree section (a Filter within two
    lines above the scan — the ColumnarToRow wrapper sits between
    them); scans without an adjacent Filter are fine (full scans feeding
    aggregates push nothing by design)."""
    plan = formatted_plan(df)
    empty_scan_ids = set()
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) Scan parquet", block)
        if m and "PushedFilters: []" in block:
            empty_scan_ids.add(m.group(1))
    tree = plan.split("\n\n", 1)[0].splitlines()
    flagged = []
    for i, line in enumerate(tree):
        m = re.search(r"Scan parquet\s+\((\d+)\)\s*$", line)
        if not m or m.group(1) not in empty_scan_ids:
            continue
        above = " ".join(tree[max(0, i - 2): i])
        if re.search(r"Filter \(\d+\)", above):
            flagged.append(m.group(1))
    return flagged


def scale_report(df: DataFrame) -> dict:
    """One-dict scale readout for ANY DataFrame — the numbers a plan
    review reads before shipping a query to a 1000-executor cluster:

    - ``exchanges``      data shuffles (1-row scalar motions excluded)
    - ``broadcast_joins``/``sortmerge_joins``/``nestedloop_joins``
    - ``python_nodes``   Arrow/pandas/UDF operators (the slow path)
    - ``parquet_scans``  distinct scans (a duplicated subtree shows up
                         here as an extra scan — the transition-matrix
                         regression class)
    - ``cartesian``      True if any CartesianProduct survived planning
    - ``pushed_filters`` the per-scan pushed predicate lists

    Counts DETAIL-section headers (the ``(n) Op`` lines), so each
    operator is counted once — the audit-table discipline
    (plans/audit.py) exposed as a public API."""
    plan = formatted_plan(df)
    head = lambda op: len(re.findall(rf"^\(\d+\) {op}\b", plan, re.M))  # noqa: E731
    return {
        "exchanges": head("Exchange") - plan.count("Arguments: SinglePartition"),
        "broadcast_joins": head("BroadcastHashJoin")
        + head("BroadcastNestedLoopJoin"),
        "sortmerge_joins": head("SortMergeJoin"),
        "nestedloop_joins": head("BroadcastNestedLoopJoin")
        + head("CartesianProduct"),
        "python_nodes": len(
            re.findall(r"^\(\d+\) \S*(?:Python|Pandas|Arrow)\S*", plan, re.M)
        ),
        # (codegen span counts are deliberately absent: under AQE the
        # WholeStageCodegen annotations only exist after the plan
        # finalizes at execution, so any pre-execution count would lie)
        "parquet_scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        "cartesian": head("CartesianProduct") > 0,
        "pushed_filters": pushed_filters(df),
    }
