"""Declarative table expectations — the ingest gate for a 100 TB drop.

A data delivery is validated BEFORE it joins the corpus: nulls where a
contract says none, keys that stopped being unique, values outside their
domain, a fact table referencing dimension keys that don't exist. This
module compiles a declarative check list into ONE aggregate pass over
the table (every non-relational check is a conditional sum inside the
same hash aggregate — adding checks adds codegen expressions, not
scans), plus one broadcast anti-join per foreign-key check (the dim key
side is distinct-projected and broadcast; the fact side is never
shuffled).

Check constructors (each returns a plain dict):

- ``not_null(col)`` — no NULLs (NaN counts as a violation for floats).
- ``unique(cols)`` — (cols) is a key: duplicate rows are violations.
- ``in_range(col, lo, hi)`` — closed interval; NULLs ignored (pair with
  ``not_null`` when absence is itself a violation).
- ``accepted_values(col, values)`` — domain check; NULLs ignored.
- ``foreign_key(cols, dim, dim_cols)`` — every fact key exists in the
  dimension (NULL keys ignored, SQL FK semantics).

``check_table`` returns the report frame (check, column, violations,
passed); ``expect`` is the gate form — it raises naming every failed
check, because a silently-ignored red report is how bad drops get into
corpora. Inspired by the public expectation-testing tools (dbt tests /
Deequ / Great Expectations); re-derived as plain DataFrame aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col}


def unique(cols: list[str]) -> dict:
    return {"kind": "unique", "cols": list(cols)}


def in_range(col: str, lo, hi) -> dict:
    return {"kind": "in_range", "col": col, "lo": lo, "hi": hi}


def accepted_values(col: str, values: list) -> dict:
    return {"kind": "accepted_values", "col": col, "values": list(values)}


def foreign_key(cols: list[str], dim: DataFrame, dim_cols: list[str]) -> dict:
    if len(cols) != len(dim_cols):
        raise ValueError(f"foreign_key arity mismatch: {cols} vs {dim_cols}")
    return {"kind": "foreign_key", "cols": list(cols), "dim": dim,
            "dim_cols": list(dim_cols)}


def _is_bad_null(col: str) -> F.Column:
    c = F.col(col)
    # NaN ≠ NULL in Spark, but a contract that says "always present"
    # means a real value — try_cast keeps this safe on non-numeric types
    return c.isNull() | F.coalesce(
        F.isnan(c.try_cast("double")), F.lit(False)
    )


def check_table(
    df: DataFrame, checks: list[dict], by: list[str] | None = None
) -> DataFrame:
    """(…by cols, check, column, violations, passed) — one report row
    per check (per group when ``by`` is given: a global report can hide
    a wholly-broken partition inside a big healthy table — per-day /
    per-source grouping is how a 100 TB drop is actually audited).
    One aggregate pass either way; each foreign_key check adds one
    broadcast anti-join."""
    if not checks:
        raise ValueError("check_table needs at least one check")
    spark = df.sparkSession
    by = list(by or [])
    aggs, labels, fk_checks = [], [], []
    for i, ck in enumerate(checks):
        kind = ck["kind"]
        if kind == "not_null":
            aggs.append(
                F.sum(_is_bad_null(ck["col"]).cast("long")).alias(f"__v{i}")
            )
            labels.append((i, kind, ck["col"]))
        elif kind == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in ck["cols"]])
                ).alias(f"__v{i}")
            )
            labels.append((i, kind, ",".join(ck["cols"])))
        elif kind == "in_range":
            c = F.col(ck["col"])
            bad = c.isNotNull() & ((c < F.lit(ck["lo"])) | (c > F.lit(ck["hi"])))
            aggs.append(F.sum(bad.cast("long")).alias(f"__v{i}"))
            labels.append((i, kind, ck["col"]))
        elif kind == "accepted_values":
            c = F.col(ck["col"])
            bad = c.isNotNull() & ~c.isin(ck["values"])
            aggs.append(F.sum(bad.cast("long")).alias(f"__v{i}"))
            labels.append((i, kind, ck["col"]))
        elif kind == "foreign_key":
            fk_checks.append((i, ck))
            labels.append((i, kind, ",".join(ck["cols"])))
        else:
            raise ValueError(f"unknown check kind: {kind!r}")

    agg_row = df.groupBy(*by).agg(*aggs) if aggs else (
        df.select(*by).distinct() if by else None
    )
    for i, ck in fk_checks:
        cols, dim_cols = ck["cols"], ck["dim_cols"]
        dim_keys = (
            ck["dim"].select(*[F.col(d).alias(c) for c, d in zip(cols, dim_cols)])
            .distinct()
        )
        cond = F.lit(True)
        for c in cols:
            cond = cond & F.col(c).isNotNull()
        orphans = (
            df.filter(cond)
            .join(F.broadcast(dim_keys), cols, "left_anti")
            .groupBy(*by)
            .agg(F.count(F.lit(1)).alias(f"__v{i}"))
        )
        if agg_row is None:
            agg_row = orphans
        elif by:
            # left join keeps groups with ZERO orphans (absent from the
            # anti-join side) in the report
            agg_row = agg_row.join(orphans, by, "left").withColumn(
                f"__v{i}", F.coalesce(F.col(f"__v{i}"), F.lit(0))
            )
        else:
            agg_row = agg_row.crossJoin(F.broadcast(orphans))
    label_df = spark.createDataFrame(
        [(i, k, c) for i, k, c in labels], "__i int, check string, column string"
    )
    stacked = agg_row.select(
        *by,
        F.stack(
            F.lit(len(labels)),
            *[
                x
                for i, _, _ in labels
                for x in (F.lit(i), F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long"))
            ],
        ).alias("__i", "violations"),
    )
    return (
        stacked.join(F.broadcast(label_df), "__i")
        .select(
            *by,
            "check",
            "column",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy(*by, "check", "column")
    )


def expect(
    df: DataFrame, checks: list[dict], by: list[str] | None = None
) -> None:
    """The gate form: run ``check_table`` and RAISE naming every failed
    expectation (with its group when ``by`` is given) — an ingest
    pipeline must stop on a bad drop, not log past it."""
    by = list(by or [])
    failed = [
        r for r in check_table(df, checks, by=by).collect() if not r["passed"]
    ]
    if failed:
        detail = "; ".join(
            (f"[{', '.join(str(r[g]) for g in by)}] " if by else "")
            + f"{r['check']}({r['column']}): {r['violations']} violations"
            for r in failed[:20]
        )
        more = f" (+{len(failed) - 20} more)" if len(failed) > 20 else ""
        raise ValueError(f"table expectations failed — {detail}{more}")


@register(
    "q_table_checks",
    oracle="""
    WITH agg AS (
      SELECT
        SUM(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 1 ELSE 0 END)
          AS v_notnull,
        COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS v_unique,
        SUM(CASE WHEN l_discount IS NOT NULL
                  AND (l_discount < 0.0 OR l_discount > 0.2) THEN 1 ELSE 0 END)
          AS v_range,
        SUM(CASE WHEN l_returnflag IS NOT NULL
                  AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
          AS v_domain
      FROM lineitem
    ),
    fk AS (
      SELECT COUNT(*) AS v_fk
      FROM lineitem l
      WHERE l.l_orderkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT * FROM (
      SELECT 'accepted_values' AS "check", 'l_returnflag' AS "column",
             CAST(v_domain AS BIGINT) AS violations, v_domain = 0 AS passed
      FROM agg
      UNION ALL
      SELECT 'foreign_key', 'l_orderkey', CAST(v_fk AS BIGINT), v_fk = 0 FROM fk
      UNION ALL
      SELECT 'in_range', 'l_discount', CAST(v_range AS BIGINT), v_range = 0
      FROM agg
      UNION ALL
      SELECT 'not_null', 'l_quantity', CAST(v_notnull AS BIGINT), v_notnull = 0
      FROM agg
      UNION ALL
      SELECT 'unique', 'l_orderkey,l_linenumber', CAST(v_unique AS BIGINT),
             v_unique = 0
      FROM agg
    ) ORDER BY "check", "column"
    """,
    tags=("quality-gate", "maintenance"),
    demoted=True,
)
def q_table_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-gate report over lineitem: contract nulls, the
    (orderkey, linenumber) key, the discount domain, the returnflag
    domain, and referential integrity to orders — one aggregate pass
    plus one broadcast anti-join, hash-exact vs the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return check_table(
        li,
        [
            not_null("l_quantity"),
            unique(["l_orderkey", "l_linenumber"]),
            in_range("l_discount", 0.0, 0.2),
            accepted_values("l_returnflag", ["A", "N", "R"]),
            foreign_key(["l_orderkey"], orders, ["o_orderkey"]),
        ],
    )
