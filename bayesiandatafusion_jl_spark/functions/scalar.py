"""Scalar functions (SURVEY §2.H): math, string, date, case, clamp, JSON.

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd. Transcendental
results (ln/exp) are rounded identically in both engines because libm vs
java.lang.Math can differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_fn_scalar_suite",
    oracle="""
    WITH li AS (
      SELECT CAST(l_orderkey AS BIGINT) * 10 + l_linenumber AS key,
             SQRT(l_extendedprice) AS root_price,
             CAST(CAST(LN(l_extendedprice) AS REAL) AS DOUBLE) AS ln_price,
             ABS(l_discount - 0.05) AS disc_dev,
             CAST(FLOOR(l_extendedprice) AS DOUBLE) AS floor_price,
             CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_price,
             POW(l_quantity, 2) AS qty_sq,
             CAST(CAST(l_quantity AS BIGINT) % 7 AS DOUBLE) AS qty_mod,
             LEAST(GREATEST(l_quantity, 5.0), 45.0) AS qty_clamped
      FROM lineitem WHERE l_quantity >= 1 AND l_orderkey % 7 = 0
    ),
    pt AS (
      SELECT CAST(p_partkey AS BIGINT) AS key,
             UPPER(p_brand) AS brand_up,
             SUBSTR(p_name, 1, 8) AS name8,
             CONCAT(p_brand, ':', p_type) AS brand_type,
             regexp_extract(p_type, '^([a-z]+)', 1) AS first_word,
             CAST(LENGTH(p_name) AS DOUBLE) AS name_len,
             CAST(CONTAINS(p_type, 'a') AS DOUBLE) AS has_a
      FROM part WHERE p_partkey % 5 = 0
    ),
    od AS (
      SELECT CAST(o_orderkey AS BIGINT) AS key,
             CAST(year(o_orderdate) AS DOUBLE) AS yr,
             CAST(month(o_orderdate) AS DOUBLE) AS mo,
             CAST(day(o_orderdate) AS DOUBLE) AS dom,
             CAST(date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) AS DOUBLE) AS days_since,
             CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
               AS month_start
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT 'math' AS op, key, 'root_price' AS metric,
           CAST(NULL AS VARCHAR) AS sval, root_price AS dval FROM li
    UNION ALL SELECT 'math', key, 'ln_price', NULL, ln_price FROM li
    UNION ALL SELECT 'math', key, 'disc_dev', NULL, disc_dev FROM li
    UNION ALL SELECT 'math', key, 'floor_price', NULL, floor_price FROM li
    UNION ALL SELECT 'math', key, 'ceil_price', NULL, ceil_price FROM li
    UNION ALL SELECT 'math', key, 'qty_sq', NULL, qty_sq FROM li
    UNION ALL SELECT 'math', key, 'qty_mod', NULL, qty_mod FROM li
    UNION ALL SELECT 'math', key, 'qty_clamped', NULL, qty_clamped FROM li
    UNION ALL SELECT 'string', key, 'brand_up', brand_up, NULL FROM pt
    UNION ALL SELECT 'string', key, 'name8', name8, NULL FROM pt
    UNION ALL SELECT 'string', key, 'brand_type', brand_type, NULL FROM pt
    UNION ALL SELECT 'string', key, 'first_word', first_word, NULL FROM pt
    UNION ALL SELECT 'string', key, 'name_len', NULL, name_len FROM pt
    UNION ALL SELECT 'string', key, 'has_a', NULL, has_a FROM pt
    UNION ALL SELECT 'date', key, 'yr', NULL, yr FROM od
    UNION ALL SELECT 'date', key, 'mo', NULL, mo FROM od
    UNION ALL SELECT 'date', key, 'dom', NULL, dom FROM od
    UNION ALL SELECT 'date', key, 'days_since', NULL, days_since FROM od
    UNION ALL SELECT 'date', key, 'month_start', month_start, NULL FROM od
    """,
    tags=("H1", "H2", "H3", "H6"),
)
def q_fn_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1+H2+H3+H6 in one op-tagged suite (the ``q_set_ops`` consolidation
    pattern): math over lineitem, string over part, date over orders, each
    leg unpivoted via ``stack`` into the common long schema
    ``(op, key, metric, sval, dval)`` so every scalar function stays
    value-checked row-by-row against the oracle while occupying ONE driver
    slot. Legs take a deterministic key-modulus subset to keep the driver
    compare bounded; the full-table wide forms remain as the demoted
    ``q_fn_math`` / ``q_fn_string`` / ``q_fn_date`` with identical local
    parity gates.

    Scale: map-only — filter + project + generator expand, no shuffle; the
    stack generator is whole-stage-codegen'd and the modulus filters push
    down to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_orderkey") % 7 == 0)
    )
    math_leg = li.select(
        (F.col("l_orderkey").cast("bigint") * 10 + F.col("l_linenumber")).alias("key"),
        F.sqrt("l_extendedprice").alias("root_price"),
        F.log("l_extendedprice").cast("float").cast("double").alias("ln_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").cast("double").alias("floor_price"),
        F.ceil("l_extendedprice").cast("double").alias("ceil_price"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).cast("double").alias("qty_mod"),
        F.least(F.greatest(F.col("l_quantity"), F.lit(5.0)), F.lit(45.0)).alias(
            "qty_clamped"
        ),
    ).selectExpr(
        "'math' AS op",
        "key",
        """stack(8,
             'root_price',  CAST(NULL AS STRING), root_price,
             'ln_price',    CAST(NULL AS STRING), ln_price,
             'disc_dev',    CAST(NULL AS STRING), disc_dev,
             'floor_price', CAST(NULL AS STRING), floor_price,
             'ceil_price',  CAST(NULL AS STRING), ceil_price,
             'qty_sq',      CAST(NULL AS STRING), qty_sq,
             'qty_mod',     CAST(NULL AS STRING), qty_mod,
             'qty_clamped', CAST(NULL AS STRING), qty_clamped
           ) AS (metric, sval, dval)""",
    )
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    string_leg = pt.select(
        F.col("p_partkey").cast("bigint").alias("key"),
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^([a-z]+)", 1).alias("first_word"),
        F.length("p_name").cast("double").alias("name_len"),
        F.col("p_type").contains("a").cast("double").alias("has_a"),
    ).selectExpr(
        "'string' AS op",
        "key",
        """stack(6,
             'brand_up',   brand_up,   CAST(NULL AS DOUBLE),
             'name8',      name8,      CAST(NULL AS DOUBLE),
             'brand_type', brand_type, CAST(NULL AS DOUBLE),
             'first_word', first_word, CAST(NULL AS DOUBLE),
             'name_len',   CAST(NULL AS STRING), name_len,
             'has_a',      CAST(NULL AS STRING), has_a
           ) AS (metric, sval, dval)""",
    )
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    date_leg = od.select(
        F.col("o_orderkey").cast("bigint").alias("key"),
        F.year("o_orderdate").cast("double").alias("yr"),
        F.month("o_orderdate").cast("double").alias("mo"),
        F.dayofmonth("o_orderdate").cast("double").alias("dom"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("double")
        .alias("days_since"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias(
            "month_start"
        ),
    ).selectExpr(
        "'date' AS op",
        "key",
        """stack(5,
             'yr',          CAST(NULL AS STRING), yr,
             'mo',          CAST(NULL AS STRING), mo,
             'dom',         CAST(NULL AS STRING), dom,
             'days_since',  CAST(NULL AS STRING), days_since,
             'month_start', month_start, CAST(NULL AS DOUBLE)
           ) AS (metric, sval, dval)""",
    )
    return math_leg.unionByName(string_leg).unionByName(date_leg)


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           SQRT(l_extendedprice) AS root_price,
           CAST(LN(l_extendedprice) AS REAL) AS ln_price,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
           POW(l_quantity, 2) AS qty_sq,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
           LEAST(GREATEST(l_quantity, 5.0), 45.0) AS qty_clamped
    FROM lineitem
    WHERE l_quantity >= 1
    """,
    tags=("H1", "H6"),
    demoted=True,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1+H6 — math functions (the log-IC50 transform family [api]) plus
    clamp-to-range (prediction clamping to the rating range [api],
    ``least(greatest(x, lo), hi)``).
    sqrt/abs/floor/ceil/pow-int/least/greatest are IEEE-exact (no
    normalization needed); ln is cast to float32 to absorb last-ulp libm
    differences."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("root_price"),
        F.log("l_extendedprice").cast("float").alias("ln_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.least(F.greatest(F.col("l_quantity"), F.lit(5.0)), F.lit(45.0)).alias(
            "qty_clamped"
        ),
    )


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_up,
           SUBSTR(p_name, 1, 8) AS name8,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_type, '^([a-z]+)', 1) AS first_word,
           CONTAINS(p_type, 'a') AS has_a
    FROM part
    """,
    tags=("H2",),
    demoted=True,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 — string functions over the part dimension."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^([a-z]+)", 1).alias("first_word"),
        F.col("p_type").contains("a").alias("has_a"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    """,
    tags=("H3",),
    demoted=True,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 — date/time functions over order timestamps."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    )


@register(
    "q_fn_events_suite",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN value > 50.0 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("H5", "H7", "A4"),
)
def q_fn_events_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5+H7+A4 consolidated: CASE-WHEN thresholding (the ``class_cut``
    binarization of the probit/AUC path [api]) and semi-structured JSON
    payload access (``from_json`` with a declared schema — JVM-side) share
    the SAME events-by-type grain, so both capability rows ride ONE
    partial-agg shuffle instead of two driver slots. Single forms stay
    demoted with identical local parity gates."""
    ev = load_table(spark, sf_dir, "events")
    pos = F.when(F.col("value") > 50.0, 1).otherwise(0)
    k = F.from_json("props", "k INT").getField("k")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pos).alias("n_pos"),
        F.sum(1 - pos).alias("n_neg"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "q_fn_case_probit",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN value > 50.0 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("H5",),
    demoted=True,
)
def q_fn_case_probit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 — CASE WHEN thresholding: the ``class_cut`` binarization used for
    the probit/AUC path [api]."""
    ev = load_table(spark, sf_dir, "events")
    pos = F.when(F.col("value") > 50.0, 1).otherwise(0)
    return ev.groupBy("event_type").agg(
        F.sum(pos).alias("n_pos"),
        F.sum(1 - pos).alias("n_neg"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_fn_clamp",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           LEAST(GREATEST(l_quantity, 5.0), 45.0) AS qty_clamped
    FROM lineitem
    """,
    tags=("H6",),
    demoted=True,
)
def q_fn_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 — clamp to range (prediction clamping to the rating range
    [api], ``least(greatest(x, lo), hi)``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest(F.col("l_quantity"), F.lit(5.0)), F.lit(45.0)).alias(
            "qty_clamped"
        ),
    )


@register(
    "q_fn_json_map",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("H7", "A4"),
    demoted=True,
)
def q_fn_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7+A4 — semi-structured (JSON payload) access + aggregation over
    extracted fields; ``from_json`` with a declared schema stays JVM-side
    (the A4 source-parsing capability, row-level form demoted as
    q_csv_json_source)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "q_udaf_group_median",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 4) AS med_qty,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4)
             AS med_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("K", "udaf"),
    demoted=True,
)
def q_udaf_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.K — custom aggregate via a GROUPED_AGG pandas UDF (Arrow-batched
    series → scalar), the one UDF class the surface didn't yet exercise
    (scalar pandas_udf: probit; applyInPandas: Gibbs kernels; mapInPandas:
    multimodal; UDTF: shingles). Exact per-group median with pandas'
    linear interpolation — the same definition as DuckDB's quantile_cont,
    so the oracle hash-matches.

    Scale honesty: a grouped-agg pandas UDF has NO partial aggregation —
    every raw row shuffles to its group's reducer, and one group must fit
    one Arrow batch. That is acceptable for bounded groups (here: 3 return
    flags × bounded quantities), and the built-in exact ``percentile`` /
    ``approx_percentile`` (map-side combining sketches) is the production
    path for data-scaled groups; this query exists to pin the UDAF API
    surface, not to replace them. Demoted: the driver surface is capped at
    50; parity-gated locally like every demoted spec.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _median(v):
        return float(v.median())

    # annotations set as OBJECTS, not strings: this module's postponed
    # annotations (`from __future__ import annotations`) would otherwise
    # leave pandas_udf's eval-type inference with unresolvable strings
    _median.__annotations__ = {"v": pd.Series, "return": float}
    median_udaf = pandas_udf(_median, "double")

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(median_udaf(F.col("l_quantity").cast("double")), 4).alias("med_qty"),
        F.round(
            median_udaf(F.col("l_extendedprice").cast("double")), 4
        ).alias("med_price"),
    )
