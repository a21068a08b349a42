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
