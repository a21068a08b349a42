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


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC interop: values round-trip exactly, and the scan honors the
    same pushdown contract as parquet (filter reaches PushedFilters,
    projection prunes the read schema)."""
    import re

    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame(
        [(i, f"s{i}", i * 1.5) for i in range(100)],
        schema="id long, s string, v double",
    )
    path = str(tmp_path / "orc")
    io.write_orc(df, path)
    back = io.read_orc(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    q = back.filter(F.col("id") < 10).select("id", "v")
    assert q.count() == 10
    plan = formatted_plan(q)
    assert re.search(r"PushedFilters: \[.*id", plan), plan
    schema = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert schema and "s:" not in schema.group(1), plan


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
    import subprocess
    import sys as _sys

    # laziness is a subprocess property: resolving the names below would
    # import ml.bpmf in THIS process, so the bare-import check runs clean
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [_sys.executable, "-c",
         "import sys, bayesiandatafusion_jl_spark;"
         "assert 'bayesiandatafusion_jl_spark.ml.bpmf' not in sys.modules,"
         " 'package import eagerly pulled the ML stack'"],
        capture_output=True, text=True, cwd=str(repo_root),
    )
    assert out.returncode == 0, out.stderr

    import bayesiandatafusion_jl_spark as b

    for name in (
        "macau", "bpmf", "MacauTrainer", "TrainResult", "RelationData",
        "get_spark", "knn_topk", "ann_ivf_search", "lsh_near_dup_pairs",
        "dedup_keep_representatives",
    ):
        assert callable(getattr(b, name)), name
        assert name in dir(b)
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        b.no_such_symbol


def test_text_repetition_crafted_docs(spark):
    """Pin q_text_repetition semantics on crafted docs: a degenerate
    one-token-repeated doc, a no-repeat doc, and a single-token doc (whose
    n-gram columns must be NULL, not 0)."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.functions.text import q_text_repetition

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in q_text_repetition(spark, "", docs=docs).collect()
    }
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_distinct"]) == (4, 1)
    assert r1["dup_token_frac"] == 0.75
    # "a a" occurs 3 times out of 3 bigrams; "a a a" 2/2
    assert (r1["top_2gram_n"], r1["top_2gram_frac"]) == (3, 1.0)
    assert (r1["top_3gram_n"], r1["top_3gram_frac"]) == (2, 1.0)
    r2 = rows[2]
    assert (r2["n_tokens"], r2["n_distinct"]) == (4, 4)
    assert r2["dup_token_frac"] == 0.0
    assert (r2["top_2gram_n"], r2["top_2gram_frac"]) == (1, 0.3333)
    assert (r2["top_3gram_n"], r2["top_3gram_frac"]) == (1, 0.5)
    r3 = rows[3]
    assert (r3["n_tokens"], r3["n_distinct"]) == (1, 1)
    assert r3["top_2gram_n"] is None and r3["top_2gram_frac"] is None
    assert r3["top_3gram_n"] is None and r3["top_3gram_frac"] is None


def test_range_sorted_layout_prunes(spark, tmp_path):
    """write_range_sorted clusters the key space: per-file parquet footer
    min/max intervals are disjoint (so selective range predicates skip
    whole files at plan time), and the range filter reaches the scan as a
    pushed filter."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("payload")
    )
    path = str(tmp_path / "range_sorted")
    io.write_range_sorted(df, path, ["k"], n_partitions=8)

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) == 8
    spans.sort()
    for (_, prev_max), (cur_min, _) in zip(spans, spans[1:]):
        assert prev_max <= cur_min, spans  # disjoint up to boundary ties

    back = io.read_parquet(spark, path).filter(F.col("k") < 100)
    assert back.count() == df.filter(F.col("k") < 100).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(k,100)" in plan, plan

    with pytest.raises(ValueError, match="n_partitions"):
        io.write_range_sorted(df, path, ["k"], n_partitions=0)


def test_zordered_layout_clusters_both_dims(spark, tmp_path):
    """Z-order must give BOTH columns narrow per-file footer spans; the
    1-D range sort (the alternative) provably cannot: its secondary
    column spans ~the full range in every file."""
    import glob

    import pyarrow.parquet as pq

    df = (
        spark.range(40_000)
        .select(
            (F.col("id") % 200).cast("double").alias("x"),
            ((F.col("id") * 7919) % 200).cast("double").alias("y"),
        )
        .repartition(8)
    )
    zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "rsort")
    io.write_zordered(df, zpath, ["x", "y"], n_partitions=16)
    io.write_range_sorted(df, rpath, ["x"], n_partitions=16)

    def avg_spans(path, col_idx):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = min(
                md.row_group(rg).column(col_idx).statistics.min
                for rg in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(rg).column(col_idx).statistics.max
                for rg in range(md.num_row_groups)
            )
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    # full range is 199; z-order: both dims clustered (≈ range/sqrt(16))
    assert avg_spans(zpath, 0) < 100
    assert avg_spans(zpath, 1) < 100
    # 1-D sort: x tight but y unclustered — z-order's y is far tighter
    assert avg_spans(rpath, 0) < 30
    assert avg_spans(rpath, 1) > 150
    assert avg_spans(zpath, 1) < avg_spans(rpath, 1) / 2
    # content preserved
    back = spark.read.parquet(zpath)
    assert back.count() == 40_000


def test_zordered_validation(spark, tmp_path):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match=">= 2 columns"):
        io.write_zordered(df, str(tmp_path / "z1"), ["x"])
    df2 = df.withColumn("y", F.col("x"))
    with pytest.raises(ValueError, match="<= 62"):
        io.write_zordered(df2, str(tmp_path / "z2"), ["x", "y"], bits=32)


def test_shuffled_shards_layout_and_determinism(spark, tmp_path):
    """write_shuffled_shards: every shard directory holds ONE pos-sorted
    file; assignment is partition-count-invariant and seed-reproducible."""
    from bayesiandatafusion_jl_spark.operators.sampling import shuffle_shards

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {(r["doc_id"], r["pos"], r["shard"])
         for r in shuffle_shards(df, ["doc_id"], 8, seed=7).collect()}
    b = {(r["doc_id"], r["pos"], r["shard"])
         for r in shuffle_shards(df.repartition(13), ["doc_id"], 8, seed=7).collect()}
    assert a == b, "shard/pos assignment must not depend on partitioning"
    # all 8 shards populated, roughly balanced (loose 3x bound)
    import collections

    byshard = collections.Counter(s for _, _, s in a)
    assert set(byshard) == set(range(8))
    assert max(byshard.values()) < 3 * min(byshard.values())

    out = str(tmp_path / "shards")
    io.write_shuffled_shards(df, out, ["doc_id"], 8, seed=7)
    from pathlib import Path

    for k in range(8):
        files = [p for p in Path(out, f"shard={k}").glob("*.parquet")]
        assert len(files) == 1, f"shard {k}: expected one file, got {files}"
    # within-shard read order == pos order (single file, single partition)
    got = spark.read.parquet(out + "/shard=3").select("pos").collect()
    ps = [r["pos"] for r in got]
    assert ps == sorted(ps)
    # epoch re-seed is a different permutation of the same rows
    c = {(r["doc_id"], r["pos"]) for r in
         shuffle_shards(df, ["doc_id"], 8, seed=8).collect()}
    assert {d for d, _ in c} == {d for d, _, _ in a}
    assert c != {(d, p) for d, p, _ in a}
