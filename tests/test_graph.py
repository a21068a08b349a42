"""connected_components (functions/graph.py) + deterministic sampling
(operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.graph import connected_components
from bayesiandatafusion_jl_spark.operators.sampling import (
    hash_sample,
    stratified_fixed_n,
)

from tests.conftest import SF_DIR_TINY


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_cc_chain(spark):
    # a long chain needs multi-hop propagation — the case a single
    # neighbor-min pass gets wrong
    n = 12
    lab = _labels(spark, [(i, i + 1) for i in range(n)])
    assert lab == {i: 0 for i in range(n + 1)}


def test_cc_multiple_components_and_orientation(spark):
    # two components, edges in mixed orientation with duplicates
    edges = [(5, 3), (3, 9), (9, 3), (20, 21), (21, 20), (22, 21)]
    lab = _labels(spark, edges)
    assert lab == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_cc_star_and_selfloop(spark):
    # hub-and-spoke plus a self-loop (must be ignored)
    edges = [(100, i) for i in range(5)] + [(7, 7)]
    lab = _labels(spark, edges)
    assert lab == {100: 0, 0: 0, 1: 0, 2: 0, 3: 0, 4: 0}
    assert 7 not in lab  # self-loop only => no edge, node dropped


def test_cc_matches_python_reference(spark):
    # pseudo-random graph vs a driver-side union-find on the same edges
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert _labels(spark, edges) == expect


def test_hash_sample_nests_and_is_partition_independent(spark):
    from bayesiandatafusion_jl_spark.catalog import load_table

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    ids = ["l_orderkey", "l_linenumber"]
    s10 = {tuple(r) for r in hash_sample(li, ids, 0.1).select(*ids).collect()}
    s30 = {tuple(r) for r in hash_sample(li, ids, 0.3).select(*ids).collect()}
    assert s10 and s10 < s30  # nesting: lower rate is a subset
    n = li.count()
    assert 0.05 * n < len(s10) < 0.15 * n  # rate lands near 10%
    # repartitioning must not change the selected rows
    s10b = {
        tuple(r)
        for r in hash_sample(li.repartition(13), ids, 0.1).select(*ids).collect()
    }
    assert s10 == s10b


def test_stratified_fixed_n_exact_quota(spark):
    from bayesiandatafusion_jl_spark.catalog import load_table

    c = load_table(spark, SF_DIR_TINY, "customer")
    out = stratified_fixed_n(c, ["c_nationkey"], ["c_custkey"], 7)
    per = {r["c_nationkey"]: r["n"] for r in
           out.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["c_nationkey"]: r["n"] for r in
             c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {k: min(7, v) for k, v in avail.items()}
    # deterministic under repartitioning
    a = sorted(map(tuple, out.select("c_custkey").collect()))
    b = sorted(
        map(
            tuple,
            stratified_fixed_n(c.repartition(11), ["c_nationkey"], ["c_custkey"], 7)
            .select("c_custkey")
            .collect(),
        )
    )
    assert a == b


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {0,1,2} (chain) and {5,6}; 3,4,7,8,9 untouched singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    from bayesiandatafusion_jl_spark.functions.graph import (
        dedup_keep_representatives,
    )

    kept = sorted(
        r["doc_id"] for r in dedup_keep_representatives(docs, pairs).collect()
    )
    assert kept == [0, 3, 4, 5, 7, 8, 9]
