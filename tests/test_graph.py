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


# ---------------------------------------------------------------- pagerank


def test_pagerank_cycle_uniform(spark):
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "u long, v long"
    )
    out = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=12).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(abs(v - 0.25) < 1e-15 for v in out.values())


def test_pagerank_star_center_dominates_and_sums_to_one(spark):
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    # spokes all point at the hub; hub points back at one spoke
    e = spark.createDataFrame(
        [(1, 99), (2, 99), (3, 99), (4, 99), (99, 1)], "u long, v long"
    )
    out = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=20).collect()}
    assert out[99] == max(out.values())
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    import random

    import numpy as np

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    rng = random.Random(3)
    edges = sorted({(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    ef = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: float(r["rank"]) for r in pagerank(ef, n_iter=10).collect()}

    nodes = sorted({x for pair in edges for x in pair})
    idx = {nd: i for i, nd in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        dang = r[deg == 0].sum()
        nr = np.zeros(n)
        for a, b in edges:
            nr[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - 0.85) / n + 0.85 * (nr + dang / n)
    assert max(abs(got[nd] - r[idx[nd]]) for nd in nodes) < 1e-12


def test_pagerank_dangling_mass_redistributed(spark):
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    # node 2 dangles: without redistribution total rank leaks each round
    e = spark.createDataFrame([(1, 2)], "u long, v long")
    out = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=15).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out[2] > out[1]


def test_pagerank_exact_partition_invariance(spark):
    import random

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    rng = random.Random(5)
    edges = sorted({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    ef = spark.createDataFrame(edges, "u long, v long")
    one = sorted((r["node"], r["rank"]) for r in pagerank(ef, n_iter=6).collect())
    many = sorted(
        (r["node"], r["rank"])
        for r in pagerank(ef.repartition(17), n_iter=6).collect()
    )
    assert one == many  # decimal sums -> bit-identical, not just close


def test_q_graph_pagerank_runs(spark):
    from bayesiandatafusion_jl_spark.registry import specs

    rows = (
        specs(include_demoted=True)["q_graph_pagerank"]
        .fn(spark, SF_DIR_TINY)
        .collect()
    )
    assert len(rows) > 0
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)  # top-ranked first


def test_ppr_uniform_teleport_equals_plain(spark):
    import random

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    rng = random.Random(9)
    edges = sorted({(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    ef = spark.createDataFrame(edges, "u long, v long")
    nodes = spark.createDataFrame(
        [(x,) for x in sorted({n for p in edges for n in p})], "node long"
    )
    plain = {r["node"]: float(r["rank"]) for r in pagerank(ef, n_iter=8).collect()}
    ppr = {
        r["node"]: float(r["rank"])
        for r in pagerank(ef, n_iter=8, teleport=nodes).collect()
    }
    assert max(abs(plain[n] - ppr[n]) for n in plain) < 1e-12


def test_ppr_mass_concentrates_on_seeds(spark):
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    # two cliques bridged by one edge; seed inside clique A
    a = [(i, j) for i in range(4) for j in range(4) if i != j]
    b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i != j]
    edges = a + b + [(3, 10), (10, 3)]
    ef = spark.createDataFrame(edges, "u long, v long")
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {
        r["node"]: float(r["rank"])
        for r in pagerank(ef, n_iter=20, teleport=seeds).collect()
    }
    mass_a = sum(v for k, v in out.items() if k < 10)
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert mass_a > 0.75  # seed clique holds the bulk of the mass
    assert out[0] == max(out.values())  # the seed itself ranks first


def test_ppr_rejects_foreign_seeds_and_ignores_partial(spark):
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    ef = spark.createDataFrame([(1, 2), (2, 1)], "u long, v long")
    with _pytest.raises(ValueError, match="seed"):
        pagerank(ef, teleport=spark.createDataFrame([(99,)], "node long"))
    # a mixed seed frame renormalizes over the present ones
    out = {
        r["node"]: float(r["rank"])
        for r in pagerank(
            ef, n_iter=10,
            teleport=spark.createDataFrame([(1,), (99,)], "node long"),
        ).collect()
    }
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out[1] > out[2]


def test_q_graph_ppr_runs(spark):
    from bayesiandatafusion_jl_spark.registry import specs

    rows = specs(include_demoted=True)["q_graph_ppr"].fn(spark, SF_DIR_TINY).collect()
    assert len(rows) > 0
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    assert sum(1 for r in rows if r["is_seed"]) == 3


def test_pagerank_convergence_stop(spark):
    """r13: with tol set, a fast-mixing graph stops well inside the
    budget, and the early-stopped ranks equal the full fixed-iteration
    run within tol. A complete graph converges immediately (uniform is
    the fixed point), so the stop must fire on round ~1."""
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    nodes = list(range(8))
    e = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b], "u long, v long"
    )
    st = {}
    early = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=30, tol=1e-9, stats=st).collect()
    }
    assert st["iterations"] < 30, st
    assert st["iterations"] <= 2, st  # uniform fixed point from round 1
    full = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=30).collect()
    }
    assert set(early) == set(full)
    assert all(abs(early[n] - full[n]) < 1e-9 for n in full)
    # mass conserved under the early stop
    assert abs(sum(early.values()) - 1.0) < 1e-9


def test_pagerank_tol_with_dangling_nodes(spark):
    """The convergence stop composes with the dangling-mass correction:
    a chain with a sink still sums to 1 and matches the fixed run."""
    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "u long, v long"
    )  # 4 is dangling
    st = {}
    early = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=60, tol=1e-10, stats=st).collect()
    }
    assert st["iterations"] < 60, st
    assert abs(sum(early.values()) - 1.0) < 1e-8
    fixed = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=60).collect()
    }
    assert all(abs(early[n] - fixed[n]) < 1e-8 for n in fixed)


def test_weighted_pagerank_matches_numpy(spark):
    """Weighted spread: contribution = rank·w/Σw per source. Verified
    against a dense numpy power iteration on the same weighted graph,
    plus exact partition invariance and mass conservation."""
    import numpy as np

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    edges = [  # (u, v, w) — node 3 dangling
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (1, 3, 2.0), (0, 1, 1.0),  # parallel edge: sums to w=4
    ]
    e = spark.createDataFrame(edges, "u long, v long, w double")
    got = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=25, weight_col="w").collect()
    }
    # numpy reference (parallel edge pre-summed)
    W = np.zeros((4, 4))
    for u, v, w in edges:
        W[u, v] += w
    # out= is REQUIRED with where=: without it the masked slots (the
    # dangling row) keep uninitialized memory, which turns the reference
    # into NaN whenever the allocator hands back a dirty buffer (observed
    # as an order-dependent flake in full-suite runs)
    rowsum = W.sum(1, keepdims=True)
    P = np.divide(W, rowsum, out=np.zeros_like(W), where=rowsum > 0)
    r = np.full(4, 0.25)
    for _ in range(25):
        dang = r[W.sum(1) == 0].sum()
        r = 0.15 * 0.25 + 0.85 * (r @ P + dang * 0.25)
    for n in range(4):
        assert abs(got[n] - r[n]) < 1e-9, (n, got[n], r[n])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # exact partition invariance (the decimal-gather discipline)
    got17 = {
        r2["node"]: r2["rank"]
        for r2 in pagerank(e.repartition(17), n_iter=25, weight_col="w").collect()
    }
    assert got17 == {
        r2["node"]: r2["rank"]
        for r2 in pagerank(e, n_iter=25, weight_col="w").collect()
    }


def test_weighted_pagerank_rejects_nonpositive_weights(spark):
    import pytest

    from bayesiandatafusion_jl_spark.functions.graph import pagerank

    e = spark.createDataFrame([(0, 1, 0.0), (1, 0, 1.0)], "u long, v long, w double")
    with pytest.raises(Exception) as ei:
        pagerank(e, n_iter=2, weight_col="w").collect()
    assert "weights must be > 0" in str(ei.value)
