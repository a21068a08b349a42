"""Bloom-filter join pruning (operators/bloom.py): exactness of the
pruned join vs the plain join, superset/fpp semantics of the raw prune,
NULL-key handling, sizing, and the map-side plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
import bayesiandatafusion_jl_spark.operators.bloom as bloom_mod
from bayesiandatafusion_jl_spark.operators.bloom import (
    _bloom_params,
    bloom_build,
    bloom_pruned_join,
    bloom_semi_join,
)
from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan
from tests.conftest import SF_DIR_TINY


def test_bloom_params():
    m, k = _bloom_params(1000, 0.01)
    assert m % 64 == 0
    # textbook sizing: ~9.6 bits/key and ~7 hashes at 1% fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        _bloom_params(1000, 0.0)
    with pytest.raises(ValueError):
        _bloom_params(1000, 1.5)


def test_bloom_words_bounded(spark):
    keys = spark.range(5000).withColumnRenamed("id", "k")
    bm, m, k = bloom_build(keys, "k", fpp=0.01)
    assert len(bm) == m // 64  # dense bitmap: exactly m/64 words
    # a filter over n keys at 1% fpp has roughly half its bits set —
    # nearly every word is non-zero
    nonzero = sum(1 for w in bm if w != 0)
    assert nonzero >= m // 64 // 2


def test_bloom_semi_join_superset_and_fpp(spark):
    # dim holds 1k of 50k fact keys; the prune must keep ALL true
    # matches and at most ~fpp of the 49k non-matching rows
    fact = spark.range(50_000).withColumnRenamed("id", "k")
    dim = spark.range(1000).withColumnRenamed("id", "dk")
    kept = bloom_semi_join(fact, dim, "k", "dk", fpp=0.01).collect()
    kept_keys = {r["k"] for r in kept}
    assert set(range(1000)) <= kept_keys  # zero false negatives, ever
    fp = len(kept_keys) - 1000
    assert fp / 49_000 <= 0.03  # ≤ 3× the 1% budget


def test_bloom_null_fact_keys_never_pass(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (None,)], "k bigint"
    )
    dim = spark.createDataFrame([(1,), (None,)], "dk bigint")
    kept = {r["k"] for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert kept == {1}  # NULLs pruned on both sides (no NULL equi-match)


def test_bloom_pruned_join_exact_vs_plain_join(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    orders = load_table(spark, SF_DIR_TINY, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    plain = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    }
    for fpp in (0.3, 0.01):  # even a sloppy filter must stay exact
        pruned = {
            (r["l_orderkey"], r["l_linenumber"])
            for r in bloom_pruned_join(
                li, orders, "l_orderkey", "o_orderkey", fpp=fpp
            ).collect()
        }
        assert pruned == plain


def test_bloom_pruned_join_rejects_outer(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    orders = load_table(spark, SF_DIR_TINY, "orders")
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_pruned_join(li, orders, "l_orderkey", "o_orderkey", how="left")


def test_bloom_probe_is_map_side(spark):
    """The probe is a literal predicate over the fact scan: the plan
    must contain NO join and NO exchange of any kind — pruning happens
    strictly before any shuffle could."""
    fact = spark.range(10_000).withColumnRenamed("id", "k")
    dim = spark.range(100).withColumnRenamed("id", "dk")
    pruned = bloom_semi_join(fact, dim, "k", "dk")
    plan = formatted_plan(pruned)
    assert "Join" not in plan and "Exchange" not in plan, plan
    assert "Filter" in plan


def test_bloom_cross_type_keys_lose_no_matches(spark):
    """xxhash64 is type-sensitive: an INT fact key joined to a BIGINT dim
    (SQL coerces, the raw hashes would not) must still keep every true
    match — the probe casts the fact key to the dim key's dtype."""
    fact = spark.range(1000).select(F.col("id").cast("int").alias("k"))
    dim = spark.range(100).withColumnRenamed("id", "dk")  # bigint
    kept = {r["k"] for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert set(range(100)) <= kept
    joined = bloom_pruned_join(fact, dim, "k", "dk").collect()
    assert {r["k"] for r in joined} == set(range(100))


def test_bloom_size_cap_trips_with_sizing_math():
    """Absurd n_items refuses BEFORE any cluster work, naming the
    arithmetic — the guard that turns a 1.2 GB plan literal into a
    config message."""
    with pytest.raises(ValueError, match="bloom filter too large"):
        _bloom_params(1_000_000_000_000, 0.01)
    # the message carries the sizing numbers the operator needs
    with pytest.raises(ValueError, match="raise fpp"):
        _bloom_params(2_000_000_000, 0.001)
    # just under the cap still sizes normally
    m, k = _bloom_params(500_000_000, 0.01)
    assert m // 64 <= bloom_mod._BLOOM_MAX_WORDS


def test_bloom_broadcast_fallback_is_oracle_identical(spark, monkeypatch):
    """Above the literal threshold the probe switches to the broadcast +
    Arrow-batched lookup — same keys kept, same exact pruned-join result,
    still no exchange before the filter."""
    monkeypatch.setattr(bloom_mod, "_BLOOM_LITERAL_MAX_WORDS", 4)
    fact = spark.range(20_000).withColumnRenamed("id", "k")
    dim = spark.range(500).withColumnRenamed("id", "dk")
    kept = {r["k"] for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert set(range(500)) <= kept  # zero false negatives on the fallback
    assert (len(kept) - 500) / 19_500 <= 0.03
    # NULL keys still never pass
    nf = spark.createDataFrame([(1,), (None,)], "k bigint")
    nkept = {r["k"] for r in bloom_semi_join(nf, dim, "k", "dk").collect()}
    assert None not in nkept
    # pruned join stays exact through the fallback
    plain = {r["k"] for r in fact.join(dim, fact.k == dim.dk).collect()}
    pruned = {
        r["k"] for r in bloom_pruned_join(fact, dim, "k", "dk").collect()
    }
    assert pruned == plain
    # still no exchange/join in the probe plan (ArrowEvalPython is fine)
    plan = formatted_plan(bloom_semi_join(fact, dim, "k", "dk"))
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_bloom_pruned_join_same_name_key_coalesces(spark):
    """fact_key == dim_key must behave like fact.join(dim, [key]): ONE
    key column, referenceable downstream without ambiguity."""
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = bloom_pruned_join(fact, dim, "k")
    assert out.columns.count("k") == 1
    assert {r["k"] for r in out.select("k").collect()} == set(range(10))
