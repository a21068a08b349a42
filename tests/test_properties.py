"""Property-based tests (SURVEY §5.2) — kernel-level invariants with
hypothesis (pure numpy/pandas, no Spark session needed) plus split
determinism on Spark."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from bayesiandatafusion_jl_spark.ml import kernels


def _random_cells(rng, n_inst, k, max_deg):
    rows = []
    for i in range(n_inst):
        deg = int(rng.integers(1, max_deg + 1))
        for _ in range(deg):
            rows.append(
                (
                    i,
                    float(rng.standard_normal()),
                    rng.standard_normal(k),
                    float(rng.uniform(0.5, 4.0)),
                    int(rng.integers(0, 4)),
                )
            )
    return pd.DataFrame(
        rows, columns=["__id", "__val", "__fac", "__alpha", "__salt"]
    )


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    k=st.integers(2, 8),
    n_inst=st.integers(1, 12),
    max_deg=st.integers(1, 20),
)
def test_salted_partials_equal_one_phase(seed, k, n_inst, max_deg):
    """partial_stats → combine_sample ≡ sample_block for any cell layout
    (same RNG keys; statistics differ only by float associativity)."""
    rng = np.random.default_rng(seed)
    pdf = _random_cells(rng, n_inst, k, max_deg)
    mu = rng.standard_normal(k)
    a = rng.standard_normal((k, k))
    lam = a @ a.T + k * np.eye(k)

    one = kernels.sample_block(
        pdf, k, 1.0, mu, lam, seed=seed, sweep=3, alpha_col="__alpha"
    ).set_index("id")
    partials = kernels.partial_stats_block(pdf, k)
    two = kernels.combine_sample_block(
        partials, k, mu, lam, seed=seed, sweep=3
    ).set_index("id")
    assert set(one.index) == set(two.index)
    for i in one.index:
        np.testing.assert_allclose(
            np.asarray(one.loc[i, "factor"]),
            np.asarray(two.loc[i, "factor"]),
            rtol=1e-9,
            atol=1e-9,
        )


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10**6), k=st.integers(2, 6))
def test_kernel_retry_idempotent(seed, k):
    """Task-retry determinism: identical inputs → bit-identical samples
    (RNG keyed by (seed, sweep, instance), nothing ambient)."""
    rng = np.random.default_rng(seed)
    pdf = _random_cells(rng, 5, k, 8)
    mu = np.zeros(k)
    lam = np.eye(k)
    a = kernels.sample_block(pdf, k, 2.0, mu, lam, seed=seed, sweep=1)
    b = kernels.sample_block(
        pdf.sample(frac=1.0, random_state=0),  # row order must not matter
        k, 2.0, mu, lam, seed=seed, sweep=1,
    )
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    for x, y in zip(a["factor"], b["factor"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("frac", [0.1, 0.2, 0.5])
def test_split_fraction_and_determinism(spark, frac):
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.ml.relation import split_train_test

    df = spark.range(20000).select(
        (F.col("id") % 431).alias("i"), (F.col("id") % 977).alias("j")
    )
    s1 = split_train_test(df, ["i", "j"], test_frac=frac, seed=3)
    s2 = split_train_test(df, ["i", "j"], test_frac=frac, seed=3)
    n = s1.count()
    t1 = s1.filter(F.col("split") == "test").count()
    assert abs(t1 / n - frac) < 0.05, (t1 / n, frac)
    # deterministic: identical assignment on re-run
    assert s1.exceptAll(s2).count() == 0
    # different seed → different assignment
    s3 = split_train_test(df, ["i", "j"], test_frac=frac, seed=4)
    assert s1.exceptAll(s3).count() > 0


def test_shuffle_partitions_tolerates_auto():
    """The shared conf helper must survive non-numeric values like 'auto'
    (AQE auto-optimized shuffle on some distros) — the raw
    int(conf.get(...)) it replaced crashed on exactly those sessions.
    Stock Spark's conf.set validates the value as an int, so the distro
    behavior is stubbed rather than set on the live session."""
    from bayesiandatafusion_jl_spark.session import shuffle_partitions

    class _Conf:
        def __init__(self, v):
            self.v = v

        def get(self, key, default=None):
            return self.v if self.v is not None else default

    class _S:
        def __init__(self, v):
            self.conf = _Conf(v)

    assert shuffle_partitions(_S("48")) == 48
    assert shuffle_partitions(_S("auto")) == 32
    assert shuffle_partitions(_S("auto"), default=7) == 7
    assert shuffle_partitions(_S(None)) == 32


def test_salted_join_equals_plain_join(spark):
    """salted_join is result-invisible: identical rows to the plain join
    for inner AND left (incl. unmatched fact rows), any n_salt, and it
    survives a caller frame already carrying __salt."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.operators.joins import salted_join

    fact = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),           # 7 keys → heavy "skew"
        (F.col("id") * 13 % 101).alias("payload"),
        (F.col("id") % 4).alias("__salt"),      # collision probe
    )
    mid = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("mval")
    )  # keys 5,6 unmatched → left join must keep them with NULL mval

    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = fact.join(mid, "k", how)
        for n_salt in (1, 3, 8):
            salted = salted_join(fact, mid, "k", n_salt=n_salt, how=how)
            assert salted.columns == plain.columns
            assert salted.exceptAll(plain).count() == 0
            assert plain.exceptAll(salted).count() == 0

    # a map-typed fact column must not break the salt hash (xxhash64
    # rejects MapType — the salt hashes the hashable columns only)
    mfact = fact.withColumn("meta", F.create_map(F.lit("a"), F.col("payload")))
    mj = salted_join(mfact, mid, "k", n_salt=3)
    assert mj.count() == mfact.join(mid, "k").count()

    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(fact, mid, "k", how="right")
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(fact, mid, "k", n_salt=0)


def test_selective_salted_join_equals_plain_join(spark):
    """Selective salting (heavy_keys / phi): still result-invisible for
    every fact-preserving how — including NULL fact keys and a heavy
    list that covers only a subset of the keys — while light mid rows
    stay single-copy and an empty heavy set degrades to the plain join."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.operators.joins import (
        detect_heavy_keys,
        salted_join,
    )
    from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan

    fact = spark.range(5000).select(
        F.when(F.col("id") % 50 == 0, None)      # NULL keys sprinkled in
        .otherwise(F.col("id") % 7).alias("k"),  # key 0..6; ~86% of rows
        (F.col("id") * 13 % 101).alias("payload"),
    )
    mid = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("mval")
    )

    # detection: every one of the 7 keys holds ~14% ≥ phi=0.05 of rows;
    # the planted NULLs are excluded by the heavy-hitter contract
    heavy = detect_heavy_keys(fact, "k", phi=0.05)
    assert sorted(heavy) == [0, 1, 2, 3, 4, 5, 6]

    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = fact.join(mid, "k", how)
        for hk in (heavy, [0, 3]):  # full set AND a partial subset
            salted = salted_join(fact, mid, "k", how=how, heavy_keys=hk)
            assert salted.columns == plain.columns
            assert salted.exceptAll(plain).count() == 0
            assert plain.exceptAll(salted).count() == 0
        # phi path end-to-end
        via_phi = salted_join(fact, mid, "k", how=how, phi=0.05)
        assert via_phi.exceptAll(plain).count() == 0
        assert plain.exceptAll(via_phi).count() == 0

    # empty heavy set → plain join, no salt/replication machinery at all
    degraded = salted_join(fact, mid, "k", heavy_keys=[])
    assert "explode" not in formatted_plan(degraded).lower()

    with pytest.raises(ValueError, match="single join key"):
        salted_join(fact, mid, ["k", "payload"], heavy_keys=[0])


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    k=st.integers(2, 20),
    n=st.integers(1, 2_000),
    vocab=st.integers(1, 50),
    n_batches=st.integers(1, 8),
)
def test_mg_merge_superset_guarantee(seed, k, n, vocab, n_batches):
    """For ANY stream split into ANY batches, every item with frequency
    > n/(k+1) must survive the merged Misra-Gries summary — the invariant
    heavy_hitters' exactness rests on."""
    from collections import Counter

    from bayesiandatafusion_jl_spark.operators.aggregates import _mg_merge

    rng = np.random.default_rng(seed)
    # skewed stream so heavy items actually exist
    stream = rng.zipf(1.5, size=n) % vocab
    cuts = sorted(rng.integers(0, n + 1, size=n_batches - 1)) if n_batches > 1 else []
    batches = np.split(stream, cuts)
    counters: dict = {}
    for b in batches:
        counters = _mg_merge(counters, dict(Counter(b.tolist())), k)
    true = Counter(stream.tolist())
    for item, freq in true.items():
        if freq > n / (k + 1):
            assert item in counters, (item, freq, n, k)
    assert len(counters) <= k


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n_docs=st.integers(1, 60),
    capacity=st.integers(1, 64),
)
def test_packing_arithmetic_reference(seed, n_docs, capacity):
    """Pure-python reference of the packing arithmetic: for any lengths and
    capacity, (bin_id, offset) from the exclusive prefix sum satisfies
    pos = bin_id*capacity + offset with 0 <= offset < capacity, and chunk
    spans partition [pos, pos+len)."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 5 * capacity, size=n_docs)
    pos = 0
    for ln in lens:
        b, o = pos // capacity, pos % capacity
        assert b * capacity + o == pos and 0 <= o < capacity
        # chunk spans cover [pos, pos+ln) contiguously
        if ln > 0:
            covered = 0
            for bb in range(pos // capacity, (pos + int(ln) - 1) // capacity + 1):
                s = max(pos, bb * capacity)
                e = min(pos + int(ln), (bb + 1) * capacity)
                assert e > s
                covered += e - s
            assert covered == ln
        pos += int(ln)
