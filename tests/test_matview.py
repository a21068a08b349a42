"""Semantic tests for incremental materialized-rollup maintenance:
merge-order/tree invariance (decimal state), CDC retraction, the
min/max-retraction refusal, and a persisted-state refresh round-trip —
the branches the oracle-parity split (q_matview_rollup) can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.operators.matview import (
    rollup_merge,
    rollup_read,
    rollup_retract,
    rollup_state,
)
from tests.conftest import SF_DIR_TINY

KEYS = ["l_returnflag", "l_linestatus"]
MEAS = ["l_quantity", "l_extendedprice"]


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=repr
    )


def test_merge_tree_invariance(spark):
    """Any merge order / tree shape over the same deltas produces the
    identical state — the decimal-sum guarantee the module documents."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    parts = [
        rollup_state(li.filter(F.col("l_orderkey") % 4 == i), KEYS, MEAS)
        for i in range(4)
    ]
    flat = rollup_read(rollup_merge(parts, KEYS, MEAS), MEAS)
    nested = rollup_read(
        rollup_merge(
            [
                rollup_merge(parts[:2], KEYS, MEAS),
                rollup_merge(parts[2:][::-1], KEYS, MEAS),
            ],
            KEYS,
            MEAS,
        ),
        MEAS,
    )
    direct = rollup_read(rollup_state(li, KEYS, MEAS), MEAS)
    assert _rows(flat) == _rows(direct)
    assert _rows(nested) == _rows(direct)


def test_retract_restores_base_state(spark):
    """state(base ∪ extra) − extra ≡ state(base) for the retractable
    stats, and a fully-retracted key disappears."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 < 9)
    extra = li.filter(F.col("l_orderkey") % 10 == 9)
    grown = rollup_merge(
        [rollup_state(d, KEYS, MEAS, minmax=False) for d in (base, extra)],
        KEYS,
        MEAS,
        minmax=False,
    )
    shrunk = rollup_retract(grown, extra, KEYS, MEAS)
    want = rollup_state(base, KEYS, MEAS, minmax=False)
    assert _rows(rollup_read(shrunk, MEAS)) == _rows(rollup_read(want, MEAS))

    # retracting EVERYTHING empties the view (n_rows <= 0 keys dropped)
    gone = rollup_retract(
        rollup_state(li, KEYS, MEAS, minmax=False), li, KEYS, MEAS
    )
    assert gone.count() == 0


def test_retract_refuses_minmax_state(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem").limit(10)
    state = rollup_state(li, KEYS, MEAS)  # minmax=True
    with pytest.raises(ValueError, match="minmax=False"):
        rollup_retract(state, li, KEYS, MEAS)


def test_persisted_state_refresh_roundtrip(spark, tmp_path):
    """The deployment shape: state parquet on disk, a delta merged in
    WITHOUT re-reading base facts, result ≡ full recompute."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 < 8)
    delta = li.filter(F.col("l_orderkey") % 10 >= 8)
    path = str(tmp_path / "state")
    rollup_state(base, KEYS, MEAS).write.parquet(path)
    stored = spark.read.parquet(path)
    refreshed = rollup_merge(
        [stored, rollup_state(delta, KEYS, MEAS)], KEYS, MEAS
    )
    direct = rollup_state(li, KEYS, MEAS)
    assert _rows(rollup_read(refreshed, MEAS)) == _rows(
        rollup_read(direct, MEAS)
    )


def test_hll_distinct_merge_equals_one_shot(spark):
    """HLL register-max merge is exact w.r.t. the sketch: the merged
    estimate equals the one-shot whole-table sketch estimate, and both
    land within 5% of the exact distinct count."""
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    parts = [
        rollup_state(
            li.filter(F.col("l_orderkey") % 3 == i),
            ["l_returnflag"],
            ["l_quantity"],
            distinct_cols=["l_suppkey"],
        )
        for i in range(3)
    ]
    merged = rollup_read(
        rollup_merge(
            parts, ["l_returnflag"], ["l_quantity"], distinct_cols=["l_suppkey"]
        ),
        ["l_quantity"],
    )
    direct = rollup_read(
        rollup_state(
            li, ["l_returnflag"], ["l_quantity"], distinct_cols=["l_suppkey"]
        ),
        ["l_quantity"],
    )
    m = {r["l_returnflag"]: r["approx_distinct_l_suppkey"] for r in merged.collect()}
    d = {r["l_returnflag"]: r["approx_distinct_l_suppkey"] for r in direct.collect()}
    assert m == d
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(m[k] - n) <= max(1, 0.05 * n), (k, m[k], n)


def test_hll_state_refuses_retraction(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem").limit(20)
    state = rollup_state(
        li, KEYS, MEAS, minmax=False, distinct_cols=["l_suppkey"]
    )
    with pytest.raises(ValueError, match="_hll"):
        rollup_retract(state, li, KEYS, MEAS)


def test_persisted_matview_lifecycle(spark, tmp_path):
    """build → append ×2 → serve ≡ direct recompute; replayed epoch is
    idempotent; compaction preserves the readout and the ledger rejects
    re-appending a folded epoch; config pin refuses a mismatched
    append."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        compact_matview,
        matview_append,
        read_matview,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    vd = str(tmp_path / "view")
    base = li.filter(F.col("l_orderkey") % 10 < 8)
    d1 = li.filter(F.col("l_orderkey") % 10 == 8)
    d2 = li.filter(F.col("l_orderkey") % 10 == 9)
    write_matview(base, vd, KEYS, MEAS, distinct_cols=["l_suppkey"])
    matview_append(d1, vd, KEYS, MEAS, "b1", distinct_cols=["l_suppkey"])
    matview_append(d2, vd, KEYS, MEAS, "b2", distinct_cols=["l_suppkey"])
    direct = _rows(
        rollup_read(
            rollup_state(li, KEYS, MEAS, distinct_cols=["l_suppkey"]), MEAS
        )
    )
    got = _rows(read_matview(spark, vd, KEYS, MEAS, distinct_cols=["l_suppkey"]))
    assert got == direct

    # replayed batch: same epoch, same data — byte-idempotent
    matview_append(d1, vd, KEYS, MEAS, "b1", distinct_cols=["l_suppkey"])
    assert _rows(
        read_matview(spark, vd, KEYS, MEAS, distinct_cols=["l_suppkey"])
    ) == direct

    # compaction: readout unchanged, folded epoch rejected on re-append
    folded = compact_matview(spark, vd, KEYS, MEAS, distinct_cols=["l_suppkey"])
    assert "b1" in folded and "b2" in folded and "base" in folded
    assert _rows(
        read_matview(spark, vd, KEYS, MEAS, distinct_cols=["l_suppkey"])
    ) == direct
    with pytest.raises(ValueError, match="folded"):
        matview_append(d1, vd, KEYS, MEAS, "b1", distinct_cols=["l_suppkey"])
    # but a NEW epoch still appends fine after compaction
    matview_append(d1, vd, KEYS, MEAS, "b3", distinct_cols=["l_suppkey"])

    # config pin: different measures → refused
    with pytest.raises(ValueError, match="config"):
        matview_append(d1, vd, KEYS, ["l_quantity"], "b4")

    # fresh rebuild resets the ledger: the old epoch names are usable
    write_matview(base, vd, KEYS, MEAS, distinct_cols=["l_suppkey"])
    matview_append(d1, vd, KEYS, MEAS, "b1", distinct_cols=["l_suppkey"])


def test_persisted_matview_retraction_epochs(spark, tmp_path):
    """CDC deletes as negated-partial epochs on a retract_ok view; a
    retract append on a minmax view is refused."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        matview_append,
        read_matview,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    extra = li.filter(F.col("l_orderkey") % 10 == 9)
    vd = str(tmp_path / "rview")
    write_matview(li, vd, KEYS, MEAS, minmax=False)
    matview_append(extra, vd, KEYS, MEAS, "undo9", minmax=False, retract=True)
    want = _rows(
        rollup_read(
            rollup_state(
                li.filter(F.col("l_orderkey") % 10 < 9), KEYS, MEAS, minmax=False
            ),
            MEAS,
        )
    )
    assert _rows(read_matview(spark, vd, KEYS, MEAS, minmax=False)) == want

    vd2 = str(tmp_path / "mview")
    write_matview(li, vd2, KEYS, MEAS, minmax=True)
    with pytest.raises(ValueError, match="retract"):
        matview_append(extra, vd2, KEYS, MEAS, "undo", minmax=True, retract=True)


def test_matview_ingest_stream(spark, tmp_path):
    """Micro-batches land as stream_<id> epochs; the served view equals
    a direct recompute over everything ingested."""
    from bayesiandatafusion_jl_spark.streaming.pipelines import (
        matview_ingest_stream,
    )
    from bayesiandatafusion_jl_spark.operators.matview import (
        read_matview,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    src = str(tmp_path / "src")
    base = li.filter(F.col("l_orderkey") % 4 == 0)
    write_matview(base, str(tmp_path / "sview"), KEYS, MEAS)
    for i in (1, 2):
        li.filter(F.col("l_orderkey") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = matview_ingest_stream(
        stream,
        str(tmp_path / "sview"),
        str(tmp_path / "ckpt"),
        KEYS,
        MEAS,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = _rows(
        rollup_read(
            rollup_state(
                li.filter(F.col("l_orderkey") % 4 <= 2), KEYS, MEAS
            ),
            MEAS,
        )
    )
    got = _rows(read_matview(spark, str(tmp_path / "sview"), KEYS, MEAS))
    assert got == want


def test_hist_state_merges_and_matches_one_shot(spark):
    """Histogram partials are exact counts: merged state ≡ direct state
    ≡ aggregates.histogram over the same slice, bucket by bucket."""
    from bayesiandatafusion_jl_spark.operators.aggregates import histogram

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    hc = {"l_extendedprice": (0.0, 110_000.0, 11)}
    parts = [
        rollup_state(
            li.filter(F.col("l_orderkey") % 3 == i), KEYS, MEAS, hist_cols=hc
        )
        for i in range(3)
    ]
    merged = rollup_merge(parts, KEYS, MEAS, hist_cols=hc)
    direct = rollup_state(li, KEYS, MEAS, hist_cols=hc)
    get = lambda df: {
        (r["l_returnflag"], r["l_linestatus"]): list(r["l_extendedprice_hist"])
        for r in df.collect()
    }
    assert get(merged) == get(direct)
    # one key's array == the standalone histogram of that key's slice
    k = next(iter(get(direct)))
    sl = li.filter(
        (F.col("l_returnflag") == k[0]) & (F.col("l_linestatus") == k[1])
    )
    want = [
        r["cnt"]
        for r in histogram(sl, "l_extendedprice", 0.0, 110_000.0, 11)
        .orderBy("bucket")
        .collect()
    ]
    assert get(direct)[k] == want


def test_hist_state_retracts_exactly(spark):
    li = load_table(spark, SF_DIR_TINY, "lineitem")
    hc = {"l_quantity": (0.0, 50.0, 10)}
    base = li.filter(F.col("l_orderkey") % 10 < 9)
    extra = li.filter(F.col("l_orderkey") % 10 == 9)
    grown = rollup_merge(
        [
            rollup_state(d, KEYS, MEAS, minmax=False, hist_cols=hc)
            for d in (base, extra)
        ],
        KEYS,
        MEAS,
        minmax=False,
        hist_cols=hc,
    )
    shrunk = rollup_retract(grown, extra, KEYS, MEAS, hist_cols=hc)
    want = rollup_state(base, KEYS, MEAS, minmax=False, hist_cols=hc)
    get = lambda df: {
        (r["l_returnflag"], r["l_linestatus"]): list(r["l_quantity_hist"])
        for r in df.collect()
    }
    assert get(shrunk) == get(want)


def test_histogram_quantiles_bounded_error(spark):
    """The interpolated quantile lands within one bucket width of the
    exact percentile, per key."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        histogram_quantiles,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    lo, hi, nb = 0.0, 110_000.0, 55
    width = (hi - lo) / nb
    hc = {"l_extendedprice": (lo, hi, nb)}
    state = rollup_state(li, ["l_returnflag"], MEAS, hist_cols=hc)
    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p90"])
        for r in histogram_quantiles(
            state, "l_extendedprice", lo, hi, [0.25, 0.5, 0.9],
            keys=["l_returnflag"],
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["q"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_approx(l_extendedprice, array(0.25, 0.5, 0.9), 100000)"
            ).alias("q")
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (p25, p50, p90) in got.items():
        for est, ex in zip((p25, p50, p90), exact[k]):
            assert abs(est - ex) <= width + 1e-6, (k, est, ex)


def test_persisted_matview_hist_config_pin(spark, tmp_path):
    from bayesiandatafusion_jl_spark.operators.matview import (
        matview_append,
        read_matview,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    hc = {"l_quantity": (0.0, 50.0, 10)}
    vd = str(tmp_path / "hview")
    write_matview(
        li.filter(F.col("l_orderkey") % 2 == 0), vd, KEYS, MEAS, hist_cols=hc
    )
    matview_append(
        li.filter(F.col("l_orderkey") % 2 == 1),
        vd, KEYS, MEAS, "odd", hist_cols=hc,
    )
    served = read_matview(spark, vd, KEYS, MEAS, hist_cols=hc)
    assert "l_quantity_hist" in served.columns
    direct = rollup_read(rollup_state(li, KEYS, MEAS, hist_cols=hc), MEAS)
    get = lambda df: {
        (r["l_returnflag"], r["l_linestatus"]): list(r["l_quantity_hist"])
        for r in df.collect()
    }
    assert get(served) == get(direct)
    # a different hist config is a different view — refused
    with pytest.raises(ValueError, match="config"):
        matview_append(
            li.limit(5), vd, KEYS, MEAS, "bad",
            hist_cols={"l_quantity": (0.0, 50.0, 20)},
        )


def test_sumsq_std_and_drift_detection(spark, tmp_path):
    """sumsq partials: merged std == one-shot std; drift flags a shifted
    delta, passes an in-distribution one, labels new keys and tiny
    batches; non-sumsq views are refused."""
    import math

    from bayesiandatafusion_jl_spark.operators.matview import (
        matview_drift,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    # merged std == direct std (both from decimal partials)
    parts = [
        rollup_state(
            li.filter(F.col("l_orderkey") % 2 == i), KEYS, MEAS, sumsq=True
        )
        for i in range(2)
    ]
    merged = rollup_read(rollup_merge(parts, KEYS, MEAS, sumsq=True), MEAS)
    direct = rollup_read(rollup_state(li, KEYS, MEAS, sumsq=True), MEAS)
    g = lambda df: {
        (r["l_returnflag"], r["l_linestatus"]): r["std_l_quantity"]
        for r in df.collect()
    }
    gm, gd = g(merged), g(direct)
    assert set(gm) == set(gd)
    for k in gm:
        assert abs(gm[k] - gd[k]) < 1e-9
    # sanity vs Spark's population stddev
    ref = {
        (r["l_returnflag"], r["l_linestatus"]): r["s"]
        for r in li.groupBy(*KEYS)
        .agg(F.stddev_pop("l_quantity").alias("s"))
        .collect()
    }
    for k in gm:
        assert math.isclose(gm[k], ref[k], rel_tol=1e-6), (k, gm[k], ref[k])

    vd = str(tmp_path / "dview")
    write_matview(li, vd, KEYS, MEAS, sumsq=True)
    # in-distribution delta: another draw of the same data → ok
    ok_delta = li.filter(F.col("l_orderkey") % 5 == 0)
    rep = matview_drift(ok_delta, vd, KEYS, MEAS, z_thresh=6.0)
    stats = {(r["l_returnflag"], r["l_linestatus"], r["measure"]): r["status"]
             for r in rep.collect()}
    assert set(stats.values()) <= {"ok", "low_n"}
    # shifted delta: quantity scaled 3x → drift on l_quantity
    shifted = ok_delta.withColumn("l_quantity", F.col("l_quantity") * 3)
    rep2 = matview_drift(shifted, vd, KEYS, MEAS, z_thresh=6.0)
    qty = [r for r in rep2.collect() if r["measure"] == "l_quantity"
           and r["n_delta"] >= 30]
    assert qty and all(r["status"] == "drift" for r in qty)
    # a key with no history → new_key
    novel = ok_delta.withColumn("l_returnflag", F.lit("Z"))
    rep3 = matview_drift(novel, vd, KEYS, MEAS)
    assert {r["status"] for r in rep3.collect()} == {"new_key"}
    # refused on a view without sumsq
    vd2 = str(tmp_path / "nosq")
    write_matview(li, vd2, KEYS, MEAS)
    with pytest.raises(ValueError, match="sumsq"):
        matview_drift(li.limit(5), vd2, KEYS, MEAS)


def test_matview_stream_drift_guard(spark, tmp_path):
    """The streaming ingest guard: an in-distribution batch appends; a
    shifted batch raises (on_drift='error') BEFORE it pollutes the
    view."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        read_matview,
        write_matview,
    )
    from bayesiandatafusion_jl_spark.streaming.pipelines import (
        matview_ingest_stream,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    vd = str(tmp_path / "gview")
    write_matview(
        li.filter(F.col("l_orderkey") % 4 != 3), vd, KEYS, MEAS, sumsq=True
    )
    src = str(tmp_path / "gsrc")
    ok_batch = li.filter(F.col("l_orderkey") % 4 == 3)
    bad_batch = ok_batch.withColumn("l_quantity", F.col("l_quantity") * 5)
    ok_batch.coalesce(1).write.mode("append").parquet(src)
    bad_batch.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = matview_ingest_stream(
        stream, vd, str(tmp_path / "gckpt"), KEYS, MEAS,
        sumsq=True, drift_z=8.0,
    )
    try:
        with pytest.raises(Exception, match="drifted past"):
            q.processAllAvailable()
            if q.exception():
                raise q.exception()
    finally:
        q.stop()
    # the clean batch (whichever order the two files triggered in, at
    # least the guard stopped ingestion at the shifted one): the view
    # still serves, and never absorbed the 5x rows at full strength
    served = read_matview(spark, vd, KEYS, MEAS, sumsq=True)
    direct_all_bad = rollup_read(
        rollup_state(
            li.withColumn("l_quantity", F.col("l_quantity") * 5),
            KEYS, MEAS, sumsq=True,
        ),
        MEAS,
    )
    s_avg = {r[0:2]: r["avg_l_quantity"] for r in served.collect()}
    bad_avg = {r[0:2]: r["avg_l_quantity"] for r in direct_all_bad.collect()}
    assert all(s_avg[k] < bad_avg[k] for k in s_avg)
    # guard misconfiguration is refused up front
    with pytest.raises(ValueError, match="sumsq"):
        matview_ingest_stream(
            stream, vd, str(tmp_path / "x"), KEYS, MEAS, drift_z=4.0
        )
    with pytest.raises(ValueError, match="on_drift"):
        matview_ingest_stream(
            stream, vd, str(tmp_path / "y"), KEYS, MEAS,
            sumsq=True, drift_z=4.0, on_drift="ignore",
        )


def test_drift_null_rate_leg(spark, tmp_path):
    """A delta whose measure silently went null passes the mean test
    (nulls never enter avg) but trips the null-rate proportion z-test."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        matview_drift,
        write_matview,
    )

    li = load_table(spark, SF_DIR_TINY, "lineitem")
    vd = str(tmp_path / "nview")
    write_matview(li, vd, KEYS, MEAS, sumsq=True)
    # half the delta's quantities go null; surviving values unchanged
    delta = li.filter(F.col("l_orderkey") % 5 == 0).withColumn(
        "l_quantity",
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_quantity")),
    )
    rep = matview_drift(delta, vd, KEYS, MEAS, z_thresh=6.0)
    rows = {(r["measure"], r["l_returnflag"], r["l_linestatus"]): r["status"]
            for r in rep.collect() if r["n_delta"] >= 30}
    nr = [v for (m, _, _), v in rows.items() if m == "l_quantity__null_rate"]
    mean_leg = [v for (m, _, _), v in rows.items() if m == "l_quantity"]
    assert nr and all(v == "drift" for v in nr)       # proportion test fires
    assert mean_leg and all(v == "ok" for v in mean_leg)  # mean test blind


# --- incremental top-k (r13) ---------------------------------------------


def test_topk_merge_equals_oneshot_any_split(spark):
    from bayesiandatafusion_jl_spark.operators.matview import (
        topk_merge,
        topk_read,
        topk_state,
    )

    rows = [(i % 4, float((i * 37) % 19), i) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v double, id long")
    one = topk_read(
        topk_state(df, ["k"], "v", ["id"], 5), ["k"], "v", ["id"]
    ).collect()
    want = sorted((r["k"], r["rk"], r["v"], r["id"]) for r in one)
    for mod in (2, 3, 7):
        parts = [
            topk_state(df.filter(F.col("id") % mod == i), ["k"], "v", ["id"], 5)
            for i in range(mod)
        ]
        got = topk_read(
            topk_merge(parts, ["k"], "v", ["id"], 5), ["k"], "v", ["id"]
        ).collect()
        assert sorted((r["k"], r["rk"], r["v"], r["id"]) for r in got) == want


def test_topk_tie_break_matches_window_order(spark):
    """Equal order values must rank by payload ASC inside the state
    array, exactly like the window (the sort_array(desc) trap)."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        topk_read,
        topk_state,
    )

    df = spark.createDataFrame(
        [(1, 9.0, 30), (1, 9.0, 10), (1, 9.0, 20), (1, 1.0, 5)],
        "k int, v double, id long",
    )
    out = [
        (r["rk"], r["id"])
        for r in topk_read(
            topk_state(df, ["k"], "v", ["id"], 3), ["k"], "v", ["id"]
        ).orderBy("rk").collect()
    ]
    assert out == [(1, 10), (2, 20), (3, 30)]


def test_topk_null_order_rows_excluded(spark):
    """NULL order values are excluded from the state (the documented
    contract): the negated-order struct would sort NULL '__no' FIRST
    while the one-shot window ranks NULLs LAST, so keeping them would
    hand rank 1 to rows the window ranks last (r13 ADVICE)."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        topk_merge,
        topk_read,
        topk_state,
    )

    df = spark.createDataFrame(
        [(1, None, 99), (1, None, 98), (1, 5.0, 1), (1, 3.0, 2), (2, None, 7)],
        "k int, v double, id long",
    )
    out = [
        (r["k"], r["rk"], r["v"], r["id"])
        for r in topk_read(
            topk_state(df, ["k"], "v", ["id"], 3), ["k"], "v", ["id"]
        ).orderBy("k", "rk").collect()
    ]
    # null-order rows never appear — including key 2, whose rows were
    # ALL null-ordered (the key vanishes from the view entirely)
    assert out == [(1, 1, 5.0, 1), (1, 2, 3.0, 2)]
    # and the merge path agrees with the one-shot on the same input
    parts = [
        topk_state(df.filter(F.col("id") % 2 == i), ["k"], "v", ["id"], 3)
        for i in range(2)
    ]
    merged = [
        (r["k"], r["rk"], r["v"], r["id"])
        for r in topk_read(
            topk_merge(parts, ["k"], "v", ["id"], 3), ["k"], "v", ["id"]
        ).orderBy("k", "rk").collect()
    ]
    assert merged == out


def test_topk_view_persisted_lifecycle(spark, tmp_path):
    """write → append ×2 → read ≡ one-shot; replayed epoch idempotent;
    config pin enforced; compaction folds epochs and rejects replays."""
    import pytest

    from bayesiandatafusion_jl_spark.operators.matview import (
        compact_topk_view,
        read_topk_view,
        topk_read,
        topk_state,
        topk_view_append,
        write_topk_view,
    )

    rows = [(i % 3, float((i * 41) % 23), i) for i in range(150)]
    df = spark.createDataFrame(rows, "k int, v double, id long")
    d = str(tmp_path / "topk_view")
    args = (["k"], "v", ["id"], 4)
    write_topk_view(df.filter(F.col("id") < 50), d, *args)
    topk_view_append(
        df.filter((F.col("id") >= 50) & (F.col("id") < 100)), d, *args,
        epoch="b1",
    )
    topk_view_append(df.filter(F.col("id") >= 100), d, *args, epoch="b2")
    want = sorted(
        (r["k"], r["rk"], r["v"], r["id"])
        for r in topk_read(
            topk_state(df, ["k"], "v", ["id"], 4), ["k"], "v", ["id"]
        ).collect()
    )
    got = lambda: sorted(  # noqa: E731
        (r["k"], r["rk"], r["v"], r["id"])
        for r in read_topk_view(spark, d, *args).collect()
    )
    assert got() == want
    # replay-idempotent: rewriting b1's epoch changes nothing
    topk_view_append(
        df.filter((F.col("id") >= 50) & (F.col("id") < 100)), d, *args,
        epoch="b1",
    )
    assert got() == want
    # config pin: a different k is refused
    with pytest.raises(ValueError, match="config"):
        read_topk_view(spark, d, ["k"], "v", ["id"], 9)
    # compaction folds to one epoch; a folded-epoch replay is rejected
    compact_topk_view(spark, d)
    eps = {
        r["__epoch"]
        for r in spark.read.parquet(f"{d}/state").select("__epoch")
        .distinct().collect()
    }
    assert eps == {"compact-0"}
    assert got() == want
    with pytest.raises(ValueError, match="folded"):
        topk_view_append(df.filter(F.col("id") >= 100), d, *args, epoch="b2")
