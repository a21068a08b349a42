"""Structured Streaming semantics tests (SURVEY §2.J — J7–J11).

No SQL oracle exists for watermark/state semantics (SURVEY §5.2), so these
are targeted behavioral tests: files dropped into a source dir one at a
time become separate micro-batches (maxFilesPerTrigger=1 + sequenced
writes), which lets us place rows before/after the watermark on purpose.
"""

from __future__ import annotations

import shutil
import uuid

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.streaming import pipelines as P


@pytest.fixture
def stream_env(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    chk = tmp_path / "chk"
    queries = []

    def write_batch(rows):
        """One parquet file = one future micro-batch."""
        df = spark.createDataFrame(rows, schema=P.EVENTS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(str(src))

    def start(tdf_fn, name=None, output_mode="append"):
        name = name or f"q_{uuid.uuid4().hex[:8]}"
        stream = P.parquet_stream(spark, str(src))
        q = (
            tdf_fn(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", str(chk / name))
            .start()
        )
        queries.append(q)
        return q, name

    yield write_batch, start, spark
    for q in queries:
        q.stop()
    shutil.rmtree(tmp_path, ignore_errors=True)


def _ev(eid, uid, etype, value, ts):
    return (eid, uid, etype, value, "{}", ts)


def _t(hhmm):
    from datetime import datetime

    h, m = divmod(hhmm, 100)
    return datetime(2026, 1, 15, h, m, 0)


def test_tumbling_watermark_drops_late_rows(stream_env):
    """J7+J10: a row older than the watermark must NOT be added to its
    (already finalized) window; on-time rows aggregate normally."""
    write_batch, start, spark = stream_env
    # batch 1: two rows in [10:00,10:10) + one at 10:30 → wm advances to 10:20
    write_batch(
        [
            _ev(1, 1, "click", 1.0, _t(1000)),
            _ev(2, 1, "click", 1.0, _t(1005)),
            _ev(3, 1, "click", 1.0, _t(1030)),
        ]
    )
    q, name = start(
        lambda s: P.tumbling_counts(s, window="10 minutes", watermark="10 minutes")
    )
    q.processAllAvailable()
    # batch 2: LATE row for the finalized window (10:02 < wm 10:20) + a row
    # at 10:55 that pushes the watermark past 10:40, finalizing [10:30,10:40)
    write_batch(
        [
            _ev(4, 1, "click", 1.0, _t(1002)),
            _ev(5, 1, "click", 1.0, _t(1055)),
        ]
    )
    q.processAllAvailable()
    got = {
        (r["win_start"].strftime("%H:%M"), r["n"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert ("10:00", 2) in got, got  # late row 4 NOT counted
    assert ("10:30", 1) in got, got
    assert not any(w == "10:00" and n == 3 for w, n in got), got


def test_sliding_each_event_in_k_windows(stream_env):
    """J8: with window=20min slide=10min every event lands in 2 windows."""
    write_batch, start, spark = stream_env
    write_batch(
        [
            _ev(1, 1, "buy", 2.0, _t(1005)),
            _ev(2, 2, "buy", 3.0, _t(1105)),  # push watermark forward
        ]
    )
    q, name = start(
        lambda s: P.sliding_counts(
            s, window="20 minutes", slide="10 minutes", watermark="5 minutes"
        )
    )
    q.processAllAvailable()
    write_batch([_ev(3, 1, "buy", 1.0, _t(1230))])  # finalize everything older
    q.processAllAvailable()
    rows = spark.sql(
        f"SELECT win_start, n FROM {name} ORDER BY win_start"
    ).collect()
    starts_for_event1 = [
        r["win_start"].strftime("%H:%M") for r in rows if r["win_start"].hour == 9
    ] + [
        r["win_start"].strftime("%H:%M")
        for r in rows
        if r["win_start"].hour == 10 and r["win_start"].minute == 0
    ]
    # event at 10:05 → windows starting 09:50 and 10:00
    assert "09:50" in starts_for_event1 and "10:00" in starts_for_event1, rows


def test_session_window_gap_semantics(stream_env):
    """J9: rows within the gap merge into one session; a gap closes it."""
    write_batch, start, spark = stream_env
    write_batch(
        [
            _ev(1, 7, "a", 1.0, _t(1000)),
            _ev(2, 7, "a", 1.0, _t(1010)),  # within 30-min gap → same session
            _ev(3, 7, "a", 1.0, _t(1200)),  # >30min later → new session
        ]
    )
    q, name = start(
        lambda s: P.session_counts(s, gap="30 minutes", watermark="10 minutes")
    )
    q.processAllAvailable()
    write_batch([_ev(4, 8, "a", 1.0, _t(1400))])  # advance wm → close sessions
    q.processAllAvailable()
    rows = spark.sql(
        f"SELECT user_id, n_events, duration_s FROM {name} WHERE user_id = 7"
        " ORDER BY session_start"
    ).collect()
    assert [(r["n_events"], r["duration_s"]) for r in rows] == [
        (2, 10 * 60 + 30 * 60),  # 10:00→10:10 + 30min gap extension
        (1, 30 * 60),
    ], rows


def test_dedup_within_watermark(stream_env):
    """J11: duplicate event_id inside the watermark horizon is dropped;
    the first occurrence survives."""
    write_batch, start, spark = stream_env
    write_batch(
        [
            _ev(1, 1, "x", 1.0, _t(1000)),
            _ev(2, 1, "x", 1.0, _t(1001)),
        ]
    )
    q, name = start(
        lambda s: P.dedup_within_watermark(s, keys=["event_id"], watermark="1 hour")
    )
    q.processAllAvailable()
    write_batch(
        [
            _ev(1, 1, "x", 99.0, _t(1002)),  # duplicate id within horizon
            _ev(3, 1, "x", 1.0, _t(1010)),
        ]
    )
    q.processAllAvailable()
    rows = spark.sql(f"SELECT event_id, value FROM {name}").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], rows
    assert {r["value"] for r in rows if r["event_id"] == 1} == {1.0}, rows


def test_stream_tumbling_matches_batch(stream_env):
    """Batch/stream parity: the same transformation over the same rows gives
    identical finalized windows (the batch form is the DuckDB-checked one)."""
    write_batch, start, spark = stream_env
    rows = [
        _ev(i, i % 3, "t", float(i), _t(900 + (i % 4) * 100)) for i in range(1, 13)
    ]
    write_batch(rows)
    q, name = start(
        lambda s: P.tumbling_counts(s, window="1 hour", watermark="0 seconds")
    )
    q.processAllAvailable()
    # flush: advance watermark far past every window
    write_batch([_ev(99, 9, "t", 0.0, _t(2300))])
    q.processAllAvailable()
    stream_rows = {
        (r["win_start"], r["event_type"], r["n"], r["sum_value"])
        for r in spark.sql(
            f"SELECT * FROM {name} WHERE win_start < timestamp'2026-01-15 23:00:00'"
        ).collect()
    }
    batch = P.tumbling_counts(
        spark.createDataFrame(rows, schema=P.EVENTS_SCHEMA),
        window="1 hour",
        watermark="0 seconds",
    )
    batch_rows = {
        (r["win_start"], r["event_type"], r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert stream_rows == batch_rows


def test_score_stream_matches_batch_predict(spark, tmp_path):
    """Online serving (score_stream): a stream of cells scored against the
    trained factor tables matches batch predict() row-for-row."""
    import numpy as np

    from bayesiandatafusion_jl_spark.ml.bpmf import bpmf
    from bayesiandatafusion_jl_spark.ml.relation import Relation, RelationData

    rng = np.random.default_rng(3)
    n, m, k = 25, 15, 3
    u, v = rng.standard_normal((n, k)), rng.standard_normal((m, k))
    r = u @ v.T
    cells = [
        (i, j, float(r[i, j]), "test" if rng.random() < 0.1 else "train")
        for i in range(n)
        for j in range(m)
        if rng.random() < 0.6
    ]
    df = spark.createDataFrame(
        cells, schema="row long, col long, value double, split string"
    )
    rd = RelationData().add_relation(Relation(df, ["row", "col"]))
    res = bpmf(spark, rd, num_latent=3, burnin=2, psamples=2, seed=5,
               track_rmse=False)

    score_cells = [(i, j) for i in range(0, n, 5) for j in range(0, m, 4)]
    # two separate file drops = (at least) two micro-batches: scoring must
    # be purely incremental — batch 2's arrival appends its predictions
    # without touching batch 1's
    batch1, batch2 = score_cells[: len(score_cells) // 2], score_cells[
        len(score_cells) // 2 :
    ]
    src = tmp_path / "cells"
    src.mkdir()
    spark.createDataFrame(batch1, "row long, col long").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema("row long, col long").parquet(str(src))
    q = P.run_to_memory(P.score_stream(stream, res), "scored_cells")
    try:
        q.processAllAvailable()
        n_after_b1 = spark.sql("SELECT COUNT(*) c FROM scored_cells").collect()[0]["c"]
        assert n_after_b1 == len(batch1)
        spark.createDataFrame(batch2, "row long, col long").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = {
            (r["row"], r["col"]): r["pred"]
            for r in spark.sql("SELECT * FROM scored_cells").collect()
        }
    finally:
        q.stop()
    want = {
        (r["row"], r["col"]): r["pred"]
        for r in res.predict(
            spark.createDataFrame(score_cells, "row long, col long"),
            use_samples=False,
        ).collect()
    }
    assert got.keys() == want.keys() and len(got) == len(score_cells)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-9


def test_ewma_stateful_stream_matches_batch(stream_env):
    """Custom stateful operator (applyInPandasWithState): per-user EWMA
    state carries across micro-batches and matches the batch fold over the
    full history bit-for-bit; an idle user's state is evicted by the
    event-time timeout, so its next event restarts the fold from scratch."""
    write_batch, start, spark = stream_env
    rows1 = [
        _ev(1, 1, "a", 10.0, _t(900)),
        _ev(2, 1, "a", 20.0, _t(905)),
        _ev(3, 2, "a", 5.0, _t(910)),
    ]
    rows2 = [_ev(4, 1, "a", 30.0, _t(1000)), _ev(5, 2, "a", 15.0, _t(1005))]
    write_batch(rows1)
    q, name = start(
        lambda s: P.ewma_stream(
            s, alpha=0.5, watermark="10 minutes", state_ttl_ms=2 * 3600 * 1000
        )
    )
    q.processAllAvailable()
    write_batch(rows2)
    q.processAllAvailable()

    got = {
        r["event_id"]: r["ewma"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = P.ewma_scores(
        spark.createDataFrame(rows1 + rows2, schema=P.EVENTS_SCHEMA), alpha=0.5
    )
    want = {r["event_id"]: r["ewma"] for r in batch.collect()}
    assert got == want, (got, want)  # same fold, same order → bit-identical
    # user 1: 10 → .5·20+.5·10=15 → .5·30+.5·15=22.5 (state crossed batches)
    assert got[4] == 22.5

    # eviction: advance the watermark far past user 1's TTL with other
    # users' traffic (timeouts fire only for groups WITHOUT new data, and
    # against the PREVIOUS batch's watermark — hence two advancing drops)
    write_batch([_ev(6, 2, "a", 1.0, _t(1400))])
    q.processAllAvailable()
    write_batch([_ev(7, 3, "a", 1.0, _t(1500))])
    q.processAllAvailable()
    # user 1's state is gone → the fold restarts at the raw value, NOT at
    # 0.5·40 + 0.5·22.5
    write_batch([_ev(8, 1, "a", 40.0, _t(1510))])
    q.processAllAvailable()
    got2 = {
        r["event_id"]: r["ewma"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got2[8] == 40.0, got2


def test_stream_stream_attribution_join(stream_env):
    """Stream-stream inner join: in-horizon click→purchase pairs emit,
    out-of-horizon purchases don't, and a purchase arriving in a LATER
    micro-batch than its click still matches (buffered join state)."""
    write_batch, start, spark = stream_env
    q, name = start(lambda s: P.attribution_join(s, horizon_min=60))

    # batch 1: user 1 clicks 10:00 and buys 10:30 (same batch, in horizon);
    # user 2 clicks 10:00 (its purchase comes later); user 3 clicks 10:00
    write_batch([
        _ev(1, 1, "click", 0.0, _t(1000)),
        _ev(2, 1, "purchase", 9.5, _t(1030)),
        _ev(3, 2, "click", 0.0, _t(1000)),
        _ev(4, 3, "click", 0.0, _t(1000)),
    ])
    q.processAllAvailable()
    rows = {tuple(r) for r in spark.table(name).select("click_id", "purchase_id").collect()}
    assert rows == {(1, 2)}

    # batch 2: user 2's purchase at 10:40 — matches the batch-1 click
    # ACROSS micro-batches; user 3's purchase at 12:30 is out of horizon
    write_batch([
        _ev(5, 2, "purchase", 3.0, _t(1040)),
        _ev(6, 3, "purchase", 7.0, _t(1230)),
    ])
    q.processAllAvailable()
    rows = {tuple(r) for r in spark.table(name).select("click_id", "purchase_id").collect()}
    assert rows == {(1, 2), (3, 5)}

    amounts = {r["click_id"]: r["amount"] for r in spark.table(name).collect()}
    assert amounts == {1: 9.5, 3: 3.0}


def test_near_dup_stream_across_microbatches(spark, tmp_path):
    """Docs arrive as two file drops; a twin of a batch-1 doc arrives in
    batch 2 and must pair against the INDEX (which batch 1 appended to),
    proving cross-micro-batch dedup without re-signing history."""
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        write_signature_index,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    src = str(tmp_path / "docs_in")
    index_dir = str(tmp_path / "sig_index")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, drop_first=False):
        toks = [f"w{i}x{j}" for j in range(30)]
        return (i, " ".join(toks[1:] if drop_first else toks))

    # seed index with a pre-stream corpus (docs 0-9)
    seed = spark.createDataFrame(
        [doc(i) for i in range(10)], "doc_id long, text string"
    )
    write_signature_index(seed, index_dir)

    import os

    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # batch 1: fresh docs 100-104 (one of which, 100, twins seed doc 3)
    b1 = [doc(i) for i in range(101, 105)] + [(100, doc(3, True)[1])]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    q = P.near_dup_stream(stream, index_dir, pairs_out, ckpt)
    try:
        q.processAllAvailable()
        # batch 2: doc 200 twins STREAMED doc 101 (cross-micro-batch)
        b2 = [(200, doc(101, True)[1]), doc(201)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(pairs_out).collect()
    }
    assert (100, 3) in pairs  # stream vs pre-stream index
    assert (200, 101) in pairs  # batch 2 vs batch 1 — via the index append
    assert not any(a in (201,) for a, _ in pairs)


def test_rag_ingest_stream_serves_growing_corpus(spark, tmp_path):
    """Documents arrive as two file drops into a streaming RAG ingest;
    retrieval through the SAME persisted index finds docs from both
    micro-batches (probe-only — the stream never refits), and a second
    stream over the same source (fresh checkpoint, replayed batches)
    leaves the postings unchanged (epoch-overwrite idempotence)."""
    from bayesiandatafusion_jl_spark.functions.rag import (
        rag_build_index,
        rag_retrieve_index,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    src = str(tmp_path / "rag_in")
    index_dir = str(tmp_path / "rag_ix")
    ckpt = str(tmp_path / "rag_ckpt")
    schema = "doc_id long, text string"

    def doc(i):
        # unique marker token + 39 in-vocabulary tokens: every doc's text
        # is distinct (self-match strictly beats any near-twin) while the
        # streamed shards stay in-distribution for the drift guard
        return (
            i,
            f"doc{i} " + " ".join(f"base{i % 20}tok{j}" for j in range(1, 40)),
        )

    # seed: build the index on a pre-stream corpus (docs 0-19)
    seed = spark.createDataFrame([doc(i) for i in range(20)], schema)
    rag_build_index(seed, index_dir, n_cells=4, pq_m=4, pq_ksub=16)

    import os

    os.makedirs(src, exist_ok=True)
    # two file drops -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [doc(i) for i in range(100, 103)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = P.rag_ingest_stream(stream, index_dir, ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [doc(i) for i in range(200, 203)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    posts = spark.read.parquet(index_dir + "/postings")
    rows_after_stream = posts.count()
    epochs = {r["__epoch"] for r in posts.select("__epoch").distinct().collect()}
    assert {"base", "stream_0", "stream_1"} <= epochs

    # retrieval finds streamed docs from BOTH batches: query with each
    # streamed doc's own text; its top hit is itself
    from pyspark.sql import functions as FX

    queries = spark.createDataFrame(
        [(9000 + i, doc(i)[1]) for i in (100, 200)], schema
    )
    hits = rag_retrieve_index(queries, index_dir, k=1, n_probe=4).collect()
    got = {r["qid"]: r["nb_doc_id"] for r in hits if r["rk"] == 1}
    assert got == {9100: 100, 9200: 200}

    # replay: a second stream over the same source with a FRESH
    # checkpoint re-processes both batches; epoch overwrite keeps the
    # postings byte-count identical (no duplicated vectors)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = P.rag_ingest_stream(stream2, index_dir, str(tmp_path / "ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert (
        spark.read.parquet(index_dir + "/postings").count()
        == rows_after_stream
    )


def test_bm25_ingest_stream_serves_growing_corpus(spark, tmp_path):
    """Documents arrive as two file drops into a streaming BM25 ingest;
    a probe against the SAME persisted index (a) retrieves docs from
    both micro-batches and (b) EQUALS the one-shot scorer over the full
    corpus (IDF/avgdl exact on the grown index); a replayed stream
    (fresh checkpoint, same source) changes nothing."""
    from pyspark.sql import functions as F

    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        bm25_query_index,
        bm25_topk,
        write_bm25_index,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    src = str(tmp_path / "bm_in")
    index_dir = str(tmp_path / "bm_ix")
    ckpt = str(tmp_path / "bm_ckpt")
    schema = "doc_id long, text string"

    def doc(i):
        return (i, f"mark{i} " + " ".join(f"w{(i + j) % 9}" for j in range(8)))

    seed_rows = [doc(i) for i in range(20)]
    seed = spark.createDataFrame(seed_rows, schema)
    write_bm25_index(seed, index_dir, n_buckets=8)

    import os

    os.makedirs(src, exist_ok=True)
    b1, b2 = [doc(i) for i in range(100, 103)], [doc(i) for i in range(200, 203)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = P.bm25_ingest_stream(stream, index_dir, ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame(seed_rows + b1 + b2, schema)
    queries = spark.createDataFrame(
        [(9001, "mark101 w3"), (9002, "mark201 w5")], "qid long, text string"
    )
    probe = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, index_dir, k=5).collect()
    )
    oneshot = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_topk(full, queries, k=5, exclude_self=False).collect()
    )
    assert probe == oneshot and len(probe) > 0
    # the unique marker docs from both micro-batches rank first
    by_q = {r[0]: r for r in probe if r[1] == 1}
    assert by_q[9001][2] == 101 and by_q[9002][2] == 201

    # replay: a second stream over the same source, fresh checkpoint
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = P.bm25_ingest_stream(stream2, index_dir, str(tmp_path / "bm_ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    replay = sorted(
        (r["qid"], r["rk"], r["nb_id"], r["score"])
        for r in bm25_query_index(queries, index_dir, k=5).collect()
    )
    assert replay == probe


def test_transitions_stream_matches_batch_and_evicts(stream_env):
    """Stateful transition edges (applyInPandasWithState): the per-user
    chain crosses micro-batches (the first event of batch 2 pairs with
    the last of batch 1), aggregated edges equal the batch
    event_transitions matrix, and TTL eviction breaks the chain instead
    of emitting a cross-gap edge."""
    from bayesiandatafusion_jl_spark.operators.temporal import (
        event_transitions,
    )

    write_batch, start, spark = stream_env
    rows1 = [
        _ev(1, 1, "view", 0.0, _t(900)),
        _ev(2, 1, "cart", 0.0, _t(905)),
        _ev(3, 2, "view", 0.0, _t(910)),
    ]
    rows2 = [
        _ev(4, 1, "purchase", 0.0, _t(1000)),  # pairs with cart (batch 1)
        _ev(5, 2, "view", 0.0, _t(1005)),
    ]
    write_batch(rows1)
    q, name = start(
        lambda s: P.transitions_stream(
            s, watermark="10 minutes", state_ttl_ms=2 * 3600 * 1000
        )
    )
    q.processAllAvailable()
    write_batch(rows2)
    q.processAllAvailable()

    got = sorted(
        (r["user_id"], r["from_type"], r["to_type"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    assert got == [
        (1, "cart", "purchase"),
        (1, "view", "cart"),
        (2, "view", "view"),
    ]
    # aggregated edges == the batch transition matrix over the history
    batch = event_transitions(
        spark.createDataFrame(rows1 + rows2, schema=P.EVENTS_SCHEMA)
    )
    want = {(r["from_type"], r["to_type"]): r["n"] for r in batch.collect()}
    from collections import Counter

    assert dict(Counter((f, t) for _, f, t in got)) == want

    # eviction: push the watermark past user 1's TTL via other users,
    # then user 1's next event must NOT pair with its pre-gap last event
    write_batch([_ev(6, 2, "view", 0.0, _t(1400))])
    q.processAllAvailable()
    write_batch([_ev(7, 3, "view", 0.0, _t(1500))])
    q.processAllAvailable()
    write_batch([_ev(8, 1, "view", 0.0, _t(1510))])
    q.processAllAvailable()
    after = [
        (r["from_type"], r["to_type"])
        for r in spark.sql(
            f"SELECT * FROM {name} WHERE user_id = 1"
        ).collect()
    ]
    assert ("purchase", "view") not in after, after


def test_topk_ingest_stream_serves_merged_leaders(spark, tmp_path):
    """Streamed top-k view: two micro-batches land as their own epochs,
    the served leaders equal the batch top-k over the full history, and
    replaying the stream from a fresh checkpoint is byte-idempotent."""
    import shutil

    from bayesiandatafusion_jl_spark.operators.matview import (
        read_topk_view,
        topk_read,
        topk_state,
        write_topk_view,
    )
    from bayesiandatafusion_jl_spark.streaming.pipelines import (
        topk_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = "k int, v double, id long"
    rows1 = [(i % 2, float((i * 7) % 11), i) for i in range(30)]
    rows2 = [(i % 2, float((i * 7) % 11), i) for i in range(30, 60)]
    args = (["k"], "v", ["id"], 3)
    d = str(tmp_path / "view")
    write_topk_view(
        spark.createDataFrame([], schema), d, *args
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    def run(chk):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        q = topk_ingest_stream(stream, d, str(tmp_path / chk), *args)
        q.processAllAvailable()
        return q

    q = run("chk1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()
    want = sorted(
        (r["k"], r["rk"], r["v"], r["id"])
        for r in topk_read(
            topk_state(
                spark.createDataFrame(rows1 + rows2, schema),
                ["k"], "v", ["id"], 3,
            ),
            ["k"], "v", ["id"],
        ).collect()
    )
    got = sorted(
        (r["k"], r["rk"], r["v"], r["id"])
        for r in read_topk_view(spark, d, *args).collect()
    )
    assert got == want
    # fresh checkpoint replays the SAME files into the same epoch names:
    # dynamic epoch overwrite keeps the view identical, never doubled
    q2 = run("chk2")
    q2.stop()
    got2 = sorted(
        (r["k"], r["rk"], r["v"], r["id"])
        for r in read_topk_view(spark, d, *args).collect()
    )
    assert got2 == want
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_anomaly_stream_matches_batch_and_flags_planted_outlier(stream_env):
    """r14 (VERDICT #7): stream-scored transition edges against a
    broadcast persisted matrix equal the batch transition_anomaly
    numbers on the same history, and a planted user whose transitions
    never occur in the matrix scores the pinned unseen_nll."""
    from bayesiandatafusion_jl_spark.functions.exprs import DEC
    from bayesiandatafusion_jl_spark.operators.temporal import (
        event_transitions,
        transition_anomaly,
    )

    write_batch, start, spark = stream_env
    # offline TRAIN set: the matrix the monitor serves read-only
    train = [
        _ev(1, 10, "view", 0.0, _t(800)),
        _ev(2, 10, "cart", 0.0, _t(805)),
        _ev(3, 10, "purchase", 0.0, _t(810)),
        _ev(4, 11, "view", 0.0, _t(815)),
        _ev(5, 11, "view", 0.0, _t(820)),
        _ev(6, 11, "cart", 0.0, _t(825)),
    ]
    matrix = event_transitions(
        spark.createDataFrame(train, schema=P.EVENTS_SCHEMA)
    ).cache()

    # live rows: user 1 follows the crowd; user 9 emits transitions the
    # matrix has never seen (purchase->purchase)
    rows1 = [
        _ev(21, 1, "view", 0.0, _t(900)),
        _ev(22, 1, "cart", 0.0, _t(905)),
        _ev(23, 9, "purchase", 0.0, _t(910)),
    ]
    rows2 = [
        _ev(24, 1, "purchase", 0.0, _t(1000)),
        _ev(25, 9, "purchase", 0.0, _t(1005)),
    ]
    write_batch(rows1)
    q, name = start(
        lambda s: P.anomaly_stream(
            s, matrix, watermark="10 minutes",
            state_ttl_ms=2 * 3600 * 1000, unseen_nll=99.0,
        )
    )
    q.processAllAvailable()
    write_batch(rows2)
    q.processAllAvailable()

    got = spark.sql(f"SELECT * FROM {name}")
    # the planted outlier scores exactly the unseen sentinel
    outlier = [r["nll"] for r in got.filter(F.col("user_id") == 9).collect()]
    assert outlier == [99.0]
    # per-user mean over the scored edges == batch transition_anomaly
    # shape on the same edges under the SAME matrix: recompute the batch
    # reference by joining the batch pair stream with the train matrix
    live = spark.createDataFrame(rows1 + rows2, schema=P.EVENTS_SCHEMA)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        live.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(
            "user_id", F.col("event_type").alias("from_type"), "to_type"
        )
    )
    nll = (-F.log("p")).cast("float").cast("double")
    want = {
        (r["user_id"], r["from_type"], r["to_type"]): r["nll"]
        for r in pairs.join(
            matrix.select("from_type", "to_type", "p"),
            ["from_type", "to_type"],
            "left",
        )
        .select(
            "user_id", "from_type", "to_type",
            F.coalesce(nll, F.lit(99.0)).alias("nll"),
        )
        .collect()
    }
    got_rows = {
        (r["user_id"], r["from_type"], r["to_type"]): r["nll"]
        for r in got.collect()
    }
    assert got_rows == want and len(want) == 3
    # and the mean-scoring discipline matches transition_anomaly's
    # decimal-summed form for a crowd-following user (self-trained
    # matrix == served matrix when train == live history)
    ta = {
        r["user_id"]: r["mean_nll"]
        for r in transition_anomaly(
            spark.createDataFrame(train, schema=P.EVENTS_SCHEMA)
        ).collect()
    }
    assert set(ta) == {10, 11}
    matrix.unpersist()


def test_kl_drift_stream_matches_batch_and_replays_idempotent(spark, tmp_path):
    """r14: per-micro-batch KL vs a static reference equals the batch
    token_kl_drift on the same rows, and each batch's row lands under
    its own epoch (a replay rewrites, never duplicates)."""
    import shutil

    from bayesiandatafusion_jl_spark.functions.text import token_kl_drift

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    src = tmp_path / "docs_src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(200 + i, "omega omega psi chi phi") for i in range(5)],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    mon = str(tmp_path / "kl_monitor")
    chk = str(tmp_path / "kl_chk")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = P.kl_drift_stream(stream, ref, mon, chk)
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()

    got = {
        r["__epoch"]: (r["vocab"], r["n_tokens_b"], r["kl_ab"], r["kl_ba"])
        for r in spark.read.parquet(mon).collect()
    }
    assert set(got) == {"batch_0", "batch_1"}
    for epoch, batch in (("batch_0", b1), ("batch_1", b2)):
        (want,) = token_kl_drift(ref, batch).collect()
        assert got[epoch] == (
            want["vocab"], want["n_tokens_b"], want["kl_ab"], want["kl_ba"]
        ), epoch
    # the off-reference batch gained novel mass: kl_ba far larger
    assert got["batch_1"][3] > got["batch_0"][3] * 5
    # replay from a fresh checkpoint: rows rewritten, not duplicated
    shutil.rmtree(chk, ignore_errors=True)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q2 = P.kl_drift_stream(stream2, ref, mon, chk)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(mon).count() in (1, 2)  # replay may fold
    # batches into one epoch; either way nothing duplicated per epoch
    per_epoch = (
        spark.read.parquet(mon).groupBy("__epoch").count().collect()
    )
    assert all(r["count"] == 1 for r in per_epoch)


def test_quality_stream_matches_batch_scores(spark, tmp_path):
    """r14: streaming quality scoring from the persisted artifact equals
    batch score_quality on the same rows (map-only plan, no state)."""
    from bayesiandatafusion_jl_spark.functions import quality_model as qm

    good = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog near the river"
                " bank while reading a long book about history and maps")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    bad = spark.createDataFrame(
        [(100 + i, "zzq zzq zzq blgh zzq qqz zzq zzq zzq zzq zzq zzq zzq"
                    " zzq zzq zzq zzq zzq zzq zzq") for i in range(20)],
        "doc_id long, text string",
    )
    seed = good.withColumn("label", F.lit(1.0)).unionByName(
        bad.withColumn("label", F.lit(0.0))
    )
    model = qm.train_quality_classifier(seed)
    d = str(tmp_path / "qmodel_stream")
    qm.save_quality_model(spark, model, d, qm.seed_fingerprint(seed))

    src = tmp_path / "qdocs_src"
    src.mkdir()
    probe = good.unionByName(bad)
    probe.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    name = "q_quality_stream_mem"
    q = (
        P.quality_stream(stream, d)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "q_chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: round(r["p_good"], 12)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r["doc_id"]: round(r["p_good"], 12)
        for r in qm.score_quality(model, probe).collect()
    }
    assert got == want and len(got) == 40


def test_setsim_ingest_stream_exact_cross_batch(spark, tmp_path):
    """r15: the EXACT twin of test_near_dup_stream — twins arriving in
    later micro-batches must pair (with exact jaccard) against the
    pre-stream index AND against earlier micro-batches via the index
    append; unrelated docs never pair."""
    from bayesiandatafusion_jl_spark.functions.setsim_index import (
        write_setsim_index,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    src = str(tmp_path / "ss_docs_in")
    index_dir = str(tmp_path / "ss_index")
    pairs_out = str(tmp_path / "ss_pairs")
    ckpt = str(tmp_path / "ss_ckpt")

    def doc(i, drop_first=False):
        toks = [f"w{i}x{j}" for j in range(30)]
        return (i, " ".join(toks[1:] if drop_first else toks))

    seed = spark.createDataFrame(
        [doc(i) for i in range(10)], "doc_id long, text string"
    )
    write_setsim_index(seed, index_dir)

    import os

    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    b1 = [doc(i) for i in range(101, 105)] + [(100, doc(3, True)[1])]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    q = P.setsim_ingest_stream(stream, index_dir, pairs_out, ckpt, tau=0.5)
    try:
        q.processAllAvailable()
        b2 = [(200, doc(101, True)[1]), doc(201)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r.id_a, r.id_b): (r.jaccard, r.pair_type)
        for r in spark.read.parquet(pairs_out).collect()
    }
    # exact scores: a 29-of-30-token subset has J = 29/30
    want_j = round(29 / 30, 6)
    assert rows[(3, 100)] == (want_j, "new_index")
    assert rows[(101, 200)] == (want_j, "new_index")
    assert not any(201 in k for k in rows)


def test_winnow_ingest_stream_cross_batch(spark, tmp_path):
    """r15: the span-grain member of the dedup-stream trio — a batch-2
    doc sharing a long run with a batch-1 doc must pair via the index
    append; pre-stream index docs pair too; unrelated docs never."""
    from bayesiandatafusion_jl_spark.functions.winnow_index import (
        write_winnow_index,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    src = str(tmp_path / "wn_docs_in")
    index_dir = str(tmp_path / "wn_index")
    pairs_out = str(tmp_path / "wn_pairs")
    ckpt = str(tmp_path / "wn_ckpt")

    def doc(i, shared=None):
        own = [f"w{i}x{j}" for j in range(20)]
        return (i, " ".join(own + (shared.split() if shared else [])))

    run = "a long shared boilerplate run of twelve very specific tokens x y"
    seed = spark.createDataFrame(
        [doc(0, run)] + [doc(i) for i in range(1, 8)],
        "doc_id long, text string",
    )
    write_winnow_index(seed, index_dir)

    import os

    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run2 = "another distinct plagiarized span carried across micro batches q r"
    b1 = [doc(100, run), doc(101, run2), doc(102)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    q = P.winnow_ingest_stream(
        stream, index_dir, pairs_out, ckpt, min_shared=1
    )
    try:
        q.processAllAvailable()
        b2 = [doc(200, run2), doc(201)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    pairs = {
        (r.id_a, r.id_b): r.pair_type
        for r in spark.read.parquet(pairs_out).collect()
    }
    assert pairs[(0, 100)] == "new_index"    # stream vs pre-stream index
    assert pairs[(101, 200)] == "new_index"  # batch 2 vs batch 1 via append
    assert not any(201 in k or 102 in k for k in pairs)
