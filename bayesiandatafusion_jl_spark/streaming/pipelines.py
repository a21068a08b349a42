"""Structured Streaming pipelines (SURVEY §2.J — J7–J11).

The reference is batch-only (MCMC over a static dataset); these are the
north-star streaming extensions. Design:

- Every pipeline is a *transformation function* over a DataFrame that works
  identically on a batch frame and a ``readStream`` frame — the batch runs
  (``streaming.queries``) are the DuckDB-checked correctness reference, and
  these functions are the single source of the window expressions, so batch
  and stream cannot drift.
- Event time comes from the ``ts`` column; late data is governed by
  ``withWatermark`` (J10): state for windows older than
  ``max(event_time) − delay`` is evicted and later rows are dropped.
  Watermark state scales with #open windows × #keys, not with input rows —
  at 100 TB/day this is what keeps the agg state bounded.
- ``dropDuplicatesWithinWatermark`` (J11) bounds dedup state the same way:
  the key store only spans the watermark horizon, not all history.

Scale notes: the shuffle for a streaming groupBy(window, key) is identical
to the batch one (hash by (window, key)); skewed keys are handled by AQE
in batch and by state-store partitioning (``spark.sql.shuffle.partitions``
fixed at first run of a checkpointed query) in streaming — size it BEFORE
first deploy, it cannot change under the same checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.session import shuffle_partitions

# canonical events schema after catalog's ns→ts normalization
EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, value double, "
    "props string, ts timestamp"
)


def parquet_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a directory of parquet drops. Each new file
    becomes (at least) one micro-batch; the production equivalent is a
    Kafka/cloud-files source with the same downstream plan."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """J7 + J10 — tumbling event-time window per event_type with late-data
    eviction. Append-mode emits a window exactly once, when the watermark
    passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 day",
    slide: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """J8 — sliding window: each event contributes to window/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """J9 — gap-based session windows per user: a session closes after
    ``gap`` of inactivity; state merges adjacent windows as rows arrive."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            (F.unix_timestamp("s.end") - F.unix_timestamp("s.start")).alias(
                "duration_s"
            ),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """J11 — stateful streaming dedup bounded by the watermark horizon.
    Streaming-only: the batch equivalent is plain ``dropDuplicates`` (B4).
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def _ewma_fold(values, alpha: float, m: float | None = None):
    """Recursive EWMA fold — the SINGLE source of the semantics for both
    the batch reference and the stateful stream, so they cannot drift.
    Returns (per-row ewma list, final state)."""
    out = []
    for v in values:
        v = float(v)
        m = v if m is None else alpha * v + (1.0 - alpha) * m
        out.append(m)
    return out, m


EWMA_SCHEMA = "user_id long, event_id long, ts timestamp, value double, ewma double"


def ewma_scores(
    events: DataFrame, alpha: float = 0.2, n_blocks: int | None = None
) -> DataFrame:
    """Per-user recursive EWMA over event values — the BATCH reference for
    ``ewma_stream``. An EWMA is an order-dependent fold (each output
    depends on the previous one), which no windowed aggregate expresses.

    Plan shape (the ml/bpmf.py applyInPandas discipline): ONE shuffle on a
    BLOCK key (users hash-assigned to ~shuffle-partition-count blocks) and
    one pandas call per block that folds each of its users — grouping by
    user directly costs one Python dispatch per user (~ms each), which
    dominates wall-clock at high user counts; block grouping makes the
    call count equal to the parallelism. Timestamps cross the Arrow
    boundary as µs longs (timestamp columns pay a per-batch conversion)
    and are rebuilt JVM-side."""
    if n_blocks is None:
        n_blocks = shuffle_partitions(events.sparkSession)

    def fold(pdf):
        pdf = (
            pdf.drop(columns="__b")
            .sort_values(["user_id", "ts_us", "event_id"])
            .reset_index(drop=True)
        )
        out: list = []
        # users are contiguous after the sort; sort=False preserves that
        # order, so the concatenated folds align with the frame rows
        for _, grp in pdf.groupby("user_id", sort=False):
            vals, _ = _ewma_fold(grp["value"].to_numpy(), alpha)
            out.extend(vals)
        return pdf.assign(ewma=out)[
            ["user_id", "event_id", "ts_us", "value", "ewma"]
        ]

    folded = (
        events.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
            F.pmod("user_id", F.lit(n_blocks)).alias("__b"),
        )
        .groupBy("__b")
        .applyInPandas(
            fold, "user_id long, event_id long, ts_us long, value double, ewma double"
        )
    )
    return folded.select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "value",
        "ewma",
    )


def ewma_stream(
    events: DataFrame,
    alpha: float = 0.2,
    watermark: str = "1 hour",
    state_ttl_ms: int = 7_200_000,
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    (§2.K surface): per-user recursive EWMA carried across micro-batches.

    State per user is ONE scalar (the current mean) — state size scales
    with ACTIVE users, never with history. A user whose last event is
    older than ``state_ttl_ms`` behind the watermark is evicted by an
    event-time timeout (the timed-out branch removes the state and emits
    nothing); a later event for an evicted user restarts its fold from
    scratch — the documented TTL semantics, same state-boundedness
    contract as J10/J11.

    Exactness contract: within a micro-batch rows fold in (ts, event_id)
    order; ACROSS batches the fold follows arrival order, so the stream
    matches the batch reference exactly when files/offsets arrive in
    event-time order (the replay/Kafka-per-key-ordered case). Out-of-order
    arrival across batches is a semantic limit of any online recursive
    statistic, not of this plan.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        pdf = (
            pd.concat(list(pdfs))
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        m = state.get[0] if state.exists else None
        out, m = _ewma_fold(pdf["value"].to_numpy(), alpha, m)
        state.update((m,))
        # arm the TTL off the user's LAST EVENT TIME (floored at the
        # current watermark): a timestamp computed from the watermark alone
        # lands in the past on the first batches (wm starts at 0) and a
        # past-dated timeout silently evicts the state at the next batch
        # even for groups WITH data (verified empirically). The epoch ms
        # come from the JVM-computed __ts_ms column, NOT pandas
        # .timestamp() — pandas treats the session-timezone-naive ts as
        # UTC, skewing the TTL by the zone offset on non-UTC sessions.
        last_ms = int(pdf["__ts_ms"].max())
        state.setTimeoutTimestamp(
            max(last_ms, state.getCurrentWatermarkMs()) + state_ttl_ms
        )
        yield pdf.assign(ewma=out)[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        events.select(
            "user_id", "event_id", "ts", "value",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("__ts_ms"),
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            EWMA_SCHEMA,
            "ewma double",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def score_stream(cells: DataFrame, model) -> DataFrame:
    """Online model serving: score an unbounded stream of (entity-id …)
    cells against a trained ``TrainResult``'s factor tables — the
    streaming face of I7's prediction kernel.

    Plan shape: a STATELESS stream-static join per entity mode (the factor
    side is static and dimension-sized, so it broadcasts into every
    micro-batch), then the same zip_with Hadamard-dot as batch
    ``predict``. No watermark, no state store: predictions append as cells
    arrive, and a model refresh is a blue/green restart with new factor
    tables (static sides are pinned at query start).

    Single-sample scoring (``use_samples=False``) by design: the S-sample
    Rao-Blackwellized average needs a per-cell groupBy — a stateful agg in
    streaming — so the posterior-mean path stays batch (``model.predict``)
    and the stream pays one join per mode, nothing more.
    """
    return model.predict(cells, use_samples=False)


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
):
    """Start a memory-sink query for tests/interactive use. Caller drives it
    with ``q.processAllAvailable()`` and reads ``SELECT * FROM <name>``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def attribution_join(
    events: DataFrame, watermark: str = "30 minutes", horizon_min: int = 60
) -> DataFrame:
    """Stream-STREAM inner join: every click joined to the same user's
    purchases within ``horizon_min`` minutes after it (click→purchase
    attribution — the canonical two-log-stream correlation a training-data
    pipeline runs over event feeds).

    On a streaming input both sides carry a watermark AND the join
    condition bounds purchase_ts to a click-relative range, which is what
    lets Spark bound the join STATE: a buffered click can be evicted once
    the purchase-side watermark passes click_ts + horizon, instead of
    buffering every click forever. Inner-join matches emit as they arrive
    (no watermark hold-back), so cross-micro-batch matches appear in the
    batch where the later side lands — pytest pins that state carry.

    The same function on a BATCH frame is the correctness reference (the
    oracle-checked ``q_stream_attribution``): watermarks are skipped (a
    batch frame has full history) and the plan is a plain range join
    shuffled on user_id.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("__b_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        buys = buys.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("__b_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(horizon_min)} MINUTES")
        )
    )
    return clicks.join(buys, cond, "inner").select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "amount"
    )


def near_dup_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_out: str,
    checkpoint_dir: str,
    jaccard_min: float = 0.5,
    **lsh_params,
):
    """Streaming incremental near-dup: every micro-batch of (doc_id, text)
    is LSH-probed against the persisted signature index
    (``functions.dedup_index``), its near-dup pairs appended to
    ``pairs_out`` (parquet), and its signatures appended to the index — so
    each arriving shard is deduped against ALL history (including earlier
    micro-batches) while only ever signing the new rows.

    This is ``foreachBatch`` by design, not a stateful operator: the dedup
    state (the signature index) must outlive the stream, be shared with
    batch jobs, and be rebuildable/compactable offline — a parquet index
    probed per batch gives all three, where an in-stream state store gives
    none. The per-batch work is the audited ``dedup_incremental`` plan
    (new shard signed once, (band,bucket) probe, no old-corpus recompute).

    Replay safety: BOTH writes are idempotent per batch. The pair sink is
    partitioned by batch_id with dynamic partition overwrite, and the
    index append goes to ``__epoch=batch_<id>`` the same way
    (``dedup_incremental``'s epoch contract) — a replayed micro-batch
    replaces its own earlier pair partition AND its own index epoch, so a
    crash between the index append and the sink write cannot duplicate
    signatures or emit a batch's pairs twice. The replay also reproduces
    the ORIGINAL pair set byte-for-byte: ``dedup_incremental`` excludes
    the batch's own ``__epoch`` from its probe scans, so signatures left
    by the crashed attempt cannot re-surface intra-batch dups as
    ``new_index`` pairs (r9 fix; pinned by
    tests/test_dedup_index.py::test_replay_reproduces_original_pair_set).

    Returns the started query; drive with ``processAllAvailable()`` or a
    trigger.
    """
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        dedup_incremental,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        pairs = dedup_incremental(
            batch_df.select("doc_id", "text"),
            index_dir,
            jaccard_min=jaccard_min,
            update_index=True,
            epoch=f"batch_{batch_id}",
            **lsh_params,
        ).withColumn("batch_id", F.lit(batch_id))
        # partitioned by batch_id: a replayed batch overwrites its own
        # partition (idempotent), never others
        pairs.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(pairs_out)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def setsim_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_out: str,
    checkpoint_dir: str,
    tau: float = 0.5,
):
    """Streaming incremental EXACT set-similarity dedup (r15): every
    micro-batch of (doc_id, text) PPJoin-probes the persisted token
    index (``functions.setsim_index``) for exact Jaccard ≥ tau pairs
    against ALL history, appends its pairs to ``pairs_out``, and appends
    its ranked tokens to the index — the exact-scoring twin of
    ``near_dup_stream``, same foreachBatch/epoch replay contract: both
    writes are idempotent per batch (pair sink partitioned by batch_id
    with dynamic overwrite; the index append is
    ``setsim_incremental``'s per-epoch overwrite, whose probe scans
    exclude the batch's own epoch — a replay reproduces the ORIGINAL
    pair set byte-for-byte)."""
    from bayesiandatafusion_jl_spark.functions.setsim_index import (
        setsim_incremental,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        pairs = setsim_incremental(
            batch_df.select("doc_id", "text"),
            index_dir,
            tau=tau,
            update_index=True,
            epoch=f"batch_{batch_id}",
        ).withColumn("batch_id", F.lit(batch_id))
        pairs.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(pairs_out)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def winnow_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_out: str,
    checkpoint_dir: str,
    min_shared: int = 2,
    max_df: int | None = None,
):
    """Streaming incremental span-overlap detection (r15): every
    micro-batch of (doc_id, text) probes the persisted winnowing
    fingerprint index (``functions.winnow_index``) for overlap pairs
    against ALL history, appends its pairs to ``pairs_out``, and appends
    its fingerprints — the third member of the dedup-stream trio
    (``near_dup_stream`` estimates, ``setsim_ingest_stream`` exact
    Jaccard, this one span-grain). Same foreachBatch/epoch replay
    contract: both writes idempotent per batch, the probe excludes its
    own epoch, a replay reproduces the original pair set."""
    from bayesiandatafusion_jl_spark.functions.winnow_index import (
        winnow_overlap_incremental,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        pairs = winnow_overlap_incremental(
            batch_df.select("doc_id", "text"),
            index_dir,
            min_shared=min_shared,
            max_df=max_df,
            update_index=True,
            epoch=f"batch_{batch_id}",
        ).withColumn("batch_id", F.lit(batch_id))
        pairs.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(pairs_out)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def rag_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    max_drift: float = 0.15,
    on_drift: str = "error",
):
    """Streaming RAG corpus ingestion (r12): every micro-batch of
    (doc_id, text) is chunked + embedded under the persisted index's
    PINNED config (rag_meta) and appended as ``__epoch=stream_<id>`` —
    ``rag_retrieve_index`` then serves the growing corpus with no refit
    and no old-corpus re-read, and the batch-side lifecycle (epoch
    compaction, drift-guard refit) composes unchanged on the same index.

    ``foreachBatch`` by design, same rationale as ``near_dup_stream``:
    the retrieval index must outlive the stream, be shared with batch
    jobs, and be compactable/refittable offline — an in-stream state
    store gives none of that. Replay safety comes from the epoch
    contract: the append is a dynamic-partition overwrite of the batch's
    OWN ``(cell_id, __epoch)`` partitions and assignment under the
    stored quantizer is deterministic, so a retried micro-batch rewrites
    byte-identical partitions instead of duplicating vectors. The drift
    guard runs per batch — a vocabulary-shifted stream fails loudly (or
    warns, per ``on_drift``) instead of silently filling the wrong
    cells. Caller contract (as everywhere in the index family): doc_ids
    are globally unique across batches, and ONE (source, checkpoint)
    pair drives an index for its lifetime — a fresh checkpoint
    re-numbers batches from 0 and re-OVERWRITES the earlier stream_N
    epochs: byte-idempotent when it replays the same source (the
    recovery story), data loss if pointed at a DIFFERENT one (ingest
    new sources via a new index, or batch `rag_append_docs` with
    explicit epoch names).

    Returns the started query; drive with ``processAllAvailable()`` or a
    trigger.
    """
    from bayesiandatafusion_jl_spark.functions.rag import rag_append_docs

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        rag_append_docs(
            batch_df.select("doc_id", "text"),
            index_dir,
            epoch=f"stream_{batch_id}",
            max_drift=max_drift,
            on_drift=on_drift,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def matview_ingest_stream(
    facts_stream: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: list[str],
    minmax: bool = True,
    distinct_cols: list[str] | None = None,
    lg_k: int = 12,
    sumsq: bool = False,
    drift_z: float | None = None,
    on_drift: str = "error",
):
    """Streaming materialized-view maintenance (r12): every micro-batch
    of fact rows is aggregated to key grain and appended to a persisted
    matview (operators/matview.py) as its own ``__epoch=stream_<id>``
    partial — the view serves merged results mid-stream, batch jobs
    share it, and compaction folds the epoch partials offline.

    ``foreachBatch`` for the same reasons as ``rag_ingest_stream``: the
    view outlives the stream and composes with the batch lifecycle
    (append/retract/compact/config pin). Replay safety is the epoch
    contract — a retried micro-batch dynamically overwrites its OWN
    epoch partition with byte-identical partials (the batch aggregate is
    deterministic), never double-counts. Same caller contract as the
    index streams: ONE (source, checkpoint) pair drives a view for its
    lifetime; a fresh checkpoint renumbers batches from 0 and rewrites
    the stream_N epochs (recovery = byte-idempotent; pointing it at a
    different source = data corruption, use batch ``matview_append``
    with explicit epochs instead).

    ``drift_z`` (needs a ``sumsq=True`` view) runs ``matview_drift`` on
    every micro-batch BEFORE it is appended — the same per-batch guard
    discipline as ``rag_ingest_stream``'s vocabulary drift check: a
    batch whose per-key means sit more than ``drift_z`` standard errors
    from the view's history raises (``on_drift="error"``) or warns and
    ingests anyway (``"warn"``); ``new_key``/``low_n`` rows never trip
    the guard (new keys are growth, not drift).

    Returns the started query; drive with ``processAllAvailable()`` or
    a trigger.
    """
    import warnings

    from bayesiandatafusion_jl_spark.operators.matview import (
        matview_append,
        matview_drift,
    )

    if on_drift not in ("error", "warn"):
        raise ValueError(f"on_drift must be 'error' or 'warn', got {on_drift!r}")
    if drift_z is not None and not sumsq:
        raise ValueError("drift_z needs sumsq=True (std from state)")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if drift_z is not None:
            bad = [
                r
                for r in matview_drift(
                    batch_df, view_dir, keys, measures, z_thresh=drift_z,
                    minmax=minmax, distinct_cols=distinct_cols, lg_k=lg_k,
                ).collect()
                if r["status"] == "drift"
            ]
            if bad:
                detail = "; ".join(
                    f"{tuple(r[k] for k in keys)}/{r['measure']}: z={r['z']}"
                    for r in bad[:5]
                )
                msg = (
                    f"matview stream batch {batch_id}: {len(bad)} "
                    f"(key, measure) cells drifted past z={drift_z} — {detail}"
                )
                if on_drift == "error":
                    raise ValueError(msg)
                warnings.warn(msg, stacklevel=2)
        matview_append(
            batch_df,
            view_dir,
            keys,
            measures,
            epoch=f"stream_{batch_id}",
            minmax=minmax,
            distinct_cols=distinct_cols,
            lg_k=lg_k,
            sumsq=sumsq,
        )

    return (
        facts_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def bm25_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
):
    """Streaming BM25 corpus ingestion (r12): every micro-batch of
    (doc_id, text) is tokenized under the index's PINNED bucketing and
    appended as ``__epoch=stream_<id>`` — ``bm25_query_index`` then
    serves the growing corpus with exact IDF/avgdl (per-epoch stats sum
    at probe time; df is recomputed from the posting lists, so there is
    nothing to go stale).

    ``foreachBatch`` for the same reason as ``rag_ingest_stream`` /
    ``near_dup_stream``: the index must outlive the stream and be shared
    with batch jobs. Replay safety is the epoch contract — a retried
    micro-batch dynamic-overwrites its own ``(tok_bucket, __epoch)``
    partitions and its own stats row byte-identically. Caller contract:
    doc_ids globally unique across batches; one (source, checkpoint)
    pair per index lifetime.

    Returns the started query; drive with ``processAllAvailable()`` or a
    trigger.
    """
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        index_paths,
        read_meta,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        (meta_path,) = index_paths(index_dir, "meta")
        n_buckets = read_meta(batch_df.sparkSession, meta_path)["n_buckets"]
        write_bm25_index(
            batch_df.select("doc_id", "text"),
            index_dir,
            n_buckets=n_buckets,
            mode="append",
            epoch=f"stream_{batch_id}",
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


TRANSITIONS_SCHEMA = (
    "user_id long, from_type string, to_type string, ts timestamp"
)


def transitions_stream(
    events: DataFrame,
    watermark: str = "1 hour",
    state_ttl_ms: int = 7_200_000,
) -> DataFrame:
    """CUSTOM stateful streaming operator: per-user event-type transition
    pairs carried across micro-batches — the streaming face of
    ``operators.temporal.event_transitions``. Each emitted row is one
    (from_type → to_type) edge with the TO event's timestamp; a
    downstream tumbling count (or a matview ingest) turns the edge
    stream into the live transition matrix.

    State per user is ONE tuple (last event's type, event-time ms,
    event_id) — state scales with ACTIVE users, never with history, and
    the same event-time TTL/eviction contract as ``ewma_stream``: a user
    idle for ``state_ttl_ms`` behind the watermark is evicted, and a
    later event restarts its chain (emitting no cross-gap edge — the
    same boundary a session gap would impose).

    Exactness contract (shared with ``ewma_stream``): rows fold in
    (ts, event_id) order within a micro-batch and in arrival order
    across batches, so the edge stream equals the batch matrix exactly
    under event-time-ordered arrival (replay / per-key-ordered Kafka).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        pdf = (
            pd.concat(list(pdfs))
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        types = pdf["event_type"].tolist()
        prev = state.get[0] if state.exists else None
        froms, tos, ts_out = [], [], []
        for i, t in enumerate(types):
            if prev is not None:
                froms.append(prev)
                tos.append(t)
                ts_out.append(pdf["ts"].iloc[i])
            prev = t
        state.update((prev,))
        last_ms = int(pdf["__ts_ms"].max())
        state.setTimeoutTimestamp(
            max(last_ms, state.getCurrentWatermarkMs()) + state_ttl_ms
        )
        if froms:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "from_type": froms,
                    "to_type": tos,
                    "ts": ts_out,
                }
            )

    return (
        events.select(
            "user_id", "event_id", "event_type", "ts",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("__ts_ms"),
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            TRANSITIONS_SCHEMA,
            "last_type string",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def anomaly_stream(
    events: DataFrame,
    matrix: DataFrame,
    watermark: str = "1 hour",
    state_ttl_ms: int = 7_200_000,
    unseen_nll: float | None = None,
) -> DataFrame:
    """Live behavioral anomaly scoring — the streaming face of
    ``operators.temporal.transition_anomaly``, completing the r13 drift
    trio (KL drift + batch anomaly + live anomaly) for ingestion.

    ``transitions_stream`` turns the event stream into per-user
    (from_type → to_type) edges (one-tuple state per user, TTL
    eviction); each micro-batch's edges join a BROADCAST static
    ``matrix`` — the (from_type, to_type, p) frame of a persisted
    ``event_transitions`` output, i.e. the model is TRAINED OFFLINE and
    served read-only, exactly how a deployment separates baseline
    fitting from live monitoring. Per-edge score = −ln p with the
    float32 collapse of the batch twin, so a downstream per-user
    decimal-summed mean reproduces ``transition_anomaly``'s numbers
    bit-for-bit on the same edges.

    ``unseen_nll``: an edge ABSENT from the matrix is the most
    anomalous signal a monitor can see; by default its nll is NULL
    (visible, never silently averaged), or pin it to an explicit
    surprise level (e.g. −ln of a floor probability) to make planted
    outliers jump the per-user mean.

    Scale shape: the stateful edge operator shuffles on user once; the
    matrix join is broadcast (|types|² rows); scoring adds zero
    additional shuffles per micro-batch.
    """
    edges = transitions_stream(events, watermark, state_ttl_ms)
    m = matrix.select("from_type", "to_type", "p")
    nll = (-F.log("p")).cast("float").cast("double")
    score = (
        nll if unseen_nll is None else F.coalesce(nll, F.lit(float(unseen_nll)))
    )
    return edges.join(F.broadcast(m), ["from_type", "to_type"], "left").select(
        "user_id", "from_type", "to_type", "ts", score.alias("nll")
    )


def kl_drift_stream(
    docs_stream: DataFrame,
    reference_docs: DataFrame,
    monitor_dir: str,
    checkpoint_dir: str,
):
    """Live corpus-drift monitoring — the streaming face of
    ``functions.text.token_kl_drift``, third member of the live monitor
    set (anomaly_stream scores behavior, this scores vocabulary). The
    REFERENCE snapshot (e.g. the pinned training corpus) is static;
    each micro-batch of incoming documents is compared against it and
    ONE row (vocab, n_tokens_a=reference, n_tokens_b=batch, kl_ab,
    kl_ba) lands in ``monitor_dir`` under ``__epoch=batch_<id>`` — the
    epoch-store write, so a replayed batch after a checkpoint reset
    rewrites its own row byte-identically instead of duplicating it.
    An alerting job reads ``monitor_dir`` and thresholds kl_ba (mass
    the batch gained that the reference never had).

    Numbers equal the batch ``token_kl_drift(reference, batch_rows)``
    exactly (same decimal-summed float32-collapsed kernel) —
    batch≡stream parity is pytest-gated.
    """
    from bayesiandatafusion_jl_spark.functions.index_meta import write_epoch
    from bayesiandatafusion_jl_spark.functions.text import token_kl_drift

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        write_epoch(
            token_kl_drift(reference_docs, batch_df),
            monitor_dir,
            f"batch_{batch_id}",
            fresh=False,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def quality_stream(
    docs_stream: DataFrame, model_dir: str, text_col: str = "text"
) -> DataFrame:
    """Score a document stream with the PERSISTED quality classifier
    (functions/quality_model.py): the model loads once on the driver,
    and scoring is a pure map (hash featurization + one dot product per
    row — the plan Structured Streaming accepts without state), so this
    is the live face of the corpus quality gate: train offline on the
    seed, persist with the meta pin, filter the firehose. Emits the
    input columns + ``p_good``; scores equal the batch
    ``score_quality`` on the same rows exactly (pytest parity)."""
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        load_quality_model,
        score_quality,
    )

    model, n_features = load_quality_model(
        docs_stream.sparkSession, model_dir
    )
    return score_quality(model, docs_stream, text_col, n_features)


def pipeline_ingest_stream(
    docs_stream: DataFrame,
    pipeline_dir: str,
    checkpoint_dir: str,
    model_dir: str | None = None,
):
    """Streaming maintenance of a persisted training-data pipeline
    (functions/pipeline_store.py): each micro-batch of new documents
    appends as its own ``stream_<batch_id>`` epoch — shard-local flags
    against the pinned benchmark grams, first-writer dedup against all
    prior epochs, per-epoch packing and shard write. Same
    foreachBatch/epoch replay contract as the other ingest streams: a
    retried batch rewrites its own epoch partitions idempotently.
    ``model_dir`` (r15): a pipeline built with a quality classifier
    requires the SAME model artifact here — each batch is scored
    map-only and the pin is verified per append, exactly like the batch
    path."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        append_pipeline_shard,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        append_pipeline_shard(
            batch_df, pipeline_dir, f"stream_{batch_id}",
            model_dir=model_dir,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def topk_ingest_stream(
    facts_stream: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str,
    payload_cols: list[str],
    k: int,
):
    """Streaming maintenance of a persisted top-k view
    (operators/matview.py r13): each micro-batch reduces to its own
    |keys|·k ``__epoch=stream_<id>`` state partition; the view serves
    merged leaders mid-stream and compaction folds the epochs offline.
    Same foreachBatch/epoch replay contract as ``matview_ingest_stream``
    (a retried batch rewrites its own epoch byte-identically — the
    batch top-k is deterministic including ties)."""
    from bayesiandatafusion_jl_spark.operators.matview import (
        topk_view_append,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        topk_view_append(
            batch_df, view_dir, keys, order_col, payload_cols, k,
            epoch=f"stream_{batch_id}",
        )

    return (
        facts_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
