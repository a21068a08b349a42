"""Persisted, restartable training-data pipeline (VERDICT r13 #4).

``q_llm_pipeline_compose`` proves the one-scan math of the composed
pretraining pipeline (quality → prefix-dedup → decontaminate → mixture →
pack); this module is its DURABLE form — the thing an actual
training-data run executes: corpus snapshot in, trainer-ready shards on
disk out, every stage's counts in a manifest, and a kill at any point
resumes WITHOUT re-running completed stages.

Layout under ``pipeline_dir/`` (the index-family discipline —
config-pinned meta, per-stage artifacts, manifest as the done-ledger):

    meta        one row pinning (capacity, n_shards, seed, decon n,
                corpus fingerprint) — a resume under different params or
                against a CHANGED corpus refuses loudly instead of
                mixing two configurations in one artifact.
    evgrams/    the PINNED decontamination benchmark: the base
                snapshot's eval-source n-grams, persisted so shard
                appends decontaminate against exactly this set.
    flags/      stage 1, ``__epoch=<e>``-partitioned: the doc-grain
                flags frame (ONE text scan per epoch; see
                functions/pipeline._pipeline_flags). Raw / quality /
                dedup / decontaminated / mixture counts are aggregates
                over all epochs.
    packed/     stage 2, per-epoch: (doc_id, n_tokens, bin_id) — the
                exact two-phase prefix-scan packing of each epoch's own
                mixture survivors; context windows are (__epoch,
                bin_id) pairs (history is never repacked).
    shards/     stage 3, ``__epoch=<e>/shard=K/`` parquet, one
                pos-sorted file per shard per epoch
                (sources/io.write_shuffled_shards) carrying the
                surviving documents' text + bin assignment — what the
                trainer reads round-robin.
    manifest/   ``stage=<name>/`` partitions of (stage, n_docs,
                n_tokens). A stage's manifest partition is written ONLY
                after its artifact lands (crash between the two: the
                artifact is overwrite-idempotent and re-runs; the safe
                direction), so manifest presence IS the done marker the
                resume skips by; appends recount all epochs (doc-grain).

``append_pipeline_shard`` / ``streaming.pipelines.pipeline_ingest_stream``
ingest NEW corpus shards incrementally: the shard pays its own flags
scan, per-epoch packing, and shard write; dedup is first-writer-wins
across epochs (== the one-shot rule when ids arrive increasing) and the
decon benchmark stays the build-time pin. The base corpus is never
re-read.

``model_dir=`` (r15) wires the persisted quality classifier
(functions/quality_model.py) as an optional ``classifier`` stage
between the heuristic quality gate and dedup: the corpus is scored
MAP-ONLY from the loaded artifact (the verdict column rides the one
flags scan — zero extra shuffles or text reads), the model's seed
fingerprint + n_features + threshold join the meta pin, a
``classifier`` row joins the manifest, and every append/stream batch
must present the SAME model or refuse — the two r14 flagship features
compose (VERDICT r14 "What's missing" #2).

Crash contract: every stage write is an idempotent overwrite of its own
directory, ordered artifact-then-manifest. A kill mid-stage leaves no
manifest row → the stage re-runs from its PERSISTED predecessor (never
from the corpus scan backwards). The manifest counts equal
``pipeline_stage_counts``'s rows by construction — both derive from the
same flags/pack implementations — and the equality is pytest-pinned.

Scale shape: a fresh build reads the corpus text exactly twice
end-to-end — once into the doc-grain flags frame (stage 1; the corpus
snapshot fingerprint rides this scan as an ``observe`` aggregate
rather than paying its own pass — r16), once re-reading ONLY the
mixture survivors for the shard write (a plain doc_id equi-join on the
packed frame, stage 3 — un-hinted, because the base build's survivor
set is corpus-sized; AQE broadcasts it when it is actually small,
while the shard APPEND path broadcasts its own shard-bounded packed
frame explicitly). A RESUME additionally pays one fingerprint scan to
verify the caller's corpus against the pin — the refusal contract's
price. Stage 2's packing and every count run on doc-grain frames,
orders of magnitude smaller than the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.index_meta import (
    check_meta,
    index_paths,
    write_meta,
)
from bayesiandatafusion_jl_spark.functions.packing import pack_sequences
from bayesiandatafusion_jl_spark.functions.pipeline import (
    _CAPACITY,
    _pipeline_flags,
    _stage_count_rows,
    _survive,
    _with_clf_column,
)
from bayesiandatafusion_jl_spark.registry import register

_FLAG_STAGES = ("raw", "quality", "dedup", "decontaminated", "mixture")
_FLAG_STAGES_CLF = (
    "raw", "quality", "classifier", "dedup", "decontaminated", "mixture"
)
# sentinel meta value for "no trained model wired" — meta rows are ints
_NO_MODEL = -1


def _model_pin(
    spark: SparkSession, model_dir: str | None, threshold: float
) -> tuple[int, int, int]:
    """(model_seed_fp, model_nf, model_thr_ppm) for the pipeline meta
    pin — read from the MODEL's own meta (cheap; no model-bytes load),
    after verifying the artifact's featurizer matches this revision (a
    model in a different hashed gram space must refuse here, not
    mis-score silently)."""
    if model_dir is None:
        return (_NO_MODEL, _NO_MODEL, _NO_MODEL)
    # validate the QUANTIZED value: the pin stores ppm, and the base
    # build + every append score at ppm/1e6 (one quantization, applied
    # everywhere — a raw-float gate here with a ppm pin would let
    # model_threshold=0.9999996 build an artifact whose own appends
    # then refuse forever at thr=1.0)
    ppm = int(round(threshold * 1_000_000))
    if not (0 < ppm < 1_000_000):
        raise ValueError(
            f"model_threshold must sit in (0, 1) at ppm resolution;"
            f" {threshold} quantizes to {ppm} ppm"
        )
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        _featurizer_fp,
    )

    (meta_path,) = index_paths(model_dir, "meta")
    check_meta(
        spark,
        meta_path,
        "this quality model was trained under a different featurization"
        " — its coefficients do not live in the gram space this pipeline"
        " would score with; retrain and re-save it",
        featurizer_fp=_featurizer_fp(),
    )
    m = read_meta(spark, meta_path).asDict()
    return (int(m["seed_fp"]), int(m["n_features"]), ppm)


def _score_clf(docs: DataFrame, model_dir: str, threshold: float) -> DataFrame:
    """docs + ``__keep_clf``: the trained gate's verdict, scored
    map-only from the persisted artifact (zero shuffles — the column
    rides the flags scan)."""
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        load_quality_model,
        score_quality,
    )

    model, nf = load_quality_model(docs.sparkSession, model_dir)
    return (
        score_quality(model, docs, n_features=nf)
        .withColumn("__keep_clf", F.col("p_good") >= F.lit(threshold))
        .drop("p_good")
    )


def _corpus_fp(docs: DataFrame) -> int:
    """Order-independent 28-bit fingerprint of the input corpus snapshot
    (doc ids + text): a resume against a corpus that changed since the
    build must refuse — the artifact describes THAT snapshot.

    This standalone form pays a full corpus scan; it runs ONLY on the
    resume path (meta already pinned — the contract price of verifying
    the caller's corpus). A FRESH build instead rides the identical
    per-row hash through the stage-1 flags scan as the ``__cfp`` rider
    column (``_pipeline_flags(include_cfp=True)``) and recovers the pin
    from the WRITTEN doc-grain flags artifact plus one tiny
    source-pruned scan of the eval rows the flags exclude
    (``_fp_from_artifact``) — no full-corpus fingerprint pass. NOT an
    ``observe()`` aggregate on purpose: pyspark's Observation
    permanently initializes the session's ObservationManager, which is
    not java-serializable, and any LATER task closure that captures the
    session — e.g. a freshly trained MLlib model whose trainingSummary
    holds one — then dies with Task-not-serializable (reproduced on
    Spark 4.1.2; regression-pinned in tests/test_pipeline.py)."""
    row = docs.select(_fp_hash().alias("h")).agg(
        F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return int(((row["s"] or 0) + row["n"]) % (1 << 28))


def _fp_hash() -> F.Column:
    """The one per-row hash both fingerprint forms share — any drift
    between them would make every resume refuse. (A function, not a
    module constant: Column construction needs an active SparkContext.)"""
    return F.xxhash64("doc_id", "text") % F.lit(1 << 28)


def _fp_from_artifact(spark: SparkSession, flags_path: str, docs: DataFrame) -> int:
    """The fresh build's corpus fingerprint, recovered WITHOUT a
    full-corpus pass: the non-eval component is the sum of the ``__cfp``
    rider column over the doc-grain flags artifact stage 1 just wrote
    (cheap — no text), the eval component is one source-pruned scan of
    exactly the rows ``_pipeline_flags`` excludes (the module already
    calls the eval side 'a second, tiny read'). non-eval + eval = every
    corpus row, so the result is bit-identical to ``_corpus_fp(docs)``
    (pytest-pinned)."""
    from bayesiandatafusion_jl_spark.functions.pipeline import _EVAL_SOURCE

    f = spark.read.parquet(flags_path).agg(
        F.sum("__cfp").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    e = docs.filter(F.col("source") == _EVAL_SOURCE).select(
        _fp_hash().alias("h")
    ).agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    total = (f["s"] or 0) + (e["s"] or 0) + f["n"] + e["n"]
    return int(total % (1 << 28))


def _done_stages(spark: SparkSession, manifest_path: str) -> set[str]:
    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    fs, hpath, _ = _fs(spark, manifest_path)
    if not fs.exists(hpath):
        return set()
    return {
        r["stage"]
        for r in spark.read.parquet(manifest_path)
        .select("stage")
        .distinct()
        .collect()
    }


def _write_manifest(rows: DataFrame, manifest_path: str) -> None:
    """Append stage rows via dynamic partition overwrite — a retried
    stage rewrites its OWN partitions byte-identically, never duplicates
    them (the index-append idempotence discipline)."""
    rows.write.mode("overwrite").partitionBy("stage").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(manifest_path)


def build_pipeline(
    docs: DataFrame,
    pipeline_dir: str,
    capacity: int = _CAPACITY,
    n_shards: int = 8,
    seed: int = 42,
    model_dir: str | None = None,
    model_threshold: float = 0.5,
) -> DataFrame:
    """Build — or RESUME — the persisted pipeline at ``pipeline_dir``
    from a (doc_id, source, text) corpus snapshot. Returns the manifest
    frame (stage, n_docs, n_tokens), ordered by pipeline position.

    Each call runs only the stages whose manifest partition is missing;
    a completed build is a no-op readout. Parameter or corpus drift vs
    the pinned meta raises ValueError (build a NEW dir for a new config
    — artifacts never silently mix configurations).

    ``model_dir`` (r15): wire a PERSISTED quality classifier
    (``functions.quality_model.save_quality_model``) as a ``classifier``
    stage between the heuristic quality gate and dedup. The corpus is
    scored MAP-ONLY from the loaded artifact (the verdict rides the one
    flags scan — zero extra shuffles, zero extra text reads), documents
    below ``model_threshold`` drop, a ``classifier`` row joins the
    manifest, and the dedup representative election honors the gate (a
    classifier-failing doc never erases its duplicate family). The
    model's seed fingerprint, n_features, and the threshold join the
    meta pin — a resume or shard append under a DIFFERENT model or
    threshold refuses exactly like a capacity drift.
    """
    if n_shards < 1 or capacity < 1:
        raise ValueError(
            f"capacity/n_shards must be >= 1, got {capacity}/{n_shards}"
        )
    spark = docs.sparkSession
    meta_path, flags_path, packed_path, shards_path, manifest_path, ev_path = (
        index_paths(
            pipeline_dir, "meta", "flags", "packed", "shards", "manifest",
            "evgrams",
        )
    )
    import os

    m_seed_fp, m_nf, m_thr = _model_pin(spark, model_dir, model_threshold)
    fp: int | None = None
    if os.path.isdir(meta_path):
        # resume: verifying the caller's corpus against the pin is the
        # contract price — the one place the standalone fingerprint scan
        # still runs (a fresh build rides it on the flags scan below)
        fp = _corpus_fp(docs)
        from bayesiandatafusion_jl_spark.functions.index_meta import (
            read_meta,
        )

        pins = dict(
            capacity=capacity, n_shards=n_shards, seed=seed, corpus_fp=fp
        )
        if "model_seed_fp" in read_meta(spark, meta_path).asDict():
            pins.update(
                model_seed_fp=m_seed_fp, model_nf=m_nf, model_thr_ppm=m_thr
            )
        elif model_dir is not None:
            # a pre-r15 artifact has no model pin to verify against —
            # refusing beats silently grafting a model onto half-built
            # unclassified stages
            raise ValueError(
                f"pipeline at {pipeline_dir} predates the classifier"
                " stage (no model pin in meta) — build a new dir to wire"
                " a quality model"
            )
        check_meta(
            spark,
            meta_path,
            "a resume must run under the EXACT build configuration,"
            " corpus snapshot, and (when wired) quality-model artifact +"
            " threshold — build a new pipeline_dir for a new config",
            **pins,
        )
    done = _done_stages(spark, manifest_path)
    if fp is None and set(_FLAG_STAGES) <= done:
        # meta absent but the manifest marks stage 1 done — impossible
        # under this module's write order (meta lands BEFORE the first
        # manifest write), so the artifact was hand-edited or torn by an
        # external actor; refusing beats pinning a fingerprint we cannot
        # attribute to the flags on disk
        raise ValueError(
            f"pipeline at {pipeline_dir} has a manifest but no meta pin —"
            " the artifact is torn; rebuild into a fresh directory"
        )
    flag_stages = _FLAG_STAGES if model_dir is None else _FLAG_STAGES_CLF

    # ---- stage 1: flags (the one corpus text scan) -------------------
    # every artifact is an __epoch partition (base = this snapshot; a
    # later append_pipeline_shard adds its own epoch) via the shared
    # epoch store, so the whole lifecycle is replay-idempotent
    from bayesiandatafusion_jl_spark.functions.index_meta import write_epoch
    from bayesiandatafusion_jl_spark.functions.pipeline import _eval_grams

    if not set(flag_stages) <= done:
        # the benchmark set is PINNED at build: persisted before the
        # flags so appends decontaminate against exactly this frame
        _eval_grams(docs).write.mode("overwrite").parquet(ev_path)
        scored = (
            docs
            if model_dir is None
            # score at the PINNED (ppm-quantized) cutoff, so base docs
            # and every later shard gate at the identical threshold
            else _score_clf(docs, model_dir, m_thr / 1_000_000)
        )
        fresh = fp is None
        # fresh build: the snapshot fingerprint rides the flags scan as
        # the __cfp rider column instead of paying its own full corpus
        # pass (r16; see _corpus_fp's docstring for why this is a rider
        # column and NOT an observe() aggregate)
        write_epoch(
            _pipeline_flags(
                scored, spark.read.parquet(ev_path), include_cfp=fresh
            ),
            flags_path, "base", fresh=True,
        )
        if fresh:
            fp = _fp_from_artifact(spark, flags_path, docs)
            # meta lands BEFORE the first manifest write: a stage may
            # only be marked done under a pinned configuration (a crash
            # in between re-runs stage 1, whose writes are idempotent)
            write_meta(
                spark,
                meta_path,
                "overwrite",
                capacity=capacity,
                n_shards=n_shards,
                seed=seed,
                corpus_fp=fp,
                model_seed_fp=m_seed_fp,
                model_nf=m_nf,
                model_thr_ppm=m_thr,
            )
        _write_manifest(
            _stage_count_rows(
                spark.read.parquet(flags_path),
                include_classifier=model_dir is not None,
            ),
            manifest_path,
        )
        done |= set(flag_stages)

    flags = _with_clf_column(spark.read.parquet(flags_path))
    survivors = flags.filter(_survive("mixture")).select("doc_id", "n_tokens")

    # ---- stage 2: pack (doc-grain prefix scan) -----------------------
    if "packed" not in done:
        packed = pack_sequences(survivors, ["doc_id"], "n_tokens", capacity)
        write_epoch(
            packed.select("doc_id", "n_tokens", "bin_id"),
            packed_path, "base", fresh=True,
        )
        _write_manifest(_packed_row(spark, packed_path), manifest_path)
        done.add("packed")

    # ---- stage 3: shards (the ONLY text re-read, survivor-pruned) ----
    if "shards" not in done:
        from bayesiandatafusion_jl_spark.sources.io import (
            write_shuffled_shards,
        )

        packed_df = _read_parquet_or_none(spark, packed_path)
        if packed_df is not None:
            # Plain doc_id equi-join, NO broadcast hint (r15): the base
            # build's packed frame has one row per surviving document of
            # the WHOLE corpus — at the 100 TB design point that is
            # billions of rows, far past any broadcast limit, and a
            # forced hint would die exactly at the scale this module
            # targets. AQE still picks a broadcast join when the
            # survivor set is in fact small (the local test shape); the
            # shuffle join on doc_id is the correct large-corpus shape.
            # The APPEND path keeps its hint — there the packed side is
            # bounded by one shard, small by construction.
            body = docs.join(
                packed_df.drop("__epoch"), "doc_id"
            ).select("doc_id", "source", "text", "n_tokens", "bin_id")
            # one epoch subdirectory per snapshot/shard batch: replaying
            # a batch overwrites ITS directory, never duplicates into
            # shard=K
            write_shuffled_shards(
                body, f"{shards_path}/__epoch=base", ["doc_id"],
                n_shards, seed,
            )
        _write_manifest(_shards_row(spark, shards_path), manifest_path)

    return read_pipeline_manifest(spark, pipeline_dir)


def _read_parquet_or_none(spark: SparkSession, path: str):
    """Read a stage artifact, tolerating the EMPTY-stage layout: a
    partitioned write of zero rows leaves a directory with no parquet
    footers (schema uninferrable), which is a legitimate state for a
    heavily-filtered tiny corpus — not an error."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _packed_row(spark: SparkSession, packed_path: str) -> DataFrame:
    """The manifest's packed row: context windows are (__epoch, bin_id)
    pairs — per-epoch packing namespaces never collide."""
    df = _read_parquet_or_none(spark, packed_path)
    if df is None:
        return spark.createDataFrame(
            [("packed", 0, 0)], "stage string, n_docs long, n_tokens long"
        )
    return df.agg(
        F.countDistinct("__epoch", "bin_id").cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
    ).select(F.lit("packed").alias("stage"), "n_docs", "n_tokens")


def _shards_row(spark: SparkSession, shards_path: str) -> DataFrame:
    df = _read_parquet_or_none(spark, shards_path)
    if df is None:
        return spark.createDataFrame(
            [("shards", 0, 0)], "stage string, n_docs long, n_tokens long"
        )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
    ).select(F.lit("shards").alias("stage"), "n_docs", "n_tokens")


def append_pipeline_shard(
    shard_docs: DataFrame,
    pipeline_dir: str,
    epoch: str,
    model_dir: str | None = None,
) -> DataFrame:
    """Ingest one NEW corpus shard into a completed pipeline artifact —
    the incremental form of ``build_pipeline``: the shard pays its own
    flags scan, its own packing, and its own shard write; the base
    corpus is never re-read. Returns the refreshed manifest.

    Semantics vs the one-shot build, precisely:

    - quality / mixture: per-document, identical to the one-shot form.
    - decontamination: against the PINNED build-time benchmark grams
      (``evgrams``) — a shard cannot redefine the eval set, and
      eval-source rows inside a shard are excluded from training flags
      exactly like the build.
    - prefix-dedup: FIRST-WRITER-WINS across epochs — a new document
      whose fingerprint already has a kept representative in ANY prior
      epoch is dropped, and within the shard the lowest-id quality
      survivor of an unseen fingerprint wins. When appended ids are
      higher than existing ids (the normal ingest direction) this
      EQUALS the one-shot global-min rule; with interleaved ids the
      one-shot rebuild could elect a different (lower-id) representative
      — the standard incremental-dedup divergence, same contract as
      ``dedup_incremental``.
    - packing: per-epoch bins (windows never repack history); the
      manifest's packed row counts (__epoch, bin_id) windows.

    Replay-idempotent: every artifact write is a dynamic overwrite of
    the shard's own ``__epoch`` partitions, and the manifest is a full
    recount over all epochs (doc-grain — never a text re-read), so a
    crashed append is simply re-run. ``epoch='base'`` is reserved.

    ``model_dir`` (r15): a build that wired a quality classifier PINNED
    it — appends to such a pipeline must pass the SAME model artifact
    (seed fingerprint + n_features verified against the meta pin; the
    threshold comes from the pin, never the caller) and score their
    shard with it; appending without the model, with a drifted model, or
    passing a model to an unclassified build all refuse loudly.
    """
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        guard_append,
        read_meta,
        write_epoch,
    )
    from bayesiandatafusion_jl_spark.sources.io import write_shuffled_shards

    spark = shard_docs.sparkSession
    meta_path, flags_path, packed_path, shards_path, manifest_path, ev_path = (
        index_paths(
            pipeline_dir, "meta", "flags", "packed", "shards", "manifest",
            "evgrams",
        )
    )
    done = _done_stages(spark, manifest_path)
    if "shards" not in done:
        raise ValueError(
            f"pipeline at {pipeline_dir} is not a completed build (stages"
            f" done: {sorted(done)}) — finish build_pipeline before"
            " appending shards"
        )
    guard_append(spark, pipeline_dir, epoch, reserved=("base",))
    meta = read_meta(spark, meta_path).asDict()

    # classifier pin (r15): the build decided whether a model gates this
    # artifact; the append must match it exactly
    pinned_fp = int(meta.get("model_seed_fp", _NO_MODEL))
    has_model = pinned_fp != _NO_MODEL
    if has_model and model_dir is None:
        raise ValueError(
            f"pipeline at {pipeline_dir} was built with a quality model"
            f" (seed_fp={pinned_fp}) — appends must pass model_dir= so"
            " shards are gated exactly like the base corpus"
        )
    if not has_model and model_dir is not None:
        raise ValueError(
            f"pipeline at {pipeline_dir} was built WITHOUT a classifier"
            " stage — a shard cannot introduce one (its counts would not"
            " compose with the base manifest); build a new dir"
        )
    thr = 0.5
    if has_model:
        thr = int(meta["model_thr_ppm"]) / 1_000_000
        got_fp, got_nf, _ = _model_pin(spark, model_dir, thr)
        if (got_fp, got_nf) != (pinned_fp, int(meta["model_nf"])):
            raise ValueError(
                f"quality model at {model_dir} (seed_fp={got_fp},"
                f" n_features={got_nf}) is not the model this pipeline"
                f" pinned (seed_fp={pinned_fp},"
                f" n_features={int(meta['model_nf'])}) — score drift"
                " between shards; pass the build-time artifact"
            )
        shard_docs = _score_clf(shard_docs, model_dir, thr)

    # shard flags against the pinned benchmark; first-writer dedup
    # against every OTHER epoch's kept representatives (excluding this
    # epoch makes the append replay-idempotent)
    ev = spark.read.parquet(ev_path)
    existing_cols = spark.read.parquet(flags_path).columns
    # schema uniformity with the base partitions, both directions: a
    # pre-r15 artifact's flag partitions have no keep_clf column —
    # writing one only in the shard partition would leave a mixed
    # schema whose resolution depends on which footer Spark samples —
    # and an r16 build's base partition carries the __cfp fingerprint
    # rider, which the shard then computes too (free: it rides the
    # shard's own flags scan); a pre-r16 artifact gets no __cfp
    shard_flags = _pipeline_flags(
        shard_docs, ev, include_cfp="__cfp" in existing_cols
    )
    if "keep_clf" not in existing_cols:
        shard_flags = shard_flags.drop("keep_clf")
    existing_kept_fps = (
        _with_clf_column(spark.read.parquet(flags_path))
        .filter((F.col("__epoch") != epoch) & _survive("dedup"))
        .select("__fp")
        .distinct()
    )
    seen = existing_kept_fps.withColumnRenamed("__fp", "__seen_fp")
    # fp-grain equi-join (fixed-width hash keys, doc-grain frames — AQE
    # picks broadcast when the kept set is small; at corpus scale it is
    # a plain shuffle join, never text-sized)
    shard_flags = (
        shard_flags.join(
            seen, shard_flags["__fp"] == seen["__seen_fp"], "left"
        )
        .withColumn(
            "keep_dd", F.col("keep_dd") & F.col("__seen_fp").isNull()
        )
        .drop("__seen_fp")
    )
    write_epoch(shard_flags, flags_path, epoch, fresh=False)
    _write_manifest(
        _stage_count_rows(
            spark.read.parquet(flags_path), include_classifier=has_model
        ),
        manifest_path,
    )

    # per-epoch packing over the shard's own survivors
    flags_now = _with_clf_column(spark.read.parquet(flags_path)).filter(
        F.col("__epoch") == epoch
    )
    survivors = flags_now.filter(_survive("mixture")).select(
        "doc_id", "n_tokens"
    )
    packed = pack_sequences(
        survivors, ["doc_id"], "n_tokens", int(meta["capacity"])
    )
    write_epoch(
        packed.select("doc_id", "n_tokens", "bin_id"),
        packed_path, epoch, fresh=False,
    )
    _write_manifest(_packed_row(spark, packed_path), manifest_path)

    packed_df = _read_parquet_or_none(spark, packed_path)
    if packed_df is not None:
        body = shard_docs.join(
            F.broadcast(
                packed_df.filter(F.col("__epoch") == epoch).drop("__epoch")
            ),
            "doc_id",
        ).select("doc_id", "source", "text", "n_tokens", "bin_id")
        write_shuffled_shards(
            body,
            f"{shards_path}/__epoch={epoch}",
            ["doc_id"],
            int(meta["n_shards"]),
            int(meta["seed"]),
        )
    _write_manifest(_shards_row(spark, shards_path), manifest_path)
    return read_pipeline_manifest(spark, pipeline_dir)


def verify_pipeline(spark: SparkSession, pipeline_dir: str) -> DataFrame:
    """(check, expected, actual, ok): recount every completed stage's
    artifact against its manifest row — the integrity audit a data run
    executes before handing shards to a trainer (a torn write, a
    hand-deleted file, or a partial copy shows up as a counted
    mismatch, never as silently short training data).

    Checks per completed stage: flags row count == raw n_docs, each
    flag-derived stage's recount == its manifest row, packed bins ==
    packed n_docs, shard rows + tokens == shards row, and the shard
    directory holds <= the pinned n_shards partitions. Read-only."""
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta

    meta_path, flags_path, packed_path, shards_path, manifest_path = (
        index_paths(
            pipeline_dir, "meta", "flags", "packed", "shards", "manifest"
        )
    )
    meta = read_meta(spark, meta_path).asDict()
    rows = {
        r["stage"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in spark.read.parquet(manifest_path).collect()
    }
    out: list[tuple[str, int, int]] = []
    flags = spark.read.parquet(flags_path)
    counts = {
        r["stage"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in _stage_count_rows(
            flags, include_classifier="classifier" in rows
        ).collect()
    }
    for s in _FLAG_STAGES_CLF:
        if s in rows:
            out.append((f"{s}_docs", rows[s][0], counts[s][0]))
            out.append((f"{s}_tokens", rows[s][1], counts[s][1]))
    p_df = _read_parquet_or_none(spark, packed_path)
    if "packed" in rows:
        if p_df is None:
            out.append(("packed_bins", rows["packed"][0], 0))
            out.append(("packed_tokens", rows["packed"][1], 0))
        else:
            p = p_df.agg(
                F.countDistinct("__epoch", "bin_id").alias("b"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
            ).collect()[0]
            out.append(("packed_bins", rows["packed"][0], int(p["b"])))
            out.append(("packed_tokens", rows["packed"][1], int(p["t"])))
    sh = _read_parquet_or_none(spark, shards_path)
    if "shards" in rows:
        if sh is None:
            out.append(("shards_docs", rows["shards"][0], 0))
            out.append(("shards_tokens", rows["shards"][1], 0))
            out.append(("shards_within_pin", int(meta["n_shards"]), 0))
        else:
            s = sh.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
                F.countDistinct("shard").alias("k"),
            ).collect()[0]
            out.append(("shards_docs", rows["shards"][0], int(s["n"])))
            out.append(("shards_tokens", rows["shards"][1], int(s["t"])))
            out.append(
                ("shards_within_pin", int(meta["n_shards"]), int(s["k"]))
            )
    # cross-stage invariant: every mixture survivor must be sharded —
    # a crashed append leaves the flag recounts ahead of the shard
    # write, and THIS is the row that surfaces it (the per-stage rows
    # above each self-agree with their own stale artifact)
    if "shards" in rows and "mixture" in rows:
        out.append(("shards_cover_mixture", counts["mixture"][0],
                    rows["shards"][0]))
    ok = [
        (c, e, a, a == e if c != "shards_within_pin" else a <= e)
        for c, e, a in out
    ]
    return spark.createDataFrame(
        ok, "check string, expected bigint, actual bigint, ok boolean"
    )


def pipeline_stats(spark: SparkSession, pipeline_dir: str) -> DataFrame:
    """One-row health report for a persisted pipeline artifact — the
    ``index_stats`` discipline applied to the training-data build:
    (n_docs: last completed stage's survivor count, n_stages_done,
    n_files across the stage artifacts, shard_skew: max/mean shard row
    count — a skewed layout starves trainer readers, n_tokens: tokens
    on disk in the shards, stage counts as a detail map). Readable at
    ANY point of a partial build (a killed run reports exactly the
    stages that landed)."""
    manifest_path, flags_path, packed_path, shards_path = index_paths(
        pipeline_dir, "manifest", "flags", "packed", "shards"
    )
    # a run killed before the FIRST manifest write leaves no manifest
    # (or an empty one) — "readable at ANY point" includes that point,
    # so report a zero-stage row instead of raising (r15 ADVICE)
    manifest_df = _read_parquet_or_none(spark, manifest_path)
    rows = (
        {}
        if manifest_df is None
        else {
            r["stage"]: (int(r["n_docs"]), int(r["n_tokens"]))
            for r in manifest_df.collect()
        }
    )
    done = [s for s in _STAGE_ORDER if s in rows]
    n_files = 0
    for p in (flags_path, packed_path, shards_path):
        df = _read_parquet_or_none(spark, p)
        if df is not None:
            n_files += len(df.inputFiles())
    skew = 1.0
    n_tokens_disk = 0
    shards_df = _read_parquet_or_none(spark, shards_path)
    if shards_df is not None:
        sizes = (
            shards_df
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_tokens").alias("t"),
            )
            .collect()
        )
        counts = [r["n"] for r in sizes]
        n_tokens_disk = int(sum(r["t"] for r in sizes))
        if counts:
            skew = round(max(counts) / (sum(counts) / len(counts)), 4)
    # n_docs is the last completed stage's SURVIVOR count — the packed
    # row counts (epoch, bin) windows, not documents, so it is skipped
    # for this headline number (r15 ADVICE); zero stages -> 0
    doc_stages = [s for s in done if s != "packed"]
    n_docs = rows[doc_stages[-1]][0] if doc_stages else 0
    return spark.createDataFrame(
        [
            (
                n_docs,
                len(done),
                n_files,
                skew,
                n_tokens_disk,
                {s: float(rows[s][0]) for s in done},
            )
        ],
        "n_docs bigint, n_stages_done int, n_files int, shard_skew double,"
        " n_tokens_disk bigint, detail map<string,double>",
    )


_STAGE_ORDER = {
    s: i
    for i, s in enumerate(
        ("raw", "quality", "classifier", "dedup", "decontaminated",
         "mixture", "packed", "shards")
    )
}


def read_pipeline_manifest(
    spark: SparkSession, pipeline_dir: str
) -> DataFrame:
    """(stage, n_docs, n_tokens) in pipeline order — the build receipt a
    data run reports (and the frame the registered query returns)."""
    (manifest_path,) = index_paths(pipeline_dir, "manifest")
    order = F.create_map(
        *[F.lit(x) for kv in _STAGE_ORDER.items() for x in kv]
    )
    return (
        spark.read.parquet(manifest_path)
        .orderBy(order[F.col("stage")])
        .select("stage", "n_docs", "n_tokens")
    )


def read_shards(spark: SparkSession, pipeline_dir: str) -> DataFrame:
    """The trainer-facing readout: surviving documents with (shard, pos,
    bin_id) — read a shard directory in pos order for the reproducible
    serving permutation."""
    (shards_path,) = index_paths(pipeline_dir, "shards")
    return spark.read.parquet(shards_path)


@register(
    "q_llm_pipeline_persisted",
    # the manifest's flag-stage rows must equal the composed query's
    # aggregates exactly; packed = distinct context windows; shards =
    # what physically landed on disk (== the mixture survivors)
    oracle=None,  # side-effecting persisted lifecycle; manifest ≡
    # pipeline_stage_counts equality, resume-no-rerun, refusal paths,
    # and the shard layout are pytest-gated (tests/test_pipeline.py)
    tags=("pipeline", "incremental", "maintenance"),
    demoted=True,
)
def q_llm_pipeline_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (or resume) the persisted pipeline for the documents corpus
    under /tmp and return its manifest — the durable, restartable form
    of ``q_llm_pipeline_compose`` (see module docstring)."""
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    d = f"/tmp/bdf_pipeline/{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(d, ignore_errors=True)
    return build_pipeline(docs, d)


@register(
    "q_llm_pipeline_classified",
    oracle=None,  # LR training is float-order sensitive (same rows-only
    # rationale as q_llm_quality_model); the stage algebra — classifier
    # row between quality and dedup, composed counts ≡ manifest, pin
    # refusals — is pytest-gated (tests/test_pipeline.py)
    tags=("pipeline", "incremental", "classifier"),
    demoted=True,
)
def q_llm_pipeline_classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-gated pipeline build: train-if-absent the persisted
    quality classifier (``ensure_quality_model`` — training pays once,
    scoring is map-only), then build the persisted pipeline with the
    classifier wired as a stage and return the manifest, which now
    carries a ``classifier`` row between quality and dedup."""
    import shutil

    from bayesiandatafusion_jl_spark.functions.quality_model import (
        ensure_quality_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    model_dir = ensure_quality_model(spark, sf_dir)
    d = f"/tmp/bdf_pipeline_clf/{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(d, ignore_errors=True)
    return build_pipeline(docs, d, model_dir=model_dir)
