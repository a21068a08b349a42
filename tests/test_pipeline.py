"""Composed-pipeline unit gates (functions/pipeline.py) — the stage
semantics the DuckDB oracle alone can't pin down as INTENT: the
prefix-dedup representative must be elected among QUALITY SURVIVORS, so
a quality-failing lowest-id duplicate never erases its whole family
(r12; the oracle mirrors whatever rule the code uses, hiding the bug)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.pipeline import (
    pipeline_stage_counts,
)

# 8 shared tokens = one prefix-fingerprint group
_PREFIX = "the quick brown fox jumps over a lazy"
# 32 mostly-distinct tokens with enough 'en' markers to pass quality
_BODY = (
    "dog and the sun of fast slow table key rises while morning light"
    " spreads across quiet fields where farmers tend the crops and birds"
    " sing of summer"
)


def _docs(spark):
    rows = [
        # group A: doc 1 FAILS quality (10 tokens < min 20); doc 2 passes
        (1, "srcA", _PREFIX + " dog barks"),
        (2, "srcA", _PREFIX + " " + _BODY),
        # lone doc, passes
        (3, "srcA", "every good story starts somewhere " + _BODY),
        # group B: docs 4 and 5 BOTH pass — classic dedup keeps the lower id
        (4, "srcA", "once upon a midnight dreary pondered weak weary " + _BODY),
        (5, "srcA", "once upon a midnight dreary pondered weak weary and " + _BODY),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dedup_representative_is_a_quality_survivor(spark):
    counts = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(_docs(spark)).collect()
    }
    assert counts["raw"][0] == 5
    # docs 2, 3, 4, 5 pass quality; doc 1 is too short
    assert counts["quality"][0] == 4
    # doc 2 is RESCUED (its group's lowest id, doc 1, failed quality);
    # doc 5 deduplicates against the qualifying doc 4 → 3 survivors.
    # The pre-r12 rule (min over ALL docs) would have dropped doc 2 too.
    assert counts["dedup"][0] == 3


# --- r14: persisted restartable lifecycle (functions/pipeline_store.py) ----


def test_persisted_pipeline_manifest_equals_composed_counts(spark, tmp_path):
    """build_pipeline's manifest rows equal pipeline_stage_counts on the
    same corpus exactly (they share the flags/pack implementations), the
    shards row records what physically landed, and the shard layout is
    the deterministic epoch shuffle."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
        read_shards,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    d = str(tmp_path / "pipe")
    manifest = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in build_pipeline(docs, d, n_shards=4, seed=7).collect()
    }
    want = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(docs).collect()
    }
    for stage, vals in want.items():
        assert manifest[stage] == vals, (stage, manifest[stage], vals)
    # shards row == the mixture survivors, physically on disk
    assert manifest["shards"] == want["mixture"]
    shards = read_shards(spark, d)
    assert shards.count() == want["mixture"][0]
    assert shards.select("shard").distinct().count() <= 4
    # within a shard the file order IS the serving order (pos ascending)
    one = [r["pos"] for r in shards.filter(F.col("shard") == shards.first()["shard"]).collect()]
    assert one == sorted(one)


def test_persisted_pipeline_kill_resume_no_rerun(spark, tmp_path, monkeypatch):
    """Kill after stage 1 (flags landed, packing dies) → resume
    completes WITHOUT re-running the corpus scan; a second resume of a
    complete build runs NO stage at all."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import pipeline_store as ps

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    d = str(tmp_path / "pipe_crash")

    real_pack = ps.pack_sequences

    def dying_pack(*a, **kw):
        raise IOError("injected kill during packing")

    monkeypatch.setattr(ps, "pack_sequences", dying_pack)
    with _pytest.raises(IOError, match="injected kill"):
        build_pipeline_args = (docs, d)
        ps.build_pipeline(*build_pipeline_args, n_shards=4, seed=7)
    # flags stage landed; packed/shards did not
    import os

    assert os.path.isdir(f"{d}/flags")
    assert not os.path.isdir(f"{d}/packed")

    # resume: flags must NOT recompute (kill the scan to prove it)
    monkeypatch.setattr(ps, "pack_sequences", real_pack)
    monkeypatch.setattr(
        ps, "_pipeline_flags",
        lambda *a, **kw: (_ for _ in ()).throw(
            AssertionError("flags stage re-ran on resume")
        ),
    )
    manifest = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in ps.build_pipeline(docs, d, n_shards=4, seed=7).collect()
    }
    want = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(docs).collect()
    }
    assert manifest["packed"] == want["packed"]
    # complete build: NO stage body may run at all on the next call
    monkeypatch.setattr(
        ps, "pack_sequences",
        lambda *a, **kw: (_ for _ in ()).throw(
            AssertionError("packed stage re-ran on a complete build")
        ),
    )
    again = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in ps.build_pipeline(docs, d, n_shards=4, seed=7).collect()
    }
    assert again == manifest


def test_persisted_pipeline_refuses_config_and_corpus_drift(spark, tmp_path):
    """The meta pin: resuming under different params, or against a
    corpus that changed since the build, raises instead of mixing
    configurations inside one artifact."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    d = str(tmp_path / "pipe_pin")
    build_pipeline(docs, d, n_shards=4, seed=7)
    with _pytest.raises(ValueError, match="configuration"):
        build_pipeline(docs, d, n_shards=8, seed=7)
    with _pytest.raises(ValueError, match="configuration"):
        build_pipeline(docs.filter(F.col("doc_id") % 2 == 0), d,
                       n_shards=4, seed=7)


def test_verify_pipeline_recounts_and_catches_corruption(spark, tmp_path):
    """r14: the integrity audit passes on a clean build and FLAGS a
    corrupted artifact (deleted shard file) as a counted mismatch."""
    import glob
    import os

    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
        verify_pipeline,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    d = str(tmp_path / "pipe_verify")
    build_pipeline(docs, d, n_shards=4, seed=7)
    clean = verify_pipeline(spark, d).collect()
    assert clean and all(r["ok"] for r in clean), [
        (r["check"], r["expected"], r["actual"]) for r in clean if not r["ok"]
    ]
    # corrupt: drop one shard's data file
    victims = glob.glob(f"{d}/shards/__epoch=*/shard=*/*.parquet")
    assert victims
    os.remove(victims[0])
    bad = {r["check"]: r["ok"] for r in verify_pipeline(spark, d).collect()}
    assert bad["shards_docs"] is False


def test_append_shard_equals_one_shot_on_increasing_ids(spark, tmp_path):
    """r14 incremental ingest: base build + appended shard (ids above
    the base — the normal ingest direction, where first-writer-wins
    EQUALS the one-shot global-min dedup rule) must report the same
    flag-stage manifest rows as one-shot building the union, and the
    shards row must equal the union's mixture survivors."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        append_pipeline_shard,
        build_pipeline,
        read_shards,
        verify_pipeline,
    )

    all_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    base = all_docs.filter(F.col("doc_id") < 300)
    # shards carry no eval-source docs, so the one-shot reference and
    # the pinned-benchmark incremental share the same decon gram set
    # (a shard WITH late eval docs diverges BY DESIGN — eval pinning,
    # covered by the next test)
    shard = all_docs.filter(
        (F.col("doc_id") >= 300) & (F.col("source") != "src0")
    )
    union = base.unionByName(shard)
    d = str(tmp_path / "pipe_inc")
    build_pipeline(base, d, n_shards=4, seed=7)
    manifest = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in append_pipeline_shard(shard, d, "s1").collect()
    }
    want = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(union).collect()
    }
    for stage in ("raw", "quality", "dedup", "decontaminated", "mixture"):
        assert manifest[stage] == want[stage], (stage, manifest[stage], want[stage])
    assert manifest["shards"] == want["mixture"]
    # shards on disk = union survivors; replaying the SAME epoch is a
    # no-op on every manifest row
    n_disk = read_shards(spark, d).count()
    assert n_disk == want["mixture"][0]
    again = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in append_pipeline_shard(shard, d, "s1").collect()
    }
    assert again == manifest
    # the integrity audit holds over the multi-epoch artifact
    audit = verify_pipeline(spark, d).collect()
    assert all(r["ok"] for r in audit), [
        (r["check"], r["expected"], r["actual"]) for r in audit if not r["ok"]
    ]


def test_append_shard_first_writer_dedup_and_eval_pin(spark, tmp_path):
    """Cross-epoch dedup: a shard doc duplicating a kept base doc's
    prefix fingerprint is dropped (first-writer-wins). Eval pinning: a
    shard carrying NEW eval-source text neither enters the training
    flags nor redefines the benchmark grams."""
    from bayesiandatafusion_jl_spark.functions.pipeline import (
        _DEDUP_PREFIX_TOKENS,
    )
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        append_pipeline_shard,
        build_pipeline,
    )

    assert _DEDUP_PREFIX_TOKENS == 8
    # >= 12% of tokens must be English markers (the/of/and/...) to
    # pass the language gate; every doc weaves them in
    body = (
        "alpha beta gamma delta epsilon zeta eta theta "  # the 8-token fp
        + "the of and iota kappa the lambda mu of nu xi and omicron pi"
        + " the rho sigma of tau upsilon and phi chi"
    )
    base = spark.createDataFrame(
        [(1, "srcA", body),
         (2, "srcA", "totally distinct opening words the of and here"
          " that pass the quality gate of this engine and the minimum"
          " token count rail and the language score rail of it")],
        "doc_id long, source string, text string",
    )
    d = str(tmp_path / "pipe_fw")
    build_pipeline(base, d, n_shards=2, seed=3)
    # shard doc 10 shares doc 1's 8-token prefix; doc 11 is new; doc 12
    # is eval-source text (must not enter training flags)
    shard = spark.createDataFrame(
        [
            (10, "srcA", body + " with a different continuation tail"),
            (11, "srcA", "brand new opening sequence of the words and"
             " the gates of this engine and the plenty of distinct"
             " tokens and the whole document body of it easily"),
            (12, "src0", "late arriving eval text must not redefine the"
             " benchmark n-gram set at append time ever"),
        ],
        "doc_id long, source string, text string",
    )
    append_pipeline_shard(shard, d, "s1")
    flags = {
        r["doc_id"]: (r["keep_q"], r["keep_dd"])
        for r in spark.read.parquet(f"{d}/flags").collect()
    }
    assert 12 not in flags                 # eval-source rows excluded
    assert flags[10][1] is False           # first-writer: base doc 1 kept
    assert flags[11][0] and flags[11][1]   # genuinely new doc survives
    # the benchmark set is still the BASE build's
    ev = {r["g"] for r in spark.read.parquet(f"{d}/evgrams").collect()}
    assert not any("benchmark" in g for g in ev)


def test_pipeline_ingest_stream_appends_epochs(spark, tmp_path):
    """Streaming ingest: two micro-batches land as their own epochs and
    the manifest equals one-shot over the full history (increasing
    ids)."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
        read_pipeline_manifest,
    )
    from bayesiandatafusion_jl_spark.streaming import pipelines as P

    all_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    base = all_docs.filter(F.col("doc_id") < 300)
    d = str(tmp_path / "pipe_stream")
    build_pipeline(base, d, n_shards=4, seed=7)

    src = tmp_path / "pipe_src"
    src.mkdir()
    late = all_docs.filter(F.col("source") != "src0")
    late.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 400)
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = P.pipeline_ingest_stream(stream, d, str(tmp_path / "pipe_chk"))
    q.processAllAvailable()
    late.filter(F.col("doc_id") >= 400).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()
    got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in read_pipeline_manifest(spark, d).collect()
    }
    union = all_docs.filter(
        (F.col("doc_id") < 300) | (F.col("source") != "src0")
    )
    want = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(union).collect()
    }
    for stage in ("raw", "quality", "dedup", "decontaminated", "mixture"):
        assert got[stage] == want[stage], (stage, got[stage], want[stage])
    eps = {
        r["__epoch"]
        for r in spark.read.parquet(f"{d}/flags")
        .select("__epoch").distinct().collect()
    }
    assert eps == {"base", "stream_0", "stream_1"}


def test_verify_pipeline_flags_crashed_append(spark, tmp_path, monkeypatch):
    """A kill between an append's flags write and its shard write leaves
    the manifest's flag recounts ahead of the shards — the
    shards_cover_mixture cross-check must go red, and a retried append
    must clear it."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import pipeline_store as ps

    all_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    base = all_docs.filter(F.col("doc_id") < 300)
    shard = all_docs.filter(
        (F.col("doc_id") >= 300) & (F.col("source") != "src0")
    )
    d = str(tmp_path / "pipe_crash_append")
    ps.build_pipeline(base, d, n_shards=4, seed=7)
    clean = {r["check"]: r["ok"] for r in ps.verify_pipeline(spark, d).collect()}
    assert clean["shards_cover_mixture"] is True

    real_pack = ps.pack_sequences
    monkeypatch.setattr(
        ps, "pack_sequences",
        lambda *a, **kw: (_ for _ in ()).throw(IOError("killed mid-append")),
    )
    with _pytest.raises(IOError, match="killed mid-append"):
        ps.append_pipeline_shard(shard, d, "s1")
    monkeypatch.undo()
    bad = {r["check"]: r["ok"] for r in ps.verify_pipeline(spark, d).collect()}
    assert bad["shards_cover_mixture"] is False
    # retry heals: idempotent epoch writes + full recount
    monkeypatch.setattr(ps, "pack_sequences", real_pack)
    ps.append_pipeline_shard(shard, d, "s1")
    healed = {r["check"]: r["ok"] for r in ps.verify_pipeline(spark, d).collect()}
    assert all(healed.values()), healed


def test_build_pipeline_manifest_partition_invariant(spark, tmp_path):
    """The manifest (and therefore every stage artifact's counts) must
    be identical at any input partitioning — the determinism contract
    every persisted artifact in this engine carries."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    a = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in build_pipeline(
            docs.repartition(3), str(tmp_path / "p3"), n_shards=4, seed=7
        ).collect()
    }
    b = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in build_pipeline(
            docs.repartition(17), str(tmp_path / "p17"), n_shards=4, seed=7
        ).collect()
    }
    assert a == b and a["raw"][0] > 0


def test_pipeline_stats_readable_at_every_crash_point(spark, tmp_path):
    """r15 ADVICE: 'readable at ANY point of a partial build' includes
    (a) a run killed before the FIRST manifest write (no manifest dir at
    all -> zero-stage row, not an AnalysisException/IndexError) and
    (b) a build whose LAST completed stage is 'packed' — whose manifest
    row counts context WINDOWS, so the headline n_docs must fall back to
    the mixture survivor count, never report bins as documents."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import pipeline_store as ps

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")

    # (a) nothing landed yet: a dir with no manifest
    d0 = str(tmp_path / "pipe_nothing")
    (row0,) = ps.pipeline_stats(spark, d0).collect()
    assert row0["n_docs"] == 0 and row0["n_stages_done"] == 0
    assert row0["detail"] == {}

    # (b) killed right after the packed manifest row lands
    d1 = str(tmp_path / "pipe_packed_last")
    from bayesiandatafusion_jl_spark.sources import io as _io

    real = ps.write_shuffled_shards if hasattr(ps, "write_shuffled_shards") else None
    orig = _io.write_shuffled_shards

    def _boom(*a, **kw):
        raise IOError("killed before shard write")

    _io.write_shuffled_shards = _boom
    try:
        with _pytest.raises(IOError):
            ps.build_pipeline(docs, d1, n_shards=4, seed=7)
    finally:
        _io.write_shuffled_shards = orig
        if real is not None:
            ps.write_shuffled_shards = real
    (row1,) = ps.pipeline_stats(spark, d1).collect()
    assert row1["n_stages_done"] == 6  # five flag stages + packed
    mixture = int(row1["detail"]["mixture"])
    packed_windows = int(row1["detail"]["packed"])
    assert row1["n_docs"] == mixture
    assert packed_windows != mixture or packed_windows == row1["n_docs"]
    # finishing the build keeps n_docs doc-grain (shards row)
    manifest = {
        r["stage"]: r["n_docs"]
        for r in ps.build_pipeline(docs, d1, n_shards=4, seed=7).collect()
    }
    (row2,) = ps.pipeline_stats(spark, d1).collect()
    assert row2["n_docs"] == manifest["shards"] == manifest["mixture"]


# --- r15: trained classifier wired as a pipeline stage ----------------------


def _train_model(spark, docs, model_dir):
    """Train + persist a quality model on the standard planted seed."""
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        _quality_seed,
        save_quality_model,
        seed_fingerprint,
        train_quality_classifier,
    )

    seed = _quality_seed(docs.select("doc_id", "text"))
    model = train_quality_classifier(seed)
    save_quality_model(spark, model, model_dir, seed_fingerprint(seed))
    return model_dir


def _corpus_with_gibberish(spark):
    """sf0.001 documents plus mangled twins that PASS the heuristic
    gates (length / dup / lang-marker ratios survive the every-2nd-token
    mangling) but score badly under the planted-seed classifier — the
    docs only the trained stage can drop."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    mangled = docs.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"),
        "source",
        F.concat_ws(
            " ",
            F.expr(
                "transform(split(lower(text), '\\\\s+'),"
                " (t, i) -> IF(i % 2 = 0, t, concat('zzq', i % 7)))"
            ),
        ).alias("text"),
    )
    return docs.unionByName(mangled)


def test_pipeline_classifier_stage_composes(spark, tmp_path):
    """r15 (VERDICT #3): build_pipeline(model_dir=...) adds a
    'classifier' manifest row between quality and dedup, scored map-only
    from the persisted artifact; the gate actually bites (mangled
    heuristic-passing docs drop), every verify_pipeline recount agrees,
    a resume is a no-op, and config/model drift refuses."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
        verify_pipeline,
    )

    corpus = _corpus_with_gibberish(spark)
    mdir = _train_model(spark, corpus, str(tmp_path / "qmodel"))
    d = str(tmp_path / "pipe_clf")
    manifest = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in build_pipeline(corpus, d, model_dir=mdir).collect()
    }
    assert set(manifest) == {
        "raw", "quality", "classifier", "dedup", "decontaminated",
        "mixture", "packed", "shards",
    }
    # the trained gate bites beyond the heuristics: mangled twins pass
    # quality but fail the classifier
    assert 0 < manifest["classifier"][0] < manifest["quality"][0]
    assert manifest["dedup"][0] <= manifest["classifier"][0]
    # every recount agrees with the manifest
    bad = [
        r["check"]
        for r in verify_pipeline(spark, d).collect()
        if not r["ok"]
    ]
    assert bad == []
    # resume under the same config+model: byte-identical no-op readout
    again = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in build_pipeline(corpus, d, model_dir=mdir).collect()
    }
    assert again == manifest
    # drifted threshold, dropped model, and model-on-unclassified all refuse
    with _pytest.raises(ValueError, match="EXACT build configuration"):
        build_pipeline(corpus, d, model_dir=mdir, model_threshold=0.9)
    with _pytest.raises(ValueError, match="EXACT build configuration"):
        build_pipeline(corpus, d)
    d_plain = str(tmp_path / "pipe_plain")
    build_pipeline(corpus, d_plain)
    with _pytest.raises(ValueError, match="EXACT build configuration"):
        build_pipeline(corpus, d_plain, model_dir=mdir)


def test_pipeline_classifier_scoring_adds_no_shuffle(spark, tmp_path):
    """The classifier verdict rides the one flags scan map-only: the
    scored flags plan has exactly as many exchanges as the unscored
    one."""
    from bayesiandatafusion_jl_spark.functions.pipeline import (
        _pipeline_flags,
    )
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        _score_clf,
    )

    corpus = _corpus_with_gibberish(spark)
    mdir = _train_model(spark, corpus, str(tmp_path / "qmodel_plan"))

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    plain = _pipeline_flags(corpus)
    scored = _pipeline_flags(_score_clf(corpus, mdir, 0.5))
    assert n_exchanges(scored) == n_exchanges(plain)


def test_pipeline_append_honors_model_pin(spark, tmp_path):
    """Appends to a model-gated pipeline must present the SAME model:
    the shard is scored with the pinned threshold, the manifest
    classifier row grows, and missing/drifted models refuse loudly."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        append_pipeline_shard,
        build_pipeline,
        verify_pipeline,
    )

    corpus = _corpus_with_gibberish(spark)
    base = corpus.filter(F.col("doc_id") % 3 != 1)
    shard = corpus.filter(F.col("doc_id") % 3 == 1)
    mdir = _train_model(spark, corpus, str(tmp_path / "qmodel_app"))
    d = str(tmp_path / "pipe_clf_app")
    m0 = {
        r["stage"]: r["n_docs"]
        for r in build_pipeline(base, d, model_dir=mdir).collect()
    }
    with _pytest.raises(ValueError, match="appends must pass model_dir"):
        append_pipeline_shard(shard, d, "s1")
    other = _train_model(
        spark,
        corpus.filter(F.col("doc_id") % 11 == 0),
        str(tmp_path / "qmodel_other"),
    )
    with _pytest.raises(ValueError, match="not the model this pipeline"):
        append_pipeline_shard(shard, d, "s1", model_dir=other)
    m1 = {
        r["stage"]: r["n_docs"]
        for r in append_pipeline_shard(shard, d, "s1", model_dir=mdir).collect()
    }
    assert m1["raw"] > m0["raw"]
    assert m1["classifier"] >= m0["classifier"]
    assert m1["classifier"] < m1["quality"]  # the gate bites on appends too
    bad = [
        r["check"]
        for r in verify_pipeline(spark, d).collect()
        if not r["ok"]
    ]
    assert bad == []
    # a shard cannot introduce a model onto an unclassified build
    d_plain = str(tmp_path / "pipe_plain_app")
    build_pipeline(base, d_plain)
    with _pytest.raises(ValueError, match="built WITHOUT a classifier"):
        append_pipeline_shard(shard, d_plain, "s1", model_dir=mdir)


def test_fresh_build_fp_rides_flags_scan(spark, tmp_path):
    """r16: the fresh build's corpus fingerprint comes from the observe
    aggregate on the stage-1 flags scan — it must equal the standalone
    ``_corpus_fp`` scan bit-for-bit (else every resume would refuse),
    and the no-op resume + corpus-drift refusal must keep working."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        _corpus_fp,
        build_pipeline,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    d = str(tmp_path / "pipe_fp_obs")
    first = [tuple(r) for r in build_pipeline(docs, d, n_shards=4).collect()]
    pinned = int(read_meta(spark, f"{d}/meta")["corpus_fp"])
    assert pinned == _corpus_fp(docs)
    # resume under the same corpus: the pin verifies and nothing re-runs
    again = [tuple(r) for r in build_pipeline(docs, d, n_shards=4).collect()]
    assert again == first
    # a drifted corpus still refuses against the observe-derived pin
    with _pytest.raises(ValueError, match="configuration"):
        build_pipeline(
            docs.filter(F.col("doc_id") % 2 == 0), d, n_shards=4
        )


def test_torn_manifest_without_meta_refuses(spark, tmp_path):
    """r16: meta lands before the first manifest write, so a manifest
    with no meta pin can only be a hand-edited/torn artifact — the build
    must refuse rather than re-pin a fingerprint it cannot attribute to
    the flags on disk."""
    import shutil

    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    d = str(tmp_path / "pipe_torn")
    build_pipeline(docs, d, n_shards=4)
    shutil.rmtree(f"{d}/meta")
    with _pytest.raises(ValueError, match="torn"):
        build_pipeline(docs, d, n_shards=4)


def test_build_then_fresh_model_scoring_same_session(spark, tmp_path):
    """r16 regression pin for the Observation hazard: pyspark's
    Observation permanently initializes the session's non-serializable
    ObservationManager, so ANY later task closure capturing the session
    (a freshly trained MLlib model's trainingSummary holds one) dies
    with Task-not-serializable. The fingerprint rider column must keep
    this sequence working: pipeline build → in-session train → score."""
    from bayesiandatafusion_jl_spark.functions.pipeline_store import (
        build_pipeline,
    )
    from bayesiandatafusion_jl_spark.functions.quality_model import (
        score_quality,
        train_quality_classifier,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    build_pipeline(docs, str(tmp_path / "pipe_then_model"), n_shards=4)
    train = docs.withColumn(
        "label", (F.col("doc_id") % 2).cast("double")
    )
    model = train_quality_classifier(train)
    scored = score_quality(model, docs).collect()  # must not raise
    assert len(scored) == docs.count()
