"""Persisted IVF ANN index: build once, probe per query batch.

``ann_ivf_search`` (functions/vector.py) re-assigns the corpus per call; a
production deployment builds the inverted file ONCE and serves query
batches against it. The index under ``index_dir``:

- ``postings`` — (vec_id, embedding[, pq_code]) parquet PARTITIONED BY
  (cell_id, __epoch): each cell is its own directory, so a probe of P
  cells is a partition-pruned scan that reads exactly those P directories
  and skips the rest of the corpus at file-listing time (the strongest
  pruning Spark has — better than footer stats, the files are never even
  listed); the inner ``__epoch`` level (one per appended shard) makes
  shard appends replay-idempotent, exactly like the signature index;
- ``centers``  — (cell_id, ce: array<double>) the fitted quantizer;
- ``codebooks`` — (m, j, c) residual-PQ codewords, present when the index
  was built with ``pq_m`` (r11): postings then carry a ``pq_code`` column
  and ``ann_ivfpq_query_index`` serves ADC probes that PROJECT ONLY the
  codes — parquet column pruning keeps the embedding bytes unread except
  for the bounded exact-refine shortlist;
- ``meta``     — one row pinning (n_cells, n_assign, dim[, pq_m,
  pq_ksub]); append-mode writes and queries validate against it.

``write_ivf_index(..., mode="append")`` adds a NEW shard under the STORED
centers — the incremental path: vectors of the daily shard are assigned
map-side against the existing quantizer and their postings appended; no
refit, no old-corpus read. (Re-fit + full rebuild when drift warrants is
an explicit new ``overwrite`` write.)

Query shape: centers collect is bounded by n_cells; probe cells per query
are computed map-side (same literal/broadcast centroid attachment as
``ann_ivf_search``); the DISTINCT probed cell ids (≤ n_cells, a bounded
collect) become a ``cell_id IN (...)`` partition filter on the postings
scan; the probe side (|Q|·n_probe rows) broadcasts into the candidate
join; exact top-k re-rank runs over candidates only. The corpus-sized
postings never shuffle.

Vectors are expected unit-norm (cosine == dot), the same contract as
``knn_topk`` / ``ann_ivf_search``. Rows-only in the registry (approximate
+ engine-specific quantizer); recall vs brute force and the pruned-scan
plan contract are pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.vector import (
    _cells_attacher,
    _cell_scores,
    _spherical_kmeans,
    dot,
)
from bayesiandatafusion_jl_spark.functions.index_meta import (
    check_meta,
    index_paths,
    read_meta,
    write_meta,
)
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import checkpoint_df


def _paths(index_dir: str) -> tuple[str, str, str]:
    return index_paths(index_dir, "postings", "centers", "meta")


def _load_centers(spark: SparkSession, centers_path: str) -> list:
    """Memoized on the artifact's file listing (index_meta.memo_artifact):
    each load is a full collect job (~0.5-0.9 s measured) a serving
    session otherwise replays per probe; a rebuild/refit rewrites the
    files and invalidates the memo. Treat the returned list as frozen."""
    from bayesiandatafusion_jl_spark.functions.index_meta import memo_artifact

    def _raw() -> list:
        rows = spark.read.parquet(centers_path).orderBy("cell_id").collect()
        return [list(r.ce) for r in rows]

    return memo_artifact(spark, centers_path, _raw)


def _codebooks_path(index_dir: str) -> str:
    (p,) = index_paths(index_dir, "codebooks")
    return p


def _rotation_path(index_dir: str) -> str:
    (p,) = index_paths(index_dir, "rotation")
    return p


def _load_rotation(spark: SparkSession, index_dir: str) -> list | None:
    """The OPQ rotation matrix, if this index was built with one (r15:
    write_ivf_index(pq_opq=True)); None for plain-PQ indexes."""
    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    from bayesiandatafusion_jl_spark.functions.index_meta import memo_artifact

    path = _rotation_path(index_dir)

    def _raw() -> list | None:
        fs, hpath, _ = _fs(spark, path)
        if not fs.exists(hpath):
            return None
        rows = spark.read.parquet(path).orderBy("i").collect()
        return [list(r.r) for r in rows]

    # memoized like the centers; an absent dir fingerprints as "absent",
    # so an OPQ rebuild over a plain index invalidates the stored None
    return memo_artifact(spark, path, _raw)


def _load_codebooks(spark: SparkSession, index_dir: str) -> list:
    from bayesiandatafusion_jl_spark.functions.index_meta import memo_artifact

    path = _codebooks_path(index_dir)

    def _raw() -> list:
        rows = spark.read.parquet(path).orderBy("m", "j").collect()
        books: list = []
        for r in rows:
            if r["m"] == len(books):
                books.append([])
            books[r["m"]].append(list(r["c"]))
        return books

    return memo_artifact(spark, path, _raw)


def _encode_postings(
    assigned: DataFrame,
    centers: list,
    codebooks: list,
    rotation: list | None = None,
) -> DataFrame:
    """Append ``pq_code`` to an assigned (cell_id, vec_id, embedding)
    frame: residual against the row's own cell center (map-side zip_with
    over the broadcast center array), then the Arrow batch encode — the
    same residual-PQ construction as ``ann_ivfpq_search``."""
    from bayesiandatafusion_jl_spark.functions.vector_pq import (
        _centers_attacher,
        pq_encode,
    )

    spark = assigned.sparkSession
    cframe, ctrs = _centers_attacher(spark, centers)(assigned)
    with_res = cframe.withColumn(
        "__res",
        F.zip_with(
            F.col("embedding"),
            F.element_at(ctrs, F.col("cell_id") + 1),
            lambda x, c: x.cast("double") - c,
        ),
    )
    return pq_encode(
        with_res, codebooks, vec_col="__res", rotation=rotation
    ).select("cell_id", "vec_id", "embedding", "pq_code")


# Drift-stat sample cap: the guard needs a mean, not a census — a few
# thousand vectors bound its error far below any actionable threshold.
_DRIFT_SAMPLE_MAX_ROWS = 50_000

# Refine-shortlist sourcing regimes (r12): below this many distinct
# shortlist ids the re-read uses a one-parse IN literal (parquet
# row-group skipping on vec_id); above it — huge query batches — a
# broadcast semi-join, so neither the driver round-trip nor the plan
# grows with |Q|.
_REFINE_IN_MAX_IDS = 100_000


def _assign_score_mean(
    df: DataFrame, centers: list, vec_col: str, n: int | None = None
) -> float:
    """Mean best-cell cosine of a deterministic identity-hash sample of
    ``df`` under ``centers`` — the assignment-quality statistic the drift
    guard compares. Map-only sample filter (same ``pmod(xxhash64)``
    convention as the quantizer fit) + one bounded aggregate; never
    corpus-scaled driver traffic."""
    spark = df.sparkSession
    from bayesiandatafusion_jl_spark.functions.vector import (
        bounded_identity_sample,
    )

    sample = bounded_identity_sample(df, "vec_id", _DRIFT_SAMPLE_MAX_ROWS, n=n)
    attach = _cells_attacher(spark, centers)
    src, cells = attach(sample)
    best = F.array_max(_cell_scores(cells, vec_col))["cd"]
    row = src.agg(F.avg(best).alias("m")).collect()[0]
    if row["m"] is None:
        raise ValueError("cannot compute assignment stats on an empty frame")
    return float(row["m"])


def write_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    n_assign: int = 2,
    mode: str = "overwrite",
    epoch: str = "base",
    max_drift: float = 0.15,
    on_drift: str = "error",
    pq_m: int | None = None,
    pq_ksub: int = 256,
    pq_opq: bool = False,
    rebase_epochs: tuple[str, ...] = (),
) -> None:
    """Build (or append a shard to) the inverted file for a
    (vec_id, embedding) frame.

    overwrite: fit the quantizer on a bounded corpus sample, assign every
    vector to its ``n_assign`` nearest cells map-side, write postings
    partitioned by (cell_id, __epoch). append: load the STORED centers
    (meta-checked) and assign only the new shard — the incremental path —
    under a caller-supplied unique ``epoch``. Like the signature index,
    the append is a dynamic-partition overwrite of the shard's own
    ``__epoch`` subdirectories, so a retried/replayed shard REPLACES its
    earlier postings instead of silently duplicating them (assignment
    under the stored centers is deterministic, so a replay writes exactly
    the same (cell_id, __epoch) partitions). cell_id stays the OUTER
    partition level: probe-time partition pruning on ``cell_id IN (...)``
    is unchanged.

    Drift guard (append only): the fresh build pins the corpus's mean
    best-cell cosine in meta (``assign_ppm``, parts-per-million); every
    append recomputes the same statistic for the NEW shard under the
    stored centers. A shard whose mean is more than ``max_drift`` below
    the pinned value sits far from every centroid — the quantizer no
    longer describes the data, cells fill unevenly, and probe recall
    decays silently. ``on_drift="error"`` (default) fails the append and
    names the numbers; ``"warn"`` appends anyway with a warning (the
    operator accepts degraded recall until the next scheduled refit).
    Indexes written before this stat existed skip the check.

    PQ codes (r11): pass ``pq_m`` on a fresh build to also store
    residual-PQ codes (``pq_code`` column, Jégou-style IVFADC — see
    vector_pq) in the SAME postings file plus a ``codebooks`` dataset;
    (pq_m, pq_ksub) are pinned in meta. Appends derive the PQ config
    from META alone (the stored codebooks are tied to the stored
    centers) and encode the shard identically. ADC probes project only
    ``pq_code`` — parquet column pruning means they never READ the
    embedding bytes, the 32× I/O cut — while exact re-rank and
    ``refit_ivf_index`` still find the embeddings in the same file.

    ``rebase_epochs`` (refit's crash-ordering hook, r12): epochs of the
    OLD incarnation whose rows are baked into this rebuild. They are
    written to a fresh folded-epoch ledger in one step BEFORE the
    postings overwrite — a crash between the ledger write and the
    rebuild leaves those epochs' replays rejected (spurious rejection),
    never silently accepted as duplicates against a rebuilt base.
    """
    post_path, centers_path, meta_path = _paths(index_dir)
    spark = corpus.sparkSession
    if mode == "append":
        if epoch == "base":
            raise ValueError(
                "append needs a unique epoch per shard (epoch='base' is the"
                " fresh-build epoch); replay-idempotence depends on it"
            )
        # an epoch folded by a past compaction no longer has its own
        # partition directory — replaying it would duplicate its rows
        # inside the compacted epoch (see index_compact module docstring)
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            check_not_folded,
        )

        check_not_folded(spark, index_dir, epoch)
        # probe the SHARD's dim (appends are shard-sized — one cheap row);
        # the meta check guards the quantizer config and dimensionality a
        # mismatched shard would silently mis-bucket
        row = corpus.select("embedding").first()
        if row is None or row["embedding"] is None:
            raise ValueError("cannot append an empty shard to the IVF index")
        check_meta(
            spark,
            meta_path,
            "a shard assigned under a different quantizer config would be"
            " silently mis-bucketed",
            n_cells=n_cells,
            n_assign=n_assign,
            dim=len(row["embedding"]),
        )
        if pq_m is not None:
            raise ValueError(
                "append derives the PQ config from the index meta; pq_m is"
                " a fresh-build (overwrite) parameter"
            )
        centers = _load_centers(spark, centers_path)
        meta_row = read_meta(spark, meta_path).asDict()
        codebooks = (
            _load_codebooks(spark, index_dir) if "pq_m" in meta_row else None
        )
        # an OPQ-built index encodes every shard under ITS rotation —
        # loaded from the artifact, like the codebooks
        rotation = (
            _load_rotation(spark, index_dir) if codebooks is not None else None
        )
        if "assign_ppm" in meta_row:
            base_mean = meta_row["assign_ppm"] / 1e6
            shard_mean = _assign_score_mean(corpus, centers, "embedding")
            if base_mean - shard_mean > max_drift:
                msg = (
                    f"IVF append drift guard: shard mean best-cell cosine"
                    f" {shard_mean:.4f} is {base_mean - shard_mean:.4f} below"
                    f" the index's pinned {base_mean:.4f} (max_drift="
                    f"{max_drift}) — the stored quantizer no longer fits"
                    f" this data; refit with mode='overwrite' (or pass"
                    f" on_drift='warn' to append with degraded recall)"
                )
                if on_drift == "warn":
                    import warnings

                    warnings.warn(msg, stacklevel=2)
                else:
                    raise ValueError(msg)
    else:
        # ONE corpus count shared by every bounded trainer below (r15):
        # kmeans fit, PQ/OPQ fit and the assign_ppm drift stat each sized
        # their identity-hash sample with their own full count pass —
        # same n → same modulus → identical samples, three passes saved
        n_corpus = corpus.count()
        centers = _spherical_kmeans(corpus, n_cells, n=n_corpus)
        if not centers:
            raise ValueError("cannot fit an IVF quantizer on an empty corpus")
        codebooks = None
        rotation = None
        if pq_m is not None:
            if pq_opq:
                # r15: learned orthogonal rotation (Ge et al. CVPR'13)
                # before the subspace split — lower quantization error
                # at the same code size; persisted beside the codebooks
                from bayesiandatafusion_jl_spark.functions.vector_pq import (
                    opq_train,
                )

                rotation, codebooks = opq_train(
                    corpus, m=pq_m, ksub=pq_ksub, centers=centers, n=n_corpus
                )
            else:
                from bayesiandatafusion_jl_spark.functions.vector_pq import (
                    pq_train,
                )

                codebooks = pq_train(
                    corpus, m=pq_m, ksub=pq_ksub, centers=centers, n=n_corpus
                )

    if mode != "append":
        # ledger BEFORE the destructive postings overwrite, after every
        # read-only step (fit, pq_train) that could still fail harmlessly:
        # fresh build = new incarnation (reset); refit additionally
        # re-records the rebased epochs so a crash between here and the
        # rebuild below REJECTS replayed old shards instead of silently
        # duplicating rows the rebuild baked into base (the
        # index_compact crash-ordering rule)
        from bayesiandatafusion_jl_spark.functions.index_compact import (
            rewrite_ledger,
        )

        rewrite_ledger(spark, index_dir, list(rebase_epochs), 0)
    attach = _cells_attacher(spark, centers)
    src, cells = attach(corpus)
    assigned = src.select(
        "vec_id",
        "embedding",
        F.explode(
            F.slice(
                F.sort_array(_cell_scores(cells, "embedding"), asc=False),
                1,
                n_assign,
            )
        ).alias("ac"),
    ).select((-F.col("ac.nid")).alias("cell_id"), "vec_id", "embedding")
    if codebooks is not None:
        assigned = _encode_postings(assigned, centers, codebooks, rotation)
    # shared epoch-store write (index_meta.write_epoch): fresh build
    # wipes the whole directory regardless of the session default;
    # appends overwrite only their own (cell_id, __epoch) partitions.
    # Salted-hash clustering before the write (r16, guide §6/§2.5):
    # without it, EVERY upstream task holds rows of ~every cell, so the
    # partitioned write fans out to (tasks × n_cells) files — measured
    # 1024 files for 32 cells on the bench's RAG build; at the 100 TB
    # design point that is millions of KB-sized postings files.
    # Hash-on-(cell_id, salt) rather than repartitionByRange on purpose:
    # range boundaries are SAMPLED, and the sampling pass re-evaluates
    # this frame's child — including the PQ encode, the most expensive
    # map-side step of the build (measured: the bench RAG build doubled,
    # 10.7 → 20.2 s, under the range form). The salt (~4 keys per
    # shuffle partition) keeps write parallelism scale-adaptive, bounds
    # files at ~4·(shuffle partitions), splits a hot cell across tasks,
    # and stays deterministic under task retry (pure function of
    # vec_id). Files are vec_id-sorted so the exact-refine re-read's
    # pushed ``vec_id IN`` filter prunes row groups on footer stats.
    # Same rows, same probe results — layout only.
    from bayesiandatafusion_jl_spark.functions.index_meta import write_epoch
    from bayesiandatafusion_jl_spark.session import shuffle_partitions

    salt_mod = max(1, 4 * shuffle_partitions(spark) // max(n_cells, 1))
    assigned = assigned.repartition(
        F.col("cell_id"), F.pmod(F.xxhash64("vec_id"), F.lit(salt_mod))
    ).sortWithinPartitions("cell_id", "vec_id")
    write_epoch(
        assigned, post_path, epoch, fresh=(mode != "append"),
        outer_cols=("cell_id",),
    )
    if mode != "append":
        # single-file driver frames for these KB-sized artifacts: the
        # default fan-out wrote one part file per parallelism slice (18
        # files for 16 rows), paying task overhead on every probe-side
        # load and bloating the memo fingerprint listing (guide §6);
        # driver_frame (not coalesce(1) — see its docstring) keeps the
        # write itself one Python-worker round-trip
        from bayesiandatafusion_jl_spark.functions.index_meta import (
            driver_frame,
        )

        driver_frame(
            spark,
            [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
            "cell_id int, ce array<double>",
        ).write.mode(mode).parquet(centers_path)
        meta_extra: dict = {}
        from bayesiandatafusion_jl_spark.functions.index_compact import _fs

        if codebooks is None:
            # a fresh non-PQ rebuild over a previously-PQ index must not
            # leave stale codebooks on disk (meta no longer declares pq_m,
            # so nothing would read them — but a later pq build in append
            # mode or a human inspecting the directory would be misled).
            # Hadoop FS API, not shutil: index_dir may be HDFS/object-store
            # (the same discipline as index_compact's directory swap)
            fs, hpath, _ = _fs(spark, _codebooks_path(index_dir))
            if fs.exists(hpath):
                fs.delete(hpath, True)
        if rotation is None:
            # same stale-artifact rule for the OPQ rotation: a plain-PQ
            # (or non-PQ) rebuild over an OPQ index must not leave the
            # old incarnation's rotation where a probe would apply it to
            # codebooks trained in the UNROTATED space
            fs, hpath, _ = _fs(spark, _rotation_path(index_dir))
            if fs.exists(hpath):
                fs.delete(hpath, True)
        else:
            driver_frame(
                spark,
                [(i, [float(v) for v in r]) for i, r in enumerate(rotation)],
                "i int, r array<double>",
            ).write.mode(mode).parquet(_rotation_path(index_dir))
        if codebooks is not None:
            driver_frame(
                spark,
                [
                    (mi, j, [float(v) for v in c])
                    for mi, b in enumerate(codebooks)
                    for j, c in enumerate(b)
                ],
                "m int, j int, c array<double>",
            ).write.mode(mode).parquet(_codebooks_path(index_dir))
            meta_extra = {"pq_m": len(codebooks), "pq_ksub": len(codebooks[0])}
            if rotation is not None:
                meta_extra["opq"] = 1
        write_meta(
            spark,
            meta_path,
            mode,
            n_cells=n_cells,
            n_assign=n_assign,
            dim=len(centers[0]),
            assign_ppm=round(
                _assign_score_mean(corpus, centers, "embedding", n=n_corpus)
                * 1e6
            ),
            **meta_extra,
        )
        # fresh build = new id namespace: stale tombstones from the old
        # incarnation could silently hide reused ids. Cleared AFTER the
        # successful write (see clear_tombstones for the crash ordering);
        # refit's corpus already excluded them before this point.
        clear_tombstones(spark, index_dir)


def refit_ivf_index(
    spark: SparkSession,
    index_dir: str,
    n_cells: int | None = None,
    n_assign: int | None = None,
) -> DataFrame:
    """Re-fit the quantizer FROM THE INDEX ITSELF — the remedy the append
    drift guard prescribes, without re-reading the original corpus: the
    postings already hold every (vec_id, embedding) (n_assign times), so
    the rebuild input is one dedup of the postings scan. After enough
    drifted-but-warned appends, cells fill unevenly and probe recall
    decays; a refit re-centers the quantizer on the data the index NOW
    holds and re-pins the drift-guard statistic to match.

    ``n_cells`` / ``n_assign`` default to the stored meta (pure refit);
    pass new values to re-shape the index in the same pass (e.g. double
    the cells after the corpus doubled).

    Replay safety across the rebuild: every pre-refit epoch's vectors are
    baked into the rebuilt ``base`` epoch, so a replayed OLD shard append
    would duplicate its rows exactly like a post-compaction replay. The
    old incarnation's live epochs AND previously folded epochs are
    written to the fresh ledger (generation 0) BEFORE the rebuild
    overwrites the postings (``write_ivf_index(rebase_epochs=...)``) —
    a crash mid-rebuild therefore rejects replays (conservative), never
    accepts them.

    Returns a 1-row stats frame (n_vectors, n_cells, n_assign,
    epochs_rebased).
    """
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        COMPACT_PREFIX,
        folded_epochs,
    )

    post_path, _, meta_path = _paths(index_dir)
    meta = read_meta(spark, meta_path).asDict()
    n_cells = n_cells if n_cells is not None else meta["n_cells"]
    n_assign = n_assign if n_assign is not None else meta["n_assign"]

    posts = spark.read.parquet(post_path)
    live = [
        r["__epoch"] for r in posts.select("__epoch").distinct().collect()
    ]
    prior = list(folded_epochs(spark, index_dir))
    # eager checkpoint BEFORE the overwrite: the rebuild deletes the very
    # files this frame reads (same materialize-before-overwrite rule as
    # dedup_incremental's pair frame). Tombstoned vectors are excluded
    # HERE — the refit is where logical deletes become physical.
    corpus = checkpoint_df(
        _without_tombstones(
            spark,
            index_dir,
            posts.select("vec_id", "embedding").dropDuplicates(["vec_id"]),
            "vec_id",
        )
    )
    n_vectors = corpus.count()
    rebased = sorted(
        {
            e
            for e in live + prior
            if e != "base" and not e.startswith(COMPACT_PREFIX)
        }
    )
    # a PQ-bearing index refits its codebooks too (they are tied to the
    # centers being re-fitted); config carries over from meta. The
    # rebased epochs ride INTO the build so the ledger lands before the
    # postings overwrite (crash-ordering — see write_ivf_index).
    write_ivf_index(
        corpus,
        index_dir,
        n_cells=n_cells,
        n_assign=n_assign,
        pq_m=meta.get("pq_m"),
        pq_ksub=meta.get("pq_ksub", 256),
        pq_opq=bool(meta.get("opq", 0)),
        rebase_epochs=tuple(rebased),
    )
    return spark.createDataFrame(
        [(n_vectors, n_cells, n_assign, len(rebased))],
        "n_vectors long, n_cells int, n_assign int, epochs_rebased int",
    )


def delete_from_ivf_index(spark: SparkSession, index_dir: str, vec_ids) -> None:
    """Logically delete vectors from the index — the GDPR-shaped
    lifecycle op: appends the ids to a ``tombstones`` dataset that every
    probe path anti-joins (deleted vectors stop being retrievable
    IMMEDIATELY, with zero postings rewrite), and the next
    ``refit_ivf_index`` applies them PHYSICALLY (its corpus read
    excludes tombstoned rows) and clears the set. Epoch compaction
    preserves postings rows exactly, so tombstones stay active across
    it — rebuild-time application is the standard tombstone design: the
    delete is O(|deleted ids|) now, the rewrite amortizes into
    maintenance the index already schedules.

    ``vec_ids`` is a list of ints or a 1-column DataFrame of vec_id —
    the frame form never routes ids through the driver (the
    ``rag_delete_docs`` path feeds a postings-derived frame directly).
    Appending the same ids twice is harmless (probes read DISTINCT)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        append_tombstones,
    )

    append_tombstones(spark, index_dir, vec_ids)


def clear_tombstones(spark: SparkSession, index_dir: str) -> None:
    """See ``index_meta.clear_tombstones`` (shared primitive)."""
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        clear_tombstones as _clear,
    )

    _clear(spark, index_dir)


def _without_tombstones(
    spark: SparkSession, index_dir: str, df: DataFrame, id_col: str
) -> DataFrame:
    from bayesiandatafusion_jl_spark.functions.index_meta import (
        anti_join_tombstones,
    )

    return anti_join_tombstones(spark, index_dir, df, id_col)


def ivf_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row health report for a persisted IVF index — the numbers an
    operator reads before deciding to compact (file bloat) or refit
    (cell imbalance): (n_postings, n_cells_used, n_cells, n_epochs,
    n_files, max_cell, mean_cell, imbalance, assign_ppm). n_postings
    counts posting ENTRIES (each vector appears n_assign times); the
    distinct-vector count is a dedup away but not needed for either
    maintenance decision.

    ``imbalance`` = max cell posting count / mean — a balanced quantizer
    sits near 1; a drifted corpus piles into few cells, probe cost grows
    toward a full scan (probing P of C cells stops cutting work when one
    cell holds most postings). Everything derives from ONE postings scan
    projecting only partition/id columns (the embedding bytes are never
    read — column pruning) plus the meta row; output is a single row.
    """
    post_path, _, meta_path = _paths(index_dir)
    meta = read_meta(spark, meta_path).asDict()
    posts = spark.read.parquet(post_path)
    n_files = len(posts.inputFiles())
    per_cell = (
        posts.select("cell_id", "vec_id", "__epoch")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = per_cell.agg(
        F.sum("n").alias("n_postings"),
        F.count(F.lit(1)).alias("n_cells_used"),
        F.max("n").alias("max_cell"),
        F.avg("n").alias("mean_cell"),
    ).collect()[0]
    n_epochs = posts.select("__epoch").distinct().count()
    return spark.createDataFrame(
        [
            (
                int(row["n_postings"]),
                int(row["n_cells_used"]),
                int(meta["n_cells"]),
                int(n_epochs),
                int(n_files),
                int(row["max_cell"]),
                float(row["mean_cell"]),
                round(float(row["max_cell"]) / float(row["mean_cell"]), 4),
                int(meta.get("assign_ppm", 0)),
            )
        ],
        "n_postings long, n_cells_used int, n_cells int, n_epochs int,"
        " n_files int, max_cell long, mean_cell double, imbalance double,"
        " assign_ppm long",
    )


def ann_ivf_query_index(
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    n_probe: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k ANN for a (qid, qe) query batch against the stored index.

    Returns (qid, nb_id, score, rk) like ``knn_topk``. The postings scan
    carries a ``cell_id IN (probed)`` predicate, so partition pruning
    reads ONLY the probed cell directories (plan-asserted in tests).
    """
    post_path, centers_path, _ = _paths(index_dir)
    spark = queries.sparkSession
    centers = _load_centers(spark, centers_path)

    attach = _cells_attacher(spark, centers)
    qsrc, qcellcol = attach(queries)
    qcells = qsrc.select(
        "qid",
        "qe",
        F.explode(
            F.slice(
                F.sort_array(_cell_scores(qcellcol, "qe"), asc=False), 1, n_probe
            )
        ).alias("probe"),
    ).select("qid", "qe", (-F.col("probe.nid")).alias("cell_id"))
    # probe set read twice (ids collect + candidate join); checkpoint_df,
    # not bare localCheckpoint, per the repo-wide rule: the persist half
    # grounds sizeInBytes so broadcast planning stays size-based (the
    # explicit hint below makes this belt-and-braces today, but a bare
    # localCheckpoint's 2^63 estimate is a trap for future consumers)
    qcells = checkpoint_df(qcells)

    # distinct probed cells: bounded by min(|Q|·n_probe, n_cells) — the
    # sanctioned collect shape; becomes the partition-pruning predicate
    probed = [r.cell_id for r in qcells.select("cell_id").distinct().collect()]
    postings = spark.read.parquet(post_path).filter(F.col("cell_id").isin(probed))

    cand = postings.join(F.broadcast(qcells), "cell_id")
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("qid"))
    rescored = cand.select(
        "qid",
        F.col("vec_id").alias("nb_id"),
        F.round(dot("qe", "embedding"), 4).alias("score"),
    ).dropDuplicates(["qid", "nb_id"])
    # logically-deleted vectors never reach the top-k (tombstone design)
    rescored = _without_tombstones(spark, index_dir, rescored, "nb_id")
    wq = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return rescored.withColumn("rk", F.row_number().over(wq)).filter(
        F.col("rk") <= k
    )


def ann_ivfpq_query_index(
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    n_probe: int = 6,
    refine: int = 4,
    exclude_self: bool = True,
    keep_emb: bool = False,
) -> DataFrame:
    """Top-k ANN for a (qid, qe) batch against a PQ-bearing stored index
    — the ADC probe path.

    Plan shape (the persisted twin of ``ann_ivfpq_search``):

    1. probe cells map-side; the DISTINCT probed ids become the
       ``cell_id IN (...)`` partition filter, same as the exact path.
    2. the candidate scan projects ONLY (cell_id, vec_id, pq_code):
       parquet column pruning never reads the embedding bytes —
       plan-asserted in tests (ReadSchema without ``embedding``).
    3. score(q, x) ≈ dot(q, center) + Σ_m LUT[m][code[m]] — the coarse
       dot rides the probe row, the residual term is M ``element_at``
       lookups in codegen against the per-query LUT built from the
       stored codebooks.
    4. exact re-rank (refine > 0): the top-(refine·k) shortlist's ids
       (a bounded collect, |Q|·refine·k) re-read the postings with a
       pushed ``vec_id IN (...)`` filter — the only touch of embedding
       bytes in the whole query, proportional to the shortlist, not the
       candidates.

    ``keep_emb`` (r15) returns each hit's embedding as ``nb_emb`` —
    free here because the re-rank already holds those rows (see
    ``pq_exact_rerank``); requires ``refine > 0`` (the raw-ADC leg never
    touches embeddings, so honoring it there would mean adding exactly
    the fetch the flag exists to avoid).
    """
    if keep_emb and refine <= 0:
        raise ValueError(
            "keep_emb=True needs refine > 0: the raw-ADC path never reads"
            " embeddings, so there is nothing in hand to keep"
        )
    post_path, centers_path, _ = _paths(index_dir)
    spark = queries.sparkSession
    centers = _load_centers(spark, centers_path)
    codebooks = _load_codebooks(spark, index_dir)
    # OPQ index: queries rotate into the codebooks' space (r15)
    rotation = _load_rotation(spark, index_dir)

    # the probe/LUT/score/dedup/top-k numerics are the SHARED helpers in
    # vector_pq — only candidate SOURCING differs from ann_ivfpq_search:
    # here the probed cells must be collected first (the partition filter)
    from bayesiandatafusion_jl_spark.functions.vector_pq import (
        pq_adc_candidates,
        pq_adc_shortlist,
        pq_adc_topk,
        pq_exact_rerank,
        pq_probe_frame,
        pq_query_luts,
    )

    # two consumers (probed-ids collect + candidate join) → checkpoint
    qprobed = checkpoint_df(pq_probe_frame(queries, centers, n_probe))
    probed = [r.cell_id for r in qprobed.select("cell_id").distinct().collect()]
    # ONLY codes projected: the embedding column is never read here
    postings = (
        spark.read.parquet(post_path)
        .filter(F.col("cell_id").isin(probed))
        .select("cell_id", "vec_id", "pq_code")
    )
    scored = pq_adc_candidates(
        postings,
        qprobed,
        pq_query_luts(queries, codebooks, rotation=rotation),
        exclude_self,
        m=len(codebooks),
    )
    # tombstone exclusion BEFORE the shortlist: a logically-deleted
    # vector must neither occupy a shortlist slot nor be re-ranked
    scored = _without_tombstones(spark, index_dir, scored, "nb_id")
    if refine <= 0:
        return pq_adc_topk(scored, k)
    # two consumers (shortlist-ids collect + re-rank join) → checkpoint
    short = checkpoint_df(pq_adc_shortlist(scored, k, refine))
    sids = short.select("nb_id").distinct()
    # ONE action decides the regime AND fetches the ids (r15: the old
    # count()-then-collect() pair paid two jobs): limit(MAX+1) bounds the
    # driver transfer; if it comes back under the cap it IS the full set
    short_rows = sids.limit(_REFINE_IN_MAX_IDS + 1).collect()
    base = spark.read.parquet(post_path).filter(F.col("cell_id").isin(probed))
    if len(short_rows) <= _REFINE_IN_MAX_IDS:
        # int_in_list, not isin: |Q|·refine·k ids as one parsed IN (isin
        # builds a py4j literal per id — 5.7 s at 8.6k ids); same Catalyst
        # In node, so the shortlist filter pushes into the parquet scan
        # (row-group skipping on vec_id stats)
        from bayesiandatafusion_jl_spark.functions.exprs import int_in_list

        ids = [r["nb_id"] for r in short_rows]
        vecs = base.filter(int_in_list("vec_id", ids))
    else:
        # huge query batches: a driver round-trip + plan literal that
        # grows with |Q| is the bloom-literal failure shape — source the
        # re-read by broadcast semi-join instead (no pushdown, but the
        # scan is already partition-pruned to the probed cells and the
        # shortlist frame is broadcast-sized by construction)
        vecs = base.join(
            F.broadcast(sids), base["vec_id"] == sids["nb_id"], "left_semi"
        )
    vecs = vecs.select("vec_id", "embedding").dropDuplicates(["vec_id"])
    return pq_exact_rerank(short, vecs, queries, k, keep_emb=keep_emb)


@register(
    "q_llm_ann_index",
    oracle=None,  # approximate + engine-specific quantizer; recall vs the
    # brute-force baseline and partition-pruned probe are pytest-gated
    tags=("J3", "ann", "incremental"),
    demoted=True,
)
def q_llm_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (persisted-index path) — build the IVF index for the embeddings
    table once under /tmp, then serve the first 10 vectors as a query
    batch against it."""
    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = f"/tmp/bdf_ivf_index/{sf_dir.strip('/').replace('/', '_')}"
    write_ivf_index(emb, index_dir, n_cells=16, n_assign=2)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return ann_ivf_query_index(q, index_dir, k=5, n_probe=6)


@register(
    "q_llm_ann_index_pq",
    oracle=None,  # approximate + engine-specific quantizer/codebooks;
    # recall, ADC fidelity, and the codes-only column-pruned probe are
    # pytest-gated (tests/test_vector_index.py)
    tags=("J3", "ann", "incremental", "pq"),
    demoted=True,
)
def q_llm_ann_index_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (persisted IVF-PQ path) — build the PQ-bearing index once under
    /tmp, then serve the first 10 vectors via the ADC probe + exact
    refine. The candidate scan reads codes only (column pruning); the
    embeddings are touched solely for the |Q|*refine*k shortlist."""
    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = f"/tmp/bdf_ivfpq_index/{sf_dir.strip('/').replace('/', '_')}"
    write_ivf_index(emb, index_dir, n_cells=16, n_assign=2, pq_m=16)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return ann_ivfpq_query_index(q, index_dir, k=5, n_probe=6, refine=4)


def ivf_recall_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    n_probes: tuple[int, ...] = (1, 2, 4, 8),
    pq: bool = False,
    refine: int = 4,
) -> DataFrame:
    """(n_probe, recall_at_k, mean_candidates_share): the tuning curve an
    IVF deployment picks its probe width from — recall vs the exact
    brute-force top-k on the SAME queries, per candidate probe width.
    Nobody should guess n_probe; they should read this frame.

    The brute baseline (one |Q|·|corpus| bounded pass — queries are a
    small batch by construction) is computed ONCE and each probe width
    joins against it; `mean_candidates_share` = probed cells / total
    cells approximates the fraction of the corpus each probe touches —
    the cost axis of the recall/cost trade-off. ``pq=True`` sweeps the
    ADC+refine path of a PQ-bearing index instead.

    The sweep loop is driver-side over len(n_probes) SMALL values (each
    iteration is its own bounded Spark job) — tuning-time tooling, not a
    per-query path.
    """
    from bayesiandatafusion_jl_spark.functions.index_meta import read_meta
    from bayesiandatafusion_jl_spark.functions.vector import knn_topk

    spark = corpus.sparkSession
    _, _, meta_path = _paths(index_dir)
    n_cells = int(read_meta(spark, meta_path)["n_cells"])
    brute = (
        knn_topk(corpus, queries, k=k, exclude_self=True)
        .select("qid", "nb_id")
        .persist()
    )
    n_brute = brute.count()
    rows = []
    for np_ in n_probes:
        if pq:
            # exclude_self threads into the ADC candidate stage, BEFORE
            # the shortlist/top-k — a post-filter here would let the
            # self-hit consume a k slot and structurally deflate the pq
            # recall relative to the brute baseline (r13 ADVICE)
            ann = ann_ivfpq_query_index(
                queries, index_dir, k=k, n_probe=np_, refine=refine,
                exclude_self=True,
            )
        else:
            ann = ann_ivf_query_index(
                queries, index_dir, k=k, n_probe=np_, exclude_self=True
            )
        hit = (
            ann.select("qid", "nb_id")
            .join(brute, ["qid", "nb_id"], "left_semi")
            .count()
        )
        rows.append(
            (
                int(np_),
                (hit / n_brute) if n_brute else 0.0,
                min(np_, n_cells) / n_cells,
            )
        )
    brute.unpersist()
    return spark.createDataFrame(
        rows, "n_probe int, recall_at_k double, mean_candidates_share double"
    )
