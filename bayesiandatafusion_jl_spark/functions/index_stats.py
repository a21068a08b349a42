"""One health surface for every persisted index family.

The engine persists three index families, each with its own stats
readout grown next to its build path:

- IVF / IVF-PQ vector index  → ``ivf_index_stats``        (vector_index.py)
- MinHash-LSH signature index → ``signature_index_stats``  (dedup_index.py)
- BM25 posting index          → ``bm25_index_stats``       (sparse_retrieval.py)
- exact set-sim (PPJoin) index → ``setsim_index_stats``    (setsim_index.py)
- winnowing fingerprint index → ``winnow_index_stats``     (winnow_index.py)
- persisted training pipeline → ``pipeline_stats``         (pipeline_store.py)

(The non-persisted winnowing fingerprint family gets the same readout
shape via ``functions.text.winnow_stats`` — computed from a corpus, not
a directory, so it does not route through this dispatcher.)

They share the operational shape — entry counts, epoch counts (compact?),
file counts (small-file bloat?), a skew/imbalance ratio (is probe cost
concentrating?), tombstone backlog (physical purge due?) — but each
returns its own column set. ``index_stats`` is the dispatcher a
deployment wires its monitoring to: it sniffs the family from the
directory layout (each family's layout is disjoint: ``centers`` only
exists for IVF, ``sigs`` only for the signature index, a ``stats``
frame beside ``postings`` only for BM25), runs the family readout, and
returns ONE STABLE SCHEMA across families::

    family        string   'ivf' | 'signature' | 'bm25'
    n_entries     bigint   posting entries (ivf/bm25) or indexed docs (sig)
    n_epochs      int      live __epoch partitions (high → compact)
    n_files       int      data files across the index's frames
    skew          double   max/mean hot-spot ratio (cell / (band,bucket) /
                           token-bucket) — >~4 says rebalance or refit
    n_tombstones  bigint   logical deletes awaiting a physical purge
                           (compaction applies them — index_compact.py)
    detail        map<string,double>  the family-specific numbers,
                           keyed by their original column names

``raw=True`` returns the family's own frame instead (every original
column, nothing renamed) for operators who want the full readout. The
common frame is what a dashboard rails on: the same alert thresholds
(n_epochs, n_files, skew, n_tombstones) apply to all three families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bayesiandatafusion_jl_spark.functions.index_meta import (
    index_paths,
    tombstones_path,
)

# family → (sentinel subdirectory, entry column, skew column, epoch column)
_FAMILIES = {
    "ivf": ("centers", "n_postings", "imbalance"),
    "signature": ("sigs", "n_docs", "bucket_skew"),
    "bm25": ("stats", "n_postings", "bucket_skew"),
    # r14: the persisted training-data pipeline joins the surface —
    # entries = last completed stage's docs, skew = shard row skew,
    # "epochs" = completed stages (a partial build reads < 7)
    "pipeline": ("manifest", "n_docs", "shard_skew"),
    # r15: the exact set-similarity (PPJoin) index — entries = stored
    # (id, token) rows, skew = tok_bucket hot-spot ratio
    "setsim": ("order", "n_tokens", "bucket_skew"),
    # r15: the winnowing fingerprint index — entries = stored (id, fp)
    # rows, skew = fp_bucket hot-spot ratio
    "winnow": ("fps", "n_fps", "bucket_skew"),
}


def _exists(spark: SparkSession, path: str) -> bool:
    from bayesiandatafusion_jl_spark.functions.index_compact import _fs

    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def detect_index_family(spark: SparkSession, index_dir: str) -> str:
    """'ivf' | 'signature' | 'bm25' from the directory layout; raises
    with the expected layouts when none matches (a typo'd path fails
    loudly, never as an empty report)."""
    for family, (sentinel, _, _) in _FAMILIES.items():
        (p,) = index_paths(index_dir, sentinel)
        if _exists(spark, p):
            return family
    raise ValueError(
        f"no persisted index recognized at {index_dir!r}: expected one of"
        " centers/ (IVF, write_ivf_index), sigs/ (signature,"
        " write_signature_index), stats/ (BM25, write_bm25_index),"
        " manifest/ (pipeline, build_pipeline), order/ (set-sim,"
        " write_setsim_index), fps/ (winnowing, write_winnow_index)"
    )


def _n_tombstones(spark: SparkSession, index_dir: str) -> int:
    path = tombstones_path(index_dir)
    if not _exists(spark, path):
        return 0
    return spark.read.parquet(path).select("id").distinct().count()


def index_stats(
    spark: SparkSession, index_dir: str, raw: bool = False
) -> DataFrame:
    """One-row health report for ANY persisted index (see module doc).

    Dispatches on the directory layout; ``raw=True`` returns the
    family's native readout instead of the normalized schema."""
    family = detect_index_family(spark, index_dir)
    if family == "ivf":
        from bayesiandatafusion_jl_spark.functions.vector_index import (
            ivf_index_stats,
        )

        frame = ivf_index_stats(spark, index_dir)
    elif family == "signature":
        from bayesiandatafusion_jl_spark.functions.dedup_index import (
            signature_index_stats,
        )

        frame = signature_index_stats(spark, index_dir)
    elif family == "pipeline":
        from bayesiandatafusion_jl_spark.functions.pipeline_store import (
            pipeline_stats,
        )

        frame = pipeline_stats(spark, index_dir)
    elif family == "setsim":
        from bayesiandatafusion_jl_spark.functions.setsim_index import (
            setsim_index_stats,
        )

        frame = setsim_index_stats(spark, index_dir)
    elif family == "winnow":
        from bayesiandatafusion_jl_spark.functions.winnow_index import (
            winnow_index_stats,
        )

        frame = winnow_index_stats(spark, index_dir)
    else:
        from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
            bm25_index_stats,
        )

        frame = bm25_index_stats(spark, index_dir)
    if raw:
        return frame

    _, entry_col, skew_col = _FAMILIES[family]
    row = frame.collect()[0].asDict()
    if family == "pipeline":
        # the pipeline frame carries its own detail map; normalize the
        # stage-progress column into the epoch slot
        return spark.createDataFrame(
            [
                (
                    family,
                    int(row[entry_col]),
                    int(row["n_stages_done"]),
                    int(row["n_files"]),
                    float(row[skew_col]),
                    0,
                    dict(row["detail"]),
                )
            ],
            "family string, n_entries bigint, n_epochs int, n_files int,"
            " skew double, n_tombstones bigint, detail map<string,double>",
        )
    core = {"n_epochs", "n_files", entry_col, skew_col}
    detail = {
        k: float(v) for k, v in row.items() if k not in core and v is not None
    }
    return spark.createDataFrame(
        [
            (
                family,
                int(row[entry_col]),
                int(row["n_epochs"]),
                int(row["n_files"]),
                float(row[skew_col]),
                int(_n_tombstones(spark, index_dir)),
                detail,
            )
        ],
        "family string, n_entries bigint, n_epochs int, n_files int,"
        " skew double, n_tombstones bigint, detail map<string,double>",
    )


__all__ = ["index_stats", "detect_index_family"]
