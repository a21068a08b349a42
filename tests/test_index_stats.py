"""The unified index health surface (functions/index_stats.py): family
detection from layout, one stable schema across all three families,
tombstone backlog visible, raw passthrough intact."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.index_stats import (
    detect_index_family,
    index_stats,
)

COMMON_COLS = [
    "family",
    "n_entries",
    "n_epochs",
    "n_files",
    "skew",
    "n_tombstones",
    "detail",
]


@pytest.fixture()
def three_indexes(spark, tmp_path):
    from tests.test_index_compact import _docs
    from tests.test_vector_index import _clustered

    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        write_signature_index,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        write_bm25_index,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        write_ivf_index,
    )

    ivf = str(tmp_path / "ivf")
    sig = str(tmp_path / "sig")
    bm25 = str(tmp_path / "bm25")
    write_ivf_index(_clustered(spark), ivf, n_cells=8, n_assign=2)
    write_signature_index(_docs(spark, 0, 40), sig)
    write_bm25_index(_docs(spark, 0, 40), bm25, n_buckets=16)
    return {"ivf": ivf, "signature": sig, "bm25": bm25}


def test_detection_and_common_schema(spark, three_indexes):
    for family, d in three_indexes.items():
        assert detect_index_family(spark, d) == family
        df = index_stats(spark, d)
        assert df.columns == COMMON_COLS, (family, df.columns)
        (row,) = df.collect()
        assert row["family"] == family
        assert row["n_entries"] > 0 and row["n_files"] > 0
        assert row["n_epochs"] == 1 and row["n_tombstones"] == 0
        assert row["skew"] >= 1.0
        assert isinstance(row["detail"], dict) and row["detail"]


def test_unknown_layout_fails_loudly(spark, tmp_path):
    with pytest.raises(ValueError, match="no persisted index recognized"):
        index_stats(spark, str(tmp_path / "nothing_here"))


def test_tombstone_backlog_then_purge_visible(spark, three_indexes):
    """The monitoring story end-to-end: deletes raise n_tombstones on
    the SAME column for every family; compaction purges and it returns
    to 0 with n_entries shrunk."""
    from bayesiandatafusion_jl_spark.functions.dedup_index import (
        delete_from_signature_index,
    )
    from bayesiandatafusion_jl_spark.functions.index_compact import (
        compact_ivf_index,
        compact_signature_index,
    )
    from bayesiandatafusion_jl_spark.functions.sparse_retrieval import (
        compact_bm25_index,
        delete_from_bm25_index,
    )
    from bayesiandatafusion_jl_spark.functions.vector_index import (
        delete_from_ivf_index,
    )

    deleters = {
        "ivf": delete_from_ivf_index,
        "signature": delete_from_signature_index,
        "bm25": delete_from_bm25_index,
    }
    compactors = {
        "ivf": compact_ivf_index,
        "signature": compact_signature_index,
        "bm25": compact_bm25_index,
    }
    for family, d in three_indexes.items():
        before = index_stats(spark, d).collect()[0]
        deleters[family](spark, d, [1, 2])
        pending = index_stats(spark, d).collect()[0]
        assert pending["n_tombstones"] == 2, family
        compactors[family](spark, d)
        after = index_stats(spark, d).collect()[0]
        assert after["n_tombstones"] == 0, family
        assert after["n_entries"] < before["n_entries"], family


def test_raw_passthrough_keeps_native_columns(spark, three_indexes):
    raw = index_stats(spark, three_indexes["ivf"], raw=True)
    assert "imbalance" in raw.columns and "n_cells" in raw.columns


def test_pipeline_family_joins_the_surface(spark, tmp_path):
    """r14: a persisted pipeline artifact reports through the same
    normalized health schema (family/n_entries/epochs→stages/files/
    skew/detail) — including a PARTIAL build, which reads exactly the
    stages that landed."""
    import pytest as _pytest

    from bayesiandatafusion_jl_spark.functions import pipeline_store as ps
    from bayesiandatafusion_jl_spark.functions.index_stats import (
        detect_index_family,
        index_stats,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    d = str(tmp_path / "pipe_stats")
    manifest = {
        r["stage"]: r["n_docs"]
        for r in ps.build_pipeline(docs, d, n_shards=4, seed=7).collect()
    }
    assert detect_index_family(spark, d) == "pipeline"
    (row,) = index_stats(spark, d).collect()
    assert row["family"] == "pipeline"
    assert row["n_entries"] == manifest["shards"]
    assert row["n_epochs"] == 7  # all stages done
    assert row["n_files"] > 0 and row["skew"] >= 1.0
    assert row["detail"]["raw"] == float(manifest["raw"])
    # partial build: kill packing, stats still reads the landed stages
    import shutil

    d2 = str(tmp_path / "pipe_partial")
    real = ps.pack_sequences
    ps.pack_sequences = lambda *a, **kw: (_ for _ in ()).throw(
        IOError("killed")
    )
    try:
        with _pytest.raises(IOError):
            ps.build_pipeline(docs, d2, n_shards=4, seed=7)
    finally:
        ps.pack_sequences = real
    (row2,) = index_stats(spark, d2).collect()
    assert row2["n_epochs"] == 5  # the five flag stages only
    assert row2["n_entries"] == manifest["mixture"]
    shutil.rmtree(d2, ignore_errors=True)
