"""Cache-hygiene regression guard (r5 verdict item #6).

The r2 AUC leak class: an operator persists a working frame and returns
without unpersisting it, so a long driver session accumulates dead cached
plans until the block manager fills. The invariant enforced here: after a
registered query is built AND materialized, the Catalyst CacheManager
holds NO entries — every internal ``persist`` must be paired with an
``unpersist`` before the query returns. (``localCheckpoint`` data does not
go through the CacheManager and is released by the ContextCleaner when the
result frame is garbage collected — that path is bounded by construction
and not what leaked in r2.)
"""

from __future__ import annotations

import pytest

from bayesiandatafusion_jl_spark.registry import specs

from tests.conftest import SF_DIR_TINY


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_no_persist_leak_across_all_driver_queries(spark):
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    leaked = []
    for name, spec in specs().items():
        df = spec.fn(spark, SF_DIR_TINY)
        df.write.format("noop").mode("overwrite").save()
        if not _cache_manager_empty(spark):
            leaked.append(name)
            spark.catalog.clearCache()  # isolate: report every leaker, once
    assert not leaked, f"queries left CacheManager entries behind: {leaked}"
