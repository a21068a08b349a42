"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bayesiandatafusion_jl_spark.registry import specs  # noqa: E402
from bayesiandatafusion_jl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_join_multiway",        # flagship: 5-way star join
    "q_agg_groupby",          # TPC-H Q1 shape
    "q_agg_count_distinct",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_rank_topk_per_group",
    "q_win_cumsum",
    "q_session_window",
    "q_stream_sliding",
    "q_llm_knn",
    "q_llm_wordcount",
    "q_llm_exact_dedup",
    "q_llm_near_dedup_lsh",
    "q_ml_predict_rmse",
    "q_win_auc",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bdf-bench")

    all_specs = specs()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footer caches with one throwaway action
    all_specs["q_scan_filter_count"].fn(spark, sf_dir).count()

    for name in HEADLINE:
        fn = all_specs[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
