"""Capture .explain("formatted") for every registered driver-visible query
into plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (tag = before/after;
round defaults to r16).

Usage: python tools/capture_plans.py <tag> [query ...]
With no query args, captures every driver-visible (non-demoted) spec that
is plan-auditable (the eager/side-effecting SKIP set from plans/audit.py
is skipped, same as SCALE_AUDIT.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesiandatafusion_jl_spark.plans.audit import SKIP  # noqa: E402
from bayesiandatafusion_jl_spark.plans.inspect import formatted_plan  # noqa: E402
from bayesiandatafusion_jl_spark.registry import specs  # noqa: E402
from bayesiandatafusion_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    all_specs = specs(include_demoted=True)
    targets = names or sorted(specs(include_demoted=False))
    for name in targets:
        if name in SKIP and name not in names:
            continue
        try:
            plan = formatted_plan(all_specs[name].fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", flush=True)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
