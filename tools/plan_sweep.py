"""Antipattern sweep over EVERY registered query's physical plan.

Builds each queries() frame at $SPARK_GRAFT_SF_DIR (default sf0.1) and
scans the pre-execution physical plan for the shapes the optimization
guide warns about: row-at-a-time Python (BatchEvalPython), cartesian
products / nested-loop joins, sort-merge joins at bench scale, full-width
scans (ReadSchema listing every column of a wide table), and counts of
Exchange / Python-eval nodes. Prints one line per id; summary at the end.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ballista_delta_spark.queries import all_queries
    from ballista_delta_spark.session import get_spark

    spark = get_spark("plan_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    flagged: dict[str, list[str]] = {}
    for name, (fn, _sql) in sorted(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            print(f"{name}: BUILD ERROR {type(ex).__name__}: {ex}")
            flagged.setdefault("build_error", []).append(name)
            continue
        build_s = time.time() - t0
        tags = []
        if "BatchEvalPython" in plan:
            tags.append("BatchEvalPython")
        if "CartesianProduct" in plan:
            tags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            tags.append("BNLJ")
        if "SortMergeJoin" in plan:
            tags.append("SMJ")
        nex = plan.count("Exchange") - plan.count("ReusedExchange")
        npy = plan.count("ArrowEvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow")
        for tag in tags:
            flagged.setdefault(tag, []).append(name)
        if build_s > 1.0:
            flagged.setdefault("slow_build", []).append(f"{name} ({build_s:.1f}s)")
        print(
            f"{name}: build {build_s:.2f}s exch {nex} py {npy} "
            f"{' '.join(tags)}"
        )
    print("\n== summary ==")
    for k, v in sorted(flagged.items()):
        print(f"{k}: {len(v)} -> {', '.join(v[:20])}")


if __name__ == "__main__":
    main()
