"""Antipattern sweep over EVERY registered query's physical plan.

Builds each queries() frame at $SPARK_GRAFT_SF_DIR (default sf0.1) and
scans the pre-execution physical plan for the shapes the optimization
guide warns about: row-at-a-time Python (BatchEvalPython), cartesian
products / nested-loop joins, sort-merge joins at bench scale, full-width
scans (ReadSchema listing every column of a wide table), and counts of
Exchange / Python-eval nodes. r15 (guide §2.3 "shuffle keys and metadata
instead of payloads"): additionally walks the plan tree over py4j and
reports the KEY TYPES of every hash/range exchange — a string-typed
exchange key means raw text is crossing the wire where an 8-byte hash
would route identically. Prints one line per id; summary at the end.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _exchange_keys(plan) -> list[tuple[str, str, str]]:
    """(exchange kind, key expr, key type) for every shuffle exchange in
    the physical plan tree, traversed over py4j. AdaptiveSparkPlanExec
    hides the real tree behind an empty children() — recurse into its
    initialPlan(). Range partitioning unwraps SortOrder to the ordered
    expression."""
    out: list[tuple[str, str, str]] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if "ShuffleExchange" in cls:
            part = node.outputPartitioning()
            pcls = part.getClass().getSimpleName()
            if pcls in ("HashPartitioning", "RangePartitioning"):
                exprs = (
                    part.expressions()
                    if pcls == "HashPartitioning"
                    else part.ordering()
                )
                for i in range(exprs.size()):
                    e = exprs.apply(i)
                    if pcls == "RangePartitioning":
                        e = e.child()
                    out.append(
                        (pcls, e.toString(), e.dataType().simpleString())
                    )
            else:
                out.append((pcls, "", ""))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())

    walk(plan)
    return out


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
            jplan = df._jdf.queryExecution().executedPlan()
            plan = jplan.toString()
            xkeys = _exchange_keys(jplan)
        except Exception as ex:
            print(f"{name}: BUILD ERROR {type(ex).__name__}: {ex}")
            flagged.setdefault("build_error", []).append(name)
            continue
        build_s = time.time() - t0
        str_keys = sorted(
            {k for _p, k, t in xkeys if t == "string"}
        )
        if str_keys:
            flagged.setdefault("str_exchange_key", []).append(name)
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
        skey = f" STRKEY[{'; '.join(str_keys)}]" if str_keys else ""
        print(
            f"{name}: build {build_s:.2f}s exch {nex} py {npy} "
            f"{' '.join(tags)}{skey}"
        )
    print("\n== summary ==")
    for k, v in sorted(flagged.items()):
        print(f"{k}: {len(v)} -> {', '.join(v[:20])}")


if __name__ == "__main__":
    main()
