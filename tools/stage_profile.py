"""Per-stage breakdown of one query execution (tasks, duration).

Usage: python tools/stage_profile.py <query> [query ...]
Runs each query once warm, then once instrumented, printing each job's
stages with task counts and wall durations — the fastest way to spot a
stage AQE has collapsed to one task under a compute-heavy operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ballista_delta_spark.queries import all_queries
    from ballista_delta_spark.session import get_spark
    from bench import _wrap

    spark = get_spark("stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    for name in sys.argv[1:]:
        fn, _ = qs[name]
        _wrap(fn(spark, sf)).collect()  # warm
        before = set(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        _wrap(fn(spark, sf)).collect()
        wall = time.time() - t0
        print(f"== {name}: wall {wall:.3f}s")
        prev_end = None
        for j in sorted(set(tracker.getJobIdsForGroup(None)) - before):
            ji = tracker.getJobInfo(j)
            jd = store.job(j)
            sub = jd.submissionTime().get().getTime() / 1000.0
            comp = jd.completionTime().get().getTime() / 1000.0
            gap = "" if prev_end is None else f" (+{sub - prev_end:.3f} gap)"
            prev_end = comp
            print(f"  job {j} {comp - sub:.3f}s{gap}")
            for sid in ji.stageIds:
                try:
                    sd = store.lastStageAttempt(sid)
                    ct = sd.completionTime()
                    dur = (
                        (ct.get().getTime()
                         - sd.submissionTime().get().getTime()) / 1000.0
                        if ct.isDefined() else None
                    )
                    n = sd.numCompleteTasks()
                    if n:
                        print(f"    stage {sid}: {n} tasks {dur}s")
                except Exception:
                    pass


if __name__ == "__main__":
    main()
