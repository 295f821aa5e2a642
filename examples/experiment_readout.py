"""Growth-experiment readout — the product-analytics report a team pulls
after an A/B flag has been live for a while, composed entirely from
registered, oracle-verified operators:

- who converts (ordered funnel stages)          `events_funnel`
- how fast they convert (lag quartiles)         `events_conversion_lag`
- who the users ARE (RFM segment grid)          `events_rfm`
- did the variant move the metric (z readout)   `events_ab_test`
- is traffic organic (cadence burstiness)       `events_interarrival_fit`
- concurrency load profile (overlap pairs)      `join_interval_overlap`

Each section prints a compact verdict line a scheduler can grep. At
scale every underlying plan folds the fact to user/type grain in one
exchange and computes the readout over the aggregate (see the pins in
tests/test_scale_plans.py), so the whole report costs a handful of
fact passes — it runs per experiment flip, not per quarter.

Run:  python examples/experiment_readout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ballista_delta_spark.queries.joins import QUERIES as JOIN_QS  # noqa: E402
from ballista_delta_spark.queries.pipeline import (  # noqa: E402
    events_ab_test,
    events_conversion_lag,
    events_funnel,
    events_interarrival_fit,
    events_rfm,
)
from ballista_delta_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("experiment-readout")
    spark.sparkContext.setLogLevel("ERROR")

    print("== funnel ==")
    stages = {r["stage"]: r["users"] for r in events_funnel(spark, sf_dir).collect()}
    base = stages.get("1_view", 0) or 1
    for stage in sorted(stages):
        print(f"  {stage}: {stages[stage]} ({stages[stage] / base:.1%} of viewers)")

    print("== conversion lag (per cohort week) ==")
    for r in events_conversion_lag(spark, sf_dir).orderBy("cohort_week").collect():
        print(
            f"  {r['cohort_week']}: n={r['n_converted']} "
            f"p50={r['p50_s'] / 3600:.1f}h p90={r['p90_s'] / 3600:.1f}h"
        )

    print("== RFM segments ==")
    seg = (
        events_rfm(spark, sf_dir)
        .groupBy("segment")
        .agg(F.sum("n_users").alias("users"), F.sum("total_value").alias("value"))
        .orderBy(F.col("value").desc())
    )
    for r in seg.collect():
        print(f"  {r['segment']:12s} users={r['users']} value={r['value']:.2f}")

    print("== A/B readout ==")
    cells = events_ab_test(spark, sf_dir).orderBy("variant").collect()
    for r in cells:
        print(
            f"  variant {r['variant']}: n={r['n_users']} "
            f"conv={r['conv_rate']:.3f}"
        )
    z = cells[0]["z_stat"] if cells else None
    verdict = (
        "no-signal" if z is None or abs(z) < 1.96
        else ("variant-0 wins" if z > 0 else "variant-1 wins")
    )
    print(f"  z={z} -> {verdict} (|z| >= 1.96 = p<0.05 two-sided)")

    print("== traffic cadence ==")
    for r in events_interarrival_fit(spark, sf_dir).orderBy("event_type").collect():
        mode = "bursty" if r["burstiness"] > 0.2 else (
            "metronomic" if r["burstiness"] < -0.2 else "organic"
        )
        print(
            f"  {r['event_type']:9s} mean_gap={r['mean_gap_s']:.0f}s "
            f"B={r['burstiness']:+.3f} ({mode})"
        )

    print("== concurrency profile ==")
    ovl_fn, _ = JOIN_QS["join_interval_overlap"]
    ovl = ovl_fn(spark, sf_dir).agg(
        F.sum("n_pairs").alias("pairs"),
        F.max("n_pairs").alias("peak_day_pairs"),
    ).collect()[0]
    print(
        f"  concurrent-session pairs total={ovl['pairs']} "
        f"peak-day={ovl['peak_day_pairs']}"
    )


if __name__ == "__main__":
    main()
