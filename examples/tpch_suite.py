"""Run the complete 22-query TPC-H-shape suite end to end — the
composite workloads the reference's ``ctx.sql`` surface exists to run
(SURVEY.md §2.11b), re-expressed through ``spark.sql`` so Catalyst plans
each one whole.

Every query is a registered, DuckDB-oracle-paired id in
``ballista_delta_spark.queries.tpch``; this example just drives them in
order against a scale-factor directory and prints per-query wall time
plus the leading rows of the flagship Q1.

Run: python examples/tpch_suite.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_delta_spark.session import get_spark

DEFAULT_SF = "/root/testdata/sf0.01"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    spark = get_spark("tpch-suite")
    spark.sparkContext.setLogLevel("ERROR")

    from ballista_delta_spark.queries import tpch

    order = sorted(tpch.QUERIES, key=lambda k: int(k.split("_q")[1]))
    total = 0.0
    for name in order:
        fn, _oracle = tpch.QUERIES[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        total += dt
        print(f"{name:10s} {n:7d} rows  {dt:6.2f}s")
    print(f"{'total':10s} {'':7s}       {total:6.2f}s  ({len(order)} queries)")

    print("\nflagship q1:")
    tpch.QUERIES["tpch_q1"][0](spark, sf_dir).show(6, truncate=False)


if __name__ == "__main__":
    main()
