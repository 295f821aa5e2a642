"""Composite TPC-H-shape queries — multi-way join + aggregate workloads
(SURVEY.md §2 composite ids; reference parity: these are the DataFusion
benchmark-suite shapes the reference's ``ctx.sql`` surface exists to run,
re-expressed through ``spark.sql`` so Catalyst plans them whole).

Individual operator families are covered id-by-id elsewhere; these
composites exercise what only shows up when the pieces meet: join
ORDERING across 4-6 relations of very different sizes (region/nation are
broadcast dims, lineitem is the fact), filter pushdown through the join
tree into every scan, and partial aggregation above a multi-join.

Scale notes (the shapes Catalyst should — and does — pick, visible via
.explain): region/nation/supplier/customer resolve to broadcast joins
under AQE at any realistic dim/fact ratio; the lineitem-orders join is
the one genuine shuffle pair; date filters reach the parquet scans as
PushedFilters. The SAME SQL string is the oracle (both engines parse
ANSI), with rounding and tie-breaks pinned so hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._registry import make_registry
from ._tables import register_views

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- tpch_q5: local supplier volume — the 6-way join. Customer and
# supplier must sit in the SAME nation (the classic diamond), region
# filters the nation dim, a one-year date slice filters orders.
# Revenue sums run in DECIMAL, not DOUBLE: both engines then accumulate
# EXACTLY (prices/discounts are 2-dp values), so the hash can't be
# flipped by summation order — double sums differ in the last cent
# between engines (and between partitionings of the same engine).
_REV = (
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)"
)

_Q5 = f"""
SELECT n_name,
       {_REV} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@_q("tpch_q5", _Q5)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )
    return spark.sql(_Q5)


# --- tpch_q10: returned-item reporting — fact-side filter (returnflag)
# + quarter date slice + top-20 by revenue. The LIMIT rides a total
# order (revenue DESC, then custkey) so both engines cut the identical
# twenty rows.
_Q10 = f"""
SELECT c_custkey, c_name,
       {_REV} AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@_q("tpch_q10", _Q10)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10)


# --- tpch_q18: large-volume customer — the IN-subquery over a grouped
# HAVING (Catalyst decorrelates to a semi-join against the aggregated
# lineitem; the aggregate runs ONCE, not per row) joined back to the
# fact for the per-order quantity profile.
_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY totalprice DESC, o_orderkey
"""


@_q("tpch_q18", _Q18)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18)
