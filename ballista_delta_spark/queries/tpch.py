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


# --- tpch_q3: shipping priority — the classic segment-filtered 3-way
# join with the date "sandwich" (orders before the cutoff, lineitems
# shipped after it) and a top-10 on aggregated revenue. Catalyst's plan
# of record: customer broadcast under its segment filter, the
# lineitem-orders pair is the one shuffle, both date filters reach the
# scans as PushedFilters, and TakeOrderedAndProject cuts the top-10
# without a global sort. LIMIT rides a total order (revenue DESC, then
# the unique l_orderkey) so both engines cut identical rows.
# (o_orderpriority stands in for the spec's o_shippriority — the
# TESTDATA schema carries priority, not shippriority.)
_Q3 = f"""
SELECT l_orderkey,
       {_REV} AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@_q("tpch_q3", _Q3)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3)


# --- tpch_q7: volume shipping — the SELF-JOINED dimension shape: nation
# joins in twice (supplier's nation, customer's nation) under a
# symmetric OR pair, with a per-year aggregate above the 6-relation
# join. Both nation sides broadcast; the OR collapses to two
# literal-pair filters pushed into the joined result; YEAR() is
# evaluated post-join on the surviving sliver. Volume accumulates in
# DECIMAL so cross-engine hashes cannot drift with summation order.
_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(l_extendedprice AS DECIMAL(18,2)) *
           CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@_q("tpch_q7", _Q7)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_Q7)


# --- tpch_q12: shipmode priority classes — the conditional-aggregation
# composite: one fact-dim join, a one-year ship window, and two CASE
# counts per group (urgent-class vs other orders). One broadcast join +
# one tiny final shuffle (groups = |linestatus|); counts CAST to BIGINT
# because DuckDB sums integers into HUGEINT while Spark stays BIGINT.
# (l_linestatus stands in for the spec's l_shipmode — not in TESTDATA.)
_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@_q("tpch_q12", _Q12)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12)


# --- tpch_q19: discounted revenue — the OR-of-ANDs predicate composite:
# three disjunct branches, each pairing a part filter (brand + size
# range) with a lineitem filter (quantity range), joined on partkey.
# The planner test: per-side conjuncts COMMON to all branches
# (l_quantity bounds, p_size >= 1) must still push into the scans even
# though the full predicate straddles the join; the join itself stays a
# broadcast hash join on partkey with the residual OR as its condition
# — never a nested loop. Revenue in DECIMAL, as everywhere.
_Q19 = f"""
SELECT {_REV} AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND (
        (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30)
  )
"""


@_q("tpch_q19", _Q19)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19)
