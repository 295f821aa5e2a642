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


# ---------------------------------------------------------------------------
# r9b: the remaining 15 TPC-H shapes — the suite is now 22/22. The TESTDATA
# schema has no partsupp table and lineitem lacks commitdate/receiptdate/
# shipmode, so q2/q4/q9/q11/q16/q20/q21/q22 substitute columns of the same
# role (each substitution documented at the query); every substitution
# preserves the SHAPE Catalyst has to plan — correlated scalar aggregates,
# EXISTS/NOT EXISTS self-joins, nested INs, CASE-ratio aggregates — which
# is what these composites exist to exercise. The SAME SQL string is the
# oracle; sums accumulate in DECIMAL so hashes are summation-order-proof.
# ---------------------------------------------------------------------------

# Unit price factors bounded to DECIMAL(8,2) so three-factor products stay
# inside DECIMAL(38,_) in BOTH engines (DuckDB mult precision = p1+p2;
# (18,2)x(18,2)x(18,2) would overflow 38 and silently go DOUBLE there).
_DISC = "CAST(1 - l_discount AS DECIMAL(8,2))"
_TAX = "CAST(1 + l_tax AS DECIMAL(8,2))"
_EP = "CAST(l_extendedprice AS DECIMAL(18,2))"
_QTY = "CAST(l_quantity AS DECIMAL(8,2))"


# --- tpch_q1: the pricing summary — THE TPC-H flagship scan-aggregate.
# One narrow lineitem pass, eight aggregates per (returnflag, linestatus)
# group; partial aggregation map-side, final shuffle is O(groups)=4ish
# rows. Averages are computed as exact-DECIMAL sum / BIGINT count, cast
# to DOUBLE only after the division inputs are bit-identical across
# engines, then rounded — no order-dependent float accumulation anywhere.
_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({_QTY}) AS DOUBLE) AS sum_qty,
       CAST(sum({_EP}) AS DOUBLE) AS sum_base_price,
       CAST(round(sum({_EP} * {_DISC}), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum({_EP} * {_DISC} * {_TAX}), 2) AS DOUBLE) AS sum_charge,
       CAST(round(CAST(sum({_QTY}) AS DOUBLE) / count(*), 4) AS DOUBLE)
           AS avg_qty,
       CAST(round(CAST(sum({_EP}) AS DOUBLE) / count(*), 4) AS DOUBLE)
           AS avg_price,
       CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                  / count(*), 4) AS DOUBLE) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@_q("tpch_q1", _Q1)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_Q1)


# --- tpch_q2: minimum-cost supplier — the correlated-MIN shape. No
# partsupp table here, so the (part, supplier) relation is DISTINCT
# pairs observed in lineitem and "cost" is s_acctbal (same role: pick,
# per part, the best supplier in the region by a supplier-side measure;
# the correlated scalar MIN over a multi-join subquery is the planner
# shape under test — Catalyst must decorrelate it to an aggregate +
# join, never re-execute per row).
_Q2 = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND p_size = 15
  AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND s_acctbal = (
      SELECT min(s2.s_acctbal)
      FROM supplier s2, lineitem l2, nation n2, region r2
      WHERE p_partkey = l2.l_partkey
        AND s2.s_suppkey = l2.l_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@_q("tpch_q2", _Q2)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    return spark.sql(_Q2)


# --- tpch_q4: order-priority checking — the EXISTS semi-join shape.
# lineitem has no commitdate/receiptdate, so "late line" is re-expressed
# as a ship more than 30 days after the order date — the correlated
# non-equi EXISTS predicate (equality on the key + inequality on dates)
# is preserved exactly; Catalyst must turn it into a semi-join, not a
# per-row probe.
_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_q("tpch_q4", _Q4)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4)


# --- tpch_q6: forecast revenue change — the pure pushdown probe: every
# predicate (date window, discount band, quantity cap) must reach the
# scan as a PushedFilter; the plan is scan -> partial agg -> single-row
# final. Any Exchange beyond the 1-row final agg is a bug.
_Q6 = f"""
SELECT CAST(round(sum({_EP} * CAST(l_discount AS DECIMAL(8,2))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@_q("tpch_q6", _Q6)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6)


# --- tpch_q8: national market share — the widest join tree in the suite
# (8 relations, nation joined TWICE) topped by a CASE-ratio aggregate.
# Both nation sides, region, part, supplier, customer broadcast; the
# lineitem-orders pair is the one real shuffle. The share divides two
# exact-DECIMAL sums cast to DOUBLE, so the quotient is bit-identical
# across engines and partitionings.
_Q8 = f"""
SELECT o_year,
       CAST(round(
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(sum(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           {_EP} * {_DISC} AS volume,
           n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer,
         nation n1, nation n2, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@_q("tpch_q8", _Q8)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir,
        "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )
    return spark.sql(_Q8)


# --- tpch_q9: product-type profit — the 5-way profit decomposition by
# (nation, year). No partsupp, so supply cost is p_retailprice *
# l_quantity (part-side unit cost x quantity, the same role as
# ps_supplycost * l_quantity); the LIKE filter on p_name and the
# DECIMAL subtraction inside the profit expression are preserved.
_Q9 = f"""
SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           {_EP} * {_DISC}
           - CAST(p_retailprice AS DECIMAL(18,2)) * {_QTY} AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@_q("tpch_q9", _Q9)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation"
    )
    return spark.sql(_Q9)


# --- tpch_q11: important stock identification — the HAVING-vs-global-
# scalar shape: a grouped sum filtered against a scalar subquery that
# re-aggregates the SAME filtered join. No partsupp, so "stock value"
# per part is lineitem revenue through suppliers of one nation; the
# planner must evaluate the scalar subquery once (its own small join
# tree) and broadcast the threshold, never per-group.
_Q11_VAL = f"sum({_EP} * {_DISC})"
_Q11 = f"""
SELECT l_partkey, CAST(round({_Q11_VAL}, 2) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING {_Q11_VAL} > (
    SELECT {_Q11_VAL} * 0.001
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3')
ORDER BY value DESC, l_partkey
"""


@_q("tpch_q11", _Q11)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11)


# --- tpch_q13: customer order-count distribution — the outer-join +
# double-aggregate shape: LEFT JOIN keeps order-less customers (count
# 0), first aggregate is per-customer, second is the distribution over
# counts. The non-equi residual in the ON clause (priority filter)
# must stay IN the join, not become a post-filter (that would drop the
# zero-order customers). o_orderpriority stands in for the spec's
# o_comment NOT LIKE filter (no comment column in TESTDATA).
_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey
     AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@_q("tpch_q13", _Q13)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13)


# --- tpch_q14: promotion effect — the CASE-ratio over one fact-dim
# join in a one-month slice. p_type = 'PROMO' is the natural TESTDATA
# spelling of the spec's LIKE 'PROMO%%'. Part broadcasts; numerator and
# denominator are exact DECIMAL sums divided only after CAST to DOUBLE.
_Q14 = f"""
SELECT CAST(round(
           100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                  THEN {_EP} * {_DISC}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END)
                         AS DOUBLE) /
           CAST(sum({_EP} * {_DISC}) AS DOUBLE), 4) AS DOUBLE)
       AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


@_q("tpch_q14", _Q14)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14)


# --- tpch_q15: top supplier — the CTE-reused-twice shape: per-supplier
# quarterly revenue, then the suppliers hitting the global max (scalar
# subquery over the same CTE). Revenue is rounded DECIMAL before the
# max-compare, so the equality join between a supplier's revenue and
# the max cannot be split by float noise.
_Q15 = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(round(sum({_EP} * {_DISC}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@_q("tpch_q15", _Q15)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_Q15)


# --- tpch_q16: supplier-part relationship count — the COUNT(DISTINCT)
# + NOT-IN-subquery shape. The (part, supplier) pairs come from
# lineitem (no partsupp); the excluded-supplier subquery keeps the
# spec's anti-semantics (there: comment LIKE '%Complaints%'; here:
# negative account balance). The NOT IN must plan as a broadcast
# null-aware anti-join — supplier is tiny — never a per-row probe.
_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@_q("tpch_q16", _Q16)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16)


# --- tpch_q17: small-quantity-order revenue — the correlated-AVG
# shape: per-part average quantity feeds a per-row threshold on the
# same fact table. Catalyst must decorrelate to (lineitem grouped by
# partkey) joined back to the filtered fact — the aggregate runs once.
# l_quantity is integer-valued in TESTDATA, so avg = exact-sum /
# count is bit-identical across engines and partitionings; 0.5 stands
# in for the spec's 0.2 to keep the result set non-trivial at sf0.01.
_Q17 = f"""
SELECT CAST(round(CAST(sum({_EP}) AS DOUBLE) / 7.0, 2) AS DOUBLE)
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#5'
  AND p_size < 10
  AND l_quantity < (
      SELECT 0.5 * avg(l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
"""


@_q("tpch_q17", _Q17)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17)


# --- tpch_q20: potential part promotion — the nested-IN shape: the
# outer IN feeds from a grouped HAVING over a join that itself filters
# part by name pattern. ("Excess stock" is re-expressed over lineitem
# shipments — suppliers who moved > 50 units of a matching part in the
# year — since there is no partsupp availqty; both INs survive as
# semi-joins in the plan.)
_Q20 = """
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
ORDER BY s_suppkey
"""


@_q("tpch_q20", _Q20)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20)


# --- tpch_q21: suppliers who kept orders waiting — the EXISTS +
# NOT EXISTS double self-join on the fact table, the hardest
# decorrelation in the suite. lineitem has no commit/receipt dates, so
# "this supplier was the one who failed" is marked by l_returnflag =
# 'R' (same role: a per-line fault flag); the structure — multi-line
# orders where EXACTLY this supplier's line is flagged — is preserved,
# and both correlated predicates must become (anti) semi-joins.
_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R')
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@_q("tpch_q21", _Q21)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21)


# --- tpch_q22: global sales opportunity — the scalar-threshold +
# anti-join shape: customers above the positive-balance average with
# no recent orders. (Spec: no orders at all + phone-prefix grouping;
# TESTDATA gives every customer at least one order and has no phone,
# so the anti-join is date-bounded and grouping is by nationkey — the
# anti-join + broadcast scalar threshold is what the planner must
# produce.) The threshold divides an exact DECIMAL sum by a count, so
# the comparison is bit-identical across engines.
_Q22 = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / count(*)
    FROM customer
    WHERE c_acctbal > 0.00)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@_q("tpch_q22", _Q22)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22)
