"""Join surface — SURVEY.md §2.3 ids J1-J9.

Reference parity: DataFusion physical joins (hash / sort-merge / nested-loop /
cross, ``datafusion-physical-plan``, Cargo.lock:2356), enabled by reference
src/lib.rs:36. Catalyst covers the same matrix and adds AQE runtime selection.

Scale notes (the part that matters at 100 TB):
- Fact⋈fact equi joins (J1) shuffle both sides on the key — unavoidable, but
  AQE coalesces partitions and splits skew.
- Fact⋈dim joins broadcast the dim side (J9 pins it with an explicit hint;
  Catalyst auto-broadcasts under the threshold elsewhere). A broadcast join
  on a 100 TB fact table is a map-side join: zero shuffle of the big side.
- Non-equi joins (J8) are nested-loop; they are only sane when one side is
  tiny — both queries here keep the build side ≤ a few thousand rows, which
  is exactly the regime BroadcastNestedLoopJoin is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- J1 join_inner: fact⋈fact equi join + aggregate (revenue per status).
@_q(
    "join_inner",
    """
    SELECT o_orderstatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 150000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderstatus")
    )


# --- J2 join_left: preserved-side nulls (customers with no qualifying order).
@_q(
    "join_left",
    """
    SELECT c_custkey,
           count(o_orderkey) AS n_big_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS big_total
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_total"),
        )
    )


# --- J3 join_right
@_q(
    "join_right",
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000) big
    RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9990
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        big.join(c, big.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") > 9990)
        .select("c_custkey", "c_name", "o_orderkey")
    )


# --- J4 join_full: both-side nulls via disjoint key ranges.
@_q(
    "join_full",
    """
    SELECT cc.nationkey AS c_nation, sc.nationkey AS s_nation,
           cc.n_cust, sc.n_supp
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
          FROM customer WHERE c_nationkey < 15 GROUP BY c_nationkey) cc
    FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
               FROM supplier WHERE s_nationkey >= 10 GROUP BY s_nationkey) sc
      ON cc.nationkey = sc.nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cc = (
        c.filter("c_nationkey < 15")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sc = (
        s.filter("s_nationkey >= 10")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cc.join(sc, cc.nationkey == sc.nationkey, "full").select(
        cc.nationkey.alias("c_nation"),
        sc.nationkey.alias("s_nation"),
        "n_cust",
        "n_supp",
    )


# --- J5 join_semi: EXISTS → left_semi (no row multiplication).
@_q(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


# --- J6 join_anti: NOT EXISTS → left_anti. (NOT IN would flip semantics if
# the subquery produced nulls — keys here are non-null, and NOT EXISTS is the
# null-safe form; SURVEY.md §7 Phase B calls this edge out.)
@_q(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


# --- J7 join_cross: CROSS JOIN of two small dims (125 pairs).
@_q(
    "join_cross",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --- J8 join_theta: pure non-equi predicate → BroadcastNestedLoopJoin.
# Build side (region, 5 rows) broadcasts; never do this with two big sides.
@_q(
    "join_theta",
    """
    SELECT n_name, count(*) AS n_regions_above
    FROM nation JOIN region ON n_regionkey < r_regionkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey < r.r_regionkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_regions_above"))
        .orderBy("n_name")
    )


# --- J9 join_broadcast_hint: explicit broadcast of the dim side — the 100 TB
# pattern (map-side join; the lineitem side never shuffles).
@_q(
    "join_broadcast_hint",
    """
    SELECT p_brand,
           round(sum(l_extendedprice), 2) AS brand_revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("brand_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )
