"""Subqueries / CTEs / derived tables — SURVEY.md §2.9 ids Q1-Q4.

Reference parity: DataFusion decorrelates scalar/IN/EXISTS subqueries into
semi/anti joins (``datafusion-optimizer`` decorrelate rules, Cargo.lock:2264)
**[dep]**; Catalyst's RewritePredicateSubquery / RewriteCorrelatedScalarSubquery
do the same — these queries run through ``spark.sql`` to exercise that exact
path (the SQL-string surface the reference exposes via ``ctx.sql``).

Scale notes: a correlated scalar subquery becomes an aggregate + equi-join —
the same shuffle shape as writing the join by hand, so there is no hidden
per-row re-execution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._registry import make_registry
from ._tables import register_views

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- Q1 subq_scalar: correlated scalar subquery (customer above their
# nation's average balance) + uncorrelated scalar in the projection.
_Q1 = """
SELECT c_custkey, c_nationkey,
       round(c_acctbal, 2) AS bal,
       round((SELECT avg(c2.c_acctbal) FROM customer c2
              WHERE c2.c_nationkey = customer.c_nationkey), 2) AS nation_avg
FROM customer
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
"""


@_q("subq_scalar", _Q1)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer")
    return spark.sql(_Q1)


# --- Q2 subq_in_exists: [NOT] IN + [NOT] EXISTS mixed (decorrelation to
# semi/anti joins; keys are non-null so IN and EXISTS agree).
_Q2 = """
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                            WHERE r_name IN ('ASIA', 'EUROPE')))
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 350000)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'F' AND o_totalprice > 450000)
"""


@_q("subq_in_exists", _Q2)
def subq_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "nation", "region", "orders")
    return spark.sql(_Q2)


# --- Q3 cte: chained CTEs (one feeding the next) + final join-back.
_Q3 = """
WITH nation_sales AS (
  SELECT c_nationkey, sum(o_totalprice) AS sales, count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey
),
ranked AS (
  SELECT c_nationkey, sales, n_orders,
         rank() OVER (ORDER BY sales DESC) AS sales_rank
  FROM nation_sales
)
SELECT n_name, round(sales, 2) AS sales, n_orders, sales_rank
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE sales_rank <= 10
"""


@_q("cte", _Q3)
def cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(_Q3)


# --- Q4 derived_table: subquery in FROM + inline VALUES list joined in.
_Q4 = """
SELECT v.tier AS tier, count(*) AS n_orders, round(sum(t.o_totalprice), 2) AS total
FROM (SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice >= 300000 THEN 'big' ELSE 'small' END AS size_tier
      FROM orders) t
JOIN (VALUES ('big', 1), ('small', 2)) AS v(tier, rank_hint)
  ON t.size_tier = v.tier
GROUP BY v.tier
ORDER BY v.tier
"""


@_q("derived_table", _Q4)
def derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(_Q4)


# --- Q5 subq_lateral: LATERAL correlated derived table — each customer row
# drives a per-row subquery over its own orders. Catalyst decorrelates this
# to a left outer aggregate-join (DataFusion's lateral planning does the
# same rewrite); the cap keeps the gate fast while the DECORRELATION is
# what's exercised — the plan must not contain a per-row nested loop.
_Q5 = """
SELECT c.c_custkey,
       round(t.max_price, 2) AS max_price,
       CAST(t.n AS BIGINT) AS n_orders
FROM customer c,
LATERAL (SELECT max(o_totalprice) AS max_price, count(*) AS n
         FROM orders o WHERE o.o_custkey = c.c_custkey) t
WHERE c.c_custkey <= 300
"""


@_q("subq_lateral", _Q5)
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q5)
