"""Window functions — SURVEY.md §2.5 ids W1-W7.

Reference parity: ``datafusion-functions-window`` (Cargo.lock:2225), enabled
by reference src/lib.rs:36. Spark's Window exec is the same model: shuffle by
PARTITION BY key, sort within partition, stream frames.

Determinism: every ORDER BY carries a unique tiebreaker (o_orderkey /
event_id) — rank-style functions are only hash-comparable under a total
order. Scale: windows partitioned by a high-cardinality key (custkey,
user_id) parallelize across executors; a window with no PARTITION BY pulls
everything into one partition, so the only global window here (ntile) rides
on a small input (customers), never the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)

_BY_CUST = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


def _w():
    return W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


# --- W1 win_row_number: latest-3-orders-per-customer (top-k per group).
@_q(
    "win_row_number",
    f"""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER ({_BY_CUST}) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("rn", F.row_number().over(_w()))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


# --- W2 win_rank: RANK / DENSE_RANK (ties on the *priority* dimension).
@_q(
    "win_rank",
    """
    SELECT o_custkey, o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk
    FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w_tie = W.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
    w_dense = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w_tie).alias("rnk"),
        F.dense_rank().over(w_dense).alias("drnk"),
    )


# --- W3 win_percent: PERCENT_RANK / CUME_DIST.
@_q(
    "win_percent",
    f"""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER ({_BY_CUST}), 6) AS pct_rank,
           round(cume_dist() OVER ({_BY_CUST}), 6) AS cume
    FROM orders
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(_w()), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(_w()), 6).alias("cume"),
    )


# --- W4 win_ntile: quartiles over a global ordering (small input only —
# a global window serializes into one partition).
@_q(
    "win_ntile",
    """
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("balance_quartile"))


# --- W5 win_lag_lead: offsets with defaults (events per user over time).
@_q(
    "win_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_type, 1, 'none') OVER w AS prev_type,
           lead(event_type, 1, 'none') OVER w AS next_type,
           round(value - lag(value, 1, 0.0) OVER w, 4) AS delta_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 4).alias("delta_value"),
    )


# --- W6 win_value: FIRST_VALUE / LAST_VALUE / NTH_VALUE with explicit full
# frame (LAST_VALUE over the default frame is a classic footgun — it sees
# only up to the current row).
@_q(
    "win_value",
    f"""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           nth_value(o_orderkey, 2) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    """,
)
def win_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = _w().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


# --- W7 win_agg_frame: running/sliding aggregates with ROWS frames.
@_q(
    "win_agg_frame",
    f"""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER ({_BY_CUST}
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    """,
)
def win_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    running = _w().rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = _w().rowsBetween(-2, W.currentRow)
    whole = W.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_total"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg3"),
        F.count(F.lit(1)).over(whole).alias("n_orders"),
    )


# --- win_range_frame: VALUE-based RANGE frames (vs W7's row-count ROWS
# frames): the frame holds every peer within a price distance of the
# current row's ORDER BY value. RANGE frames are deterministic even under
# order ties (peers enter by value, not position), so no tiebreaker column
# is needed — the one window family where that's true.
@_q(
    "win_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_within_10k_below,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING), 2)
             AS near_price_mass
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy("o_totalprice")
    below = by_price.rangeBetween(-10000, W.currentRow)
    around = by_price.rangeBetween(-5000, 5000)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(below).cast("bigint").alias("n_within_10k_below"),
        F.round(F.sum("o_totalprice").over(around), 2).alias("near_price_mass"),
    )
