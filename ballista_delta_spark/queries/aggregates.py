"""Aggregation surface — SURVEY.md §2.4 ids A1-A14.

Reference parity: DataFusion's two-phase (partial→final) hash aggregation with
all built-in aggregate functions, enabled wholesale by reference src/lib.rs:36
(``datafusion-functions-aggregate``, Cargo.lock:2153). Spark plans the same
partial/final HashAggregate; everything here is built-in ``pyspark.sql.functions``
so the hot path stays in whole-stage codegen.

Scale notes: group-by keys here are low-cardinality (returnflag/linestatus,
status, nation) → partial aggregation collapses each map task's output to a
handful of rows before the shuffle, so these scale linearly with input size.
Float sums are rounded (both sides) only at the final projection, which keeps
hash comparison stable without touching the aggregation itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load, register_views

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- A2 agg_basic: the flagship. TPC-H Q1 pricing summary (SURVEY §7 Phase A).
@_q(
    "agg_basic",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- A1 agg_count: COUNT(*) vs COUNT(col) null semantics.
@_q(
    "agg_count",
    """
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(nullif(l_discount, 0.0)) AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.nullif(F.col("l_discount"), F.lit(0.0))).alias("n_discounted"),
        )
        .orderBy("l_returnflag")
    )


# --- A3 agg_distinct: COUNT(DISTINCT) / SUM(DISTINCT).
@_q(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           CAST(sum(DISTINCT CAST(round(o_totalprice, 0) AS BIGINT))
                AS BIGINT) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            # Explicit BIGINT pin on both sides: DuckDB sum(BIGINT) is HUGEINT
            # and round(BIGINT, 2) is DOUBLE — either would hash-mismatch.
            F.sum_distinct(F.round(F.col("o_totalprice"), 0).cast("bigint"))
            .cast("bigint")
            .alias("sum_distinct_price"),
        )
        .orderBy("o_orderstatus")
    )


# --- A4 agg_having: post-aggregation filter.
@_q(
    "agg_having",
    """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter(F.col("n_orders") >= 15)
    )


# --- A5 agg_stats: stddev / variance / corr / covar (sample + population).
@_q(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(stddev_pop(l_quantity), 4) AS sdp_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(var_pop(l_discount), 6) AS varp_disc,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
           round(covar_pop(l_quantity, l_discount), 4) AS covp_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sdp_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qty_disc"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 4).alias("covp_qty_disc"),
        )
        .orderBy("l_returnflag")
    )


# --- A6 agg_median: exact interpolating median (F.median == percentile_cont 0.5).
@_q(
    "agg_median",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS med_qty,
           round(median(l_extendedprice), 4) AS med_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        )
        .orderBy("l_returnflag")
    )


# --- A7 agg_approx_percentile: sketch-based percentile. With accuracy >= n the
# GK sketch is exact, so it matches DuckDB's discrete quantile; at real scale
# you lower the accuracy knob and accept bounded rank error.
@_q(
    "agg_approx_percentile",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS p50_qty,
           quantile_disc(l_quantity, 0.95) AS p95_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 1000000).alias("p50_qty"),
            F.percentile_approx("l_quantity", 0.95, 1000000).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- A8 agg_approx_distinct: HyperLogLog++. Exact at low cardinality (the HLL
# sparse representation), which is what makes it oracle-comparable here; at
# 100 TB it is THE way to count distincts without a shuffle of all keys.
@_q(
    "agg_approx_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_orderpriority) AS approx_priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        # Default rsd (0.05): the HLL++ sparse path is exact at this
        # cardinality anyway, and rsd=0.005 allocates ~2^18 registers per
        # group — measured 7s vs <1s here for the identical answer.
        .agg(F.approx_count_distinct("o_orderpriority").alias("approx_priorities"))
        .orderBy("o_orderstatus")
    )


# --- A9 agg_array_agg: collect_set, sorted and joined so the value hash is
# deterministic (array_agg order is engine-defined otherwise).
@_q(
    "agg_array_agg",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities")
        )
        .orderBy("o_orderstatus")
    )


# --- agg_regression: linear-regression aggregates (DataFusion regr_* family;
# both engines compute via the same covar/var decomposition, so rounding to
# 6 decimals absorbs parallel-summation noise).
@_q(
    "agg_regression",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 6
            ).alias("icept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity")
            .cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- A10 agg_first_last: ordered first/last via min_by/max_by (Spark's plain
# first/last are order-nondeterministic; min_by over the unique key is the
# deterministic form — DataFusion's first_value(x ORDER BY k) equivalent).
@_q(
    "agg_first_last",
    """
    SELECT o_orderstatus,
           min_by(o_orderpriority, o_orderkey) AS first_priority,
           max_by(o_orderpriority, o_orderkey) AS last_priority,
           min(o_orderkey) AS first_key,
           max(o_orderkey) AS last_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
            F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .orderBy("o_orderstatus")
    )


# --- A11 agg_bool: bool_and / bool_or.
@_q(
    "agg_bool",
    """
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_high_discount,
           bool_and(l_tax < 0.05) AS all_low_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
            F.bool_and(F.col("l_tax") < 0.05).alias("all_low_tax"),
        )
        .orderBy("l_returnflag")
    )


# --- A12 agg_grouping_sets
@_q(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- A13 agg_rollup (+ grouping() marker)
@_q(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


# --- A14 agg_cube
@_q(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


# --- A15 agg_pivot: PIVOT — rows-to-columns reshaping (df.groupBy().pivot()
# in Spark; the oracle expands to the equivalent conditional aggregation,
# which is also exactly what Catalyst rewrites PIVOT into — one hash
# aggregate, no extra shuffle vs a plain groupBy). Explicit value list
# (O/F/P): an unlisted-values pivot needs a driver-side distinct pass,
# which is why production pivots always pin the columns.
@_q(
    "agg_pivot",
    """
    SELECT o_orderpriority,
           CAST(round(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                                        THEN o_totalprice END), 0), 2)
                AS DOUBLE) AS status_o,
           CAST(round(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                                        THEN o_totalprice END), 0), 2)
                AS DOUBLE) AS status_f,
           CAST(round(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                                        THEN o_totalprice END), 0), 2)
                AS DOUBLE) AS status_p
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.round(F.coalesce(F.col(s), F.lit(0.0)), 2)
            .cast("double")
            .alias(f"status_{s.lower()}")
            for s in ("O", "F", "P")
        ],
    ).orderBy("o_orderpriority")


# --- A16 agg_unpivot: UNPIVOT/melt — columns-to-rows (df.unpivot in Spark;
# oracle = UNION ALL of one projection per measure). Narrow-scan note: both
# forms read each source column once; unpivot multiplies ROWS (k measures
# -> k rows), never re-reads.
@_q(
    "agg_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, 'price' AS measure,
             l_extendedprice AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem) t
    WHERE l_orderkey < 100
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        ],
        "measure",
        "value",
    ).select(
        "l_orderkey", "l_linenumber", "measure",
        F.col("value").cast("double").alias("value"),
    )


# --- A18 agg_exact_percentile: exact interpolated quantiles (SQL
# percentile_cont semantics) — the non-sketch sibling of
# agg_approx_percentile, for the grains where exactness matters (SLA
# reporting, label thresholds). Spark's percentile() and DuckDB's
# quantile_cont both linearly interpolate at rank p*(n-1), so the values
# agree bit-for-bit given identical inputs; rounded to 6dp anyway as
# belt-and-braces against future engine changes. 100 TB shape: exact
# percentile must SEE every value — Spark runs it as a two-phase
# ObjectHashAggregate (per-partition value buffers merged on the one
# group exchange), the right plan when groups are few and this grain is
# explicitly chosen over the sketch.
@_q(
    "agg_exact_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50_qty,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
           round(quantile_cont(l_extendedprice, 0.90), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("p25_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("p50_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("p75_qty"),
            F.round(
                F.percentile("l_extendedprice", F.lit(0.90)), 6
            ).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------- agg_histogram
# A18: equi-width histogram — the profiling aggregate behind every data
# distribution dashboard and every "pick my bucket boundaries before
# sketching" step. Binning is explicit arithmetic (floor(value / width))
# evaluated identically in both engines on exact inputs (value carries
# 2dp; the width is an integer literal), so bin ids are integer-exact —
# width_bucket would express the same thing but DuckDB lacks it, and an
# explicit floor keeps the oracle a literal mirror. Scale shape: ONE
# two-phase hash aggregate — map-side partials collapse each task to at
# most (types x 22) rows before the only exchange; no sort, no join.
@_q(
    "agg_histogram",
    """
    SELECT event_type,
           CAST(floor(value / 25) + 1 AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
                           AS DOUBLE), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.expr("CAST(floor(value / 25) + 1 AS INT)").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.expr(
                    "sum(CAST(round(value, 2) AS DECIMAL(18,2)))"
                ).cast("double"),
                2,
            )
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------- agg_skew_kurtosis
# A20: distribution-shape profiling — skewness and excess kurtosis of
# the value distribution per event type, the moments a data profiler
# reports beyond mean/σ (heavy tails and asymmetry are what break
# z-score gates). Spark's skewness()/kurtosis() and DuckDB's built-ins
# accumulate doubles in partition order (non-deterministic across
# engines), so both sides compute the SAME closed form from raw power
# sums Σx..Σx⁴ accumulated as DECIMAL over round(term, 9) —
# partitioning-order-proof, then identical double arithmetic:
#   m_k = Σ(x-μ)^k/n expanded in raw moments; g1 = m3/m2^1.5,
#   g2 = m4/m2² - 3. Scale: ONE two-phase hash aggregate.
_MOM_SUM = (
    "CAST(sum(CAST(round({t}, 9) AS DECIMAL(38,9))) AS DOUBLE)"
)
_SKEW_KURT = """
    round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n)
           * (s1 / n))
          / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
    round((s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
          / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS kurtosis
"""


@_q(
    "agg_skew_kurtosis",
    f"""
    WITH moms AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             {_MOM_SUM.format(t="value")} AS s1,
             {_MOM_SUM.format(t="value * value")} AS s2,
             {_MOM_SUM.format(t="value * value * value")} AS s3,
             {_MOM_SUM.format(t="value * value * value * value")} AS s4
      FROM events GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n, {_SKEW_KURT}
    FROM moms
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    moms = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.expr(_MOM_SUM.format(t="value")).alias("s1"),
        F.expr(_MOM_SUM.format(t="value * value")).alias("s2"),
        F.expr(_MOM_SUM.format(t="value * value * value")).alias("s3"),
        F.expr(
            _MOM_SUM.format(t="value * value * value * value")
        ).alias("s4"),
    )
    return moms.selectExpr(
        "event_type", "CAST(n AS BIGINT) AS n", *_SKEW_KURT.split(",\n")
    )


# -------------------------------------------------- agg_winsorized_mean
# A21: robust means — the p5/p95 WINSORIZED mean (outliers clamped to
# the fences) and the TRIMMED mean (outliers dropped) next to the raw
# mean, per event type. The robust-statistics pair every metrics
# pipeline keeps beside avg() once heavy tails appear (a single 490.02
# moves a raw mean; it barely moves these). Two-phase measure-then-
# apply: the per-group fences come from ONE exact-percentile aggregate
# (agg_exact_percentile's engine contract), broadcast back onto the
# fact for the clamp/trim pass — groups² never materializes and the
# fact is scanned twice, shuffled once per phase. Engine parity: fences
# round to 4dp before any comparison (identical doubles both engines);
# clamped/kept values accumulate as DECIMAL over round(term, 9).
_WIN_SUM = "CAST(sum(CAST(round({t}, 9) AS DECIMAL(38,9))) AS DOUBLE)"


@_q(
    "agg_winsorized_mean",
    f"""
    WITH fences AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 4) AS lo,
             round(quantile_cont(value, 0.95), 4) AS hi
      FROM events GROUP BY event_type),
    j AS (
      SELECT e.event_type, e.value, f.lo, f.hi,
             least(greatest(e.value, f.lo), f.hi) AS w
      FROM events e JOIN fences f USING (event_type))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round({_WIN_SUM.format(t="value")} / count(*), 4) AS raw_mean,
           round({_WIN_SUM.format(t="w")} / count(*), 4)
               AS winsorized_mean,
           round({_WIN_SUM.format(
               t="CASE WHEN value >= lo AND value <= hi THEN value END")}
                 / sum(CASE WHEN value >= lo AND value <= hi
                            THEN 1 ELSE 0 END), 4) AS trimmed_mean
    FROM j GROUP BY event_type
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    fences = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("hi"),
    )
    j = e.join(F.broadcast(fences), "event_type").withColumn(
        "w", F.least(F.greatest("value", F.col("lo")), F.col("hi"))
    )
    kept = "CASE WHEN value >= lo AND value <= hi THEN value END"
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.expr(_WIN_SUM.format(t="value")) / F.count(F.lit(1)), 4
        ).alias("raw_mean"),
        F.round(
            F.expr(_WIN_SUM.format(t="w")) / F.count(F.lit(1)), 4
        ).alias("winsorized_mean"),
        F.round(
            F.expr(_WIN_SUM.format(t=kept))
            / F.expr(
                "sum(CASE WHEN value >= lo AND value <= hi"
                " THEN 1 ELSE 0 END)"
            ),
            4,
        ).alias("trimmed_mean"),
    )
