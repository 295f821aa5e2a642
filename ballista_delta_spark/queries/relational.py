"""Projections / filters / sorts / limits / set ops — SURVEY.md §2.2, §2.6, §2.7
(ids P1-P7, O1-O3, U1-U4).

Reference parity: all of these come from DataFusion core enabled by reference
src/lib.rs:36 and exercised via ``ctx.sql`` (reference README.md:57,
tests/local.rs:45). Spark-side they are single declarative DataFrame ops —
Catalyst pushes the filters/projections into the parquet scan (verify with
``.explain``: PushedFilters / ReadSchema) and fuses ORDER BY+LIMIT into
TakeOrderedAndProject (O3), so each stays one scan + at most one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- P1 project_select: bare column projection (reference tests/local.rs:45
# runs `select *`; the plan check is that ReadSchema lists only these 3 cols).
@_q(
    "project_select",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


# --- P2 project_expr: computed columns, aliases, CASE WHEN.
@_q(
    "project_expr",
    """
    SELECT o_orderkey,
           o_totalprice * 1.1 AS taxed_price,
           CASE WHEN o_totalprice >= 300000 THEN 'big'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'small' END AS size_tier,
           upper(o_orderstatus) AS status_uc
    FROM orders
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("taxed_price"),
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
        .alias("size_tier"),
        F.upper("o_orderstatus").alias("status_uc"),
    )


# --- P3 filter_predicate: =, <, >, AND, OR, NOT (pushed to the scan).
@_q(
    "filter_predicate",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 45 AND (l_discount < 0.02 OR l_discount > 0.08)
      AND NOT l_returnflag = 'A'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & ((F.col("l_discount") < 0.02) | (F.col("l_discount") > 0.08))
        & ~(F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# --- P4 filter_between_in_like: BETWEEN / IN / LIKE.
@_q(
    "filter_between_in_like",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_name LIKE '%al%'
    """,
)
def filter_between_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_name").like("%al%")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


# --- P5 filter_null: IS NULL / IS NOT NULL / null-safe equality.
# The synthetic tables are null-free, so nulls are introduced with nullif —
# mirroring the fixture's null-vs-sentinel discipline (reference
# tests/local.rs:36-39 stores the *string* 'NaN', not null).
@_q(
    "filter_null",
    """
    SELECT count(*) AS n_total,
           count(nullif(l_discount, 0.0)) AS n_discounted,
           CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_free,
           CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq
    FROM lineitem
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(disc).alias("n_discounted"),
        F.sum(F.when(disc.isNull(), 1).otherwise(0)).alias("n_free"),
        F.sum(F.when(disc.eqNullSafe(tax), 1).otherwise(0)).alias("n_nullsafe_eq"),
    )


# --- P6 project_cast: CAST / TRY_CAST.
@_q(
    "project_cast",
    """
    SELECT o_orderkey,
           -- Spark CAST(double AS BIGINT) truncates toward zero; DuckDB's
           -- rounds — trunc() first to pin the shared semantics.
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )


# --- P7 project_distinct: SELECT DISTINCT.
@_q(
    "project_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def project_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --- O1 sort_multi: multi-key ORDER BY with explicit direction + null placement.
# (Spark default is NULLS FIRST for ASC, DuckDB's is NULLS LAST — always
# explicit, per SURVEY.md §7 Phase B.)
@_q(
    "sort_multi",
    """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_nationkey").asc_nulls_last(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


# --- O2 limit_offset: LIMIT/OFFSET over a total order (deterministic page).
@_q(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100 OFFSET 500
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(500).limit(100)


# --- O3 topk: ORDER BY + LIMIT fuses to TakeOrderedAndProject (no full sort;
# each task keeps a k-heap — this is the 100 TB-safe top-k).
@_q(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- U1 set_union_all
@_q(
    "set_union_all",
    """
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionAll(s)


# --- U2 set_union (distinct)
@_q(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --- U3 set_intersect
@_q(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter("c_acctbal > 9000")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter("s_acctbal > 5000")
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


# --- U4 set_except (ALL variant to exercise multiplicity semantics)
@_q(
    "set_except",
    """
    SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 48
    EXCEPT ALL
    SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 48
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter("l_quantity > 48").select(F.col("l_orderkey").alias("okey"))
    b = (
        li.filter("l_returnflag = 'A' AND l_quantity > 48")
        .select(F.col("l_orderkey").alias("okey"))
    )
    return a.exceptAll(b)
