"""Scan / source / sink surface — SURVEY.md §2.1 ids S1-S10.

This is the layer the reference implements in its own code (scan registration,
object-store routing, the broken insert factory). Every query here derives a
Delta/CSV/JSON artifact *from the star tables* into a fresh temp dir, reads it
back through the engine path under test, and aggregates — so the DuckDB oracle
(which only sees the original parquet views) checks the full write→read
round-trip, not just the read.

Scale notes: Delta writes go through Spark's distributed parquet writer;
the driver-side commit is O(#files). Partitioned scans (S3) prune directories
before listing files. The HTTP path (S7) necessarily localizes through the
driver — matching the reference's niche HTTP object store, not a bulk path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import session as bd_session
from ..sources.delta import read_delta, write_delta
from ..sources.delta_dml import delete_delta, merge_delta, update_delta
from ..sources.registry import (
    register_csv,
    register_delta,
    register_json,
    register_parquet,
)
from ._registry import make_registry
from ._tables import TABLES, load, register_views

QUERIES: dict = {}
_q = make_registry(QUERIES)


# Every per-run scratch dir is tracked and reaped at process exit — a
# bench loop re-running the mutating ids would otherwise fill /tmp with
# full table copies until writes start failing mid-run.
_TMP_ROOTS: list[str] = []


def _tmp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=f"bds-{prefix}-")
    if not _TMP_ROOTS:
        import atexit

        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _TMP_ROOTS
            ]
        )
    _TMP_ROOTS.append(d)
    return d


# Derived artifacts (Delta/CSV/JSON copies of the star tables) are built once
# per (sf_dir, key) and reused — per-id rebuilds were the main reason the
# round-1 driver run timed out before reaching all ids. Mutating queries
# (INSERT/append) never touch a shared artifact: they file-copy it first,
# which is milliseconds vs seconds for a Spark write job.
_ARTIFACTS: dict[tuple[str, str], str] = {}


def _artifact(sf_dir: str, key: str, build) -> str:
    cached = _ARTIFACTS.get((sf_dir, key))
    if cached and os.path.exists(cached):
        return cached
    path = os.path.join(_tmp(key), key)
    build(path)
    _ARTIFACTS[(sf_dir, key)] = path
    return path


def _clone(src: str, prefix: str) -> str:
    dst = os.path.join(_tmp(prefix), os.path.basename(src))
    shutil.copytree(src, dst)
    return dst


def _enable_cdf_v0(path: str) -> None:
    """Rewrite a cloned table's v0 commit to declare
    ``delta.enableChangeDataFeed=true`` — the fixture shortcut for "this
    table was CREATED with CDF" (an ALTER would add a version and shift
    the ids' pinned version numbers). One shared implementation so the
    surgery cannot drift between the CDF-consuming ids."""
    import json as _json

    log0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    with open(log0) as fh:
        acts = [_json.loads(ln) for ln in fh]
    for a in acts:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"
            }
    with open(log0, "w") as fh:
        fh.writelines(_json.dumps(a) + "\n" for a in acts)


# directory -> base URL of a process-lifetime fixture HTTP server. The
# http-backed scans register LAZY readers (executor-side / distributed
# fetch at action time), so servers must outlive the query function —
# and re-running an id must reuse, not re-spawn.
_HTTP_SERVERS: dict[str, tuple[str, object]] = {}

# One process-lifetime atexit registration (ADVICE r12): keying it off
# dict emptiness re-registered the reaper after every manual
# _shutdown_http_servers() + respawn cycle — harmless no-ops, but each
# cycle accumulated another hook.
_REAPER_REGISTERED = False


def _shutdown_http_servers() -> None:
    """atexit reaper (mirrors the _TMP_ROOTS one): close every cached
    listener's socket and stop its serve_forever thread, so process exit
    doesn't leak sockets and a long-lived session doesn't keep serving
    directories that were since removed."""
    for _, httpd in _HTTP_SERVERS.values():
        try:
            httpd.shutdown()
            httpd.server_close()
        except Exception:
            pass
    _HTTP_SERVERS.clear()


def _http_serve(directory: str) -> str:
    ent = _HTTP_SERVERS.get(directory)
    if ent:
        return ent[0]
    import functools
    import http.server
    import threading

    global _REAPER_REGISTERED
    if not _REAPER_REGISTERED:
        import atexit

        atexit.register(_shutdown_http_servers)
        _REAPER_REGISTERED = True
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=directory
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    _HTTP_SERVERS[directory] = (base, httpd)
    return base


def _nation_delta(spark: SparkSession, sf_dir: str) -> str:
    return _artifact(
        sf_dir, "nation-delta",
        lambda p: write_delta(load(spark, sf_dir, "nation"), p, mode="overwrite"),
    )


def _orders_delta_partitioned(spark: SparkSession, sf_dir: str) -> str:
    return _artifact(
        sf_dir, "orders-delta",
        lambda p: write_delta(
            load(spark, sf_dir, "orders"), p,
            mode="overwrite", partition_by=["o_orderstatus"],
        ),
    )


def _orders_delta_ranged(spark: SparkSession, sf_dir: str) -> str:
    """orders as Delta with range-disjoint files on o_orderkey — the layout
    that makes min/max data skipping effective (what OPTIMIZE ZORDER or a
    sorted ingest produces)."""
    return _artifact(
        sf_dir, "orders-delta-ranged",
        lambda p: write_delta(
            load(spark, sf_dir, "orders").repartitionByRange(
                8, "o_orderkey"
            ),
            p, mode="overwrite",
        ),
    )


# --- S26 scan_delta_skipping: file-level DATA SKIPPING from add-action
# min/max stats (round 7) — eligible conjuncts prune provably-dead files
# DRIVER-side before Spark ever lists them (delta-spark PrepareDeltaScan
# parity; the pruning itself is pinned in tests/test_data_skipping.py —
# here the oracle checks exactness of the skipped scan).
@_q(
    "scan_delta_skipping",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey < 2000 AND o_totalprice > 150000
    """,
)
def scan_delta_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _orders_delta_ranged(spark, sf_dir)
    return read_delta(
        spark, path,
        where="o_orderkey >= 1000 AND o_orderkey < 2000 "
              "AND o_totalprice > 150000",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# --- S1 scan_delta_register: programmatic Delta register + SQL over it
# (reference README.md:51-57, examples/local_standalone.rs:30-35).
@_q(
    "scan_delta_register",
    """
    SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def scan_delta_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_delta(spark, "nation_delta", _nation_delta(spark, sf_dir))
    return spark.sql(
        """
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        FROM nation_delta GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )


# --- S2 scan_delta_ddl: CREATE EXTERNAL TABLE ... STORED AS DELTA
# (reference src/lib.rs:37, README.md:59, tests/local.rs:48).
@_q(
    "scan_delta_ddl",
    """
    SELECT r_name, r_regionkey FROM region
    """,
)
def scan_delta_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _artifact(
        sf_dir, "region-delta",
        lambda p: write_delta(load(spark, sf_dir, "region"), p, mode="overwrite"),
    )
    bd_session.sql(spark, f"CREATE EXTERNAL TABLE region_ddl STORED AS DELTA LOCATION '{path}'")
    return spark.sql("SELECT r_name, r_regionkey FROM region_ddl")


# --- S3 scan_delta_partitioned: Hive-partitioned Delta write + pruned read
# (reference fixture shape: partitionBy country, _delta_log/...json:1,3-6).
@_q(
    "scan_delta_partitioned",
    """
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def scan_delta_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_delta(spark, _orders_delta_partitioned(spark, sf_dir))
    # The o_orderstatus='O' filter prunes to one Hive directory before listing.
    return (
        df.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


# --- S4 scan_parquet: raw parquet registration
# (reference examples/s3_standalone.rs:35-39).
@_q(
    "scan_parquet",
    """
    SELECT s_nationkey, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_parquet(spark, "supplier_pq", os.path.join(sf_dir, "supplier.parquet"))
    return spark.sql(
        """
        SELECT s_nationkey, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
        FROM supplier_pq GROUP BY s_nationkey ORDER BY s_nationkey
        """
    )


# --- S5 scan_csv_json: CSV + NDJSON sources round-trip
# (reference links datafusion-datasource-csv/-json, Cargo.lock:1980,2005).
@_q(
    "scan_csv_json",
    """
    SELECT c.c_mktsegment AS seg, count(*) AS n, round(sum(c.c_acctbal), 2) AS bal
    FROM customer c JOIN customer j ON c.c_custkey = j.c_custkey
    GROUP BY c.c_mktsegment ORDER BY seg
    """,
)
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    csv_path = _artifact(
        sf_dir, "customer-csv",
        lambda p: cust.write.mode("overwrite").option("header", "true").csv(p),
    )
    json_path = _artifact(
        sf_dir, "customer-json",
        lambda p: cust.write.mode("overwrite").json(p),
    )
    register_csv(spark, "customer_csv", csv_path, schema=cust.schema)
    register_json(spark, "customer_json", json_path, schema=cust.schema)
    return spark.sql(
        """
        SELECT c.c_mktsegment AS seg, count(*) AS n, round(sum(c.c_acctbal), 2) AS bal
        FROM customer_csv c JOIN customer_json j ON c.c_custkey = j.c_custkey
        GROUP BY c.c_mktsegment ORDER BY seg
        """
    )


# --- scan_orc: ORC source round-trip (BEYOND the reference — DataFusion 50
# core has no ORC datasource; Spark's reader/writer are built in, and
# warehouse migrations hit ORC constantly). Written once from the parquet
# fixture, then scanned with predicate/projection pushdown like any
# columnar source; the oracle reads the same rows from parquet.
@_q(
    "scan_orc",
    """
    SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    orc_path = _artifact(
        sf_dir, "nation-orc",
        lambda p: nat.write.mode("overwrite").orc(p),
    )
    spark.read.orc(orc_path).createOrReplaceTempView("nation_orc")
    return spark.sql(
        """
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM nation_orc GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )


# --- S6 scan_s3: the S3/MinIO path (reference src/object_store.rs:42-47,
# examples/s3_standalone.rs:15-18, tests/store.rs:19-70 — all against
# MinIO's s3://ballista bucket). This container has no docker/MinIO and no
# hadoop-aws jars, so the query stands up an in-process moto S3 server and
# reads through `register_s3_parquet` — pyarrow's NATIVE S3 client doing
# the real wire protocol (ListObjectsV2 + ranged GetObject), with each
# file fetched executor-side by its task's own client (the s3a/JVM path
# is refused in this environment — SURVEY §2.1 S6). Falls back to
# file:// URL routing only where moto isn't installed.
_MOTO_S3: dict = {"server": None, "endpoint": None, "uploaded": set()}


def _sf_key(sf_dir: str) -> str:
    """s3 key for this sf_dir's part table. Hash of the FULL normalized
    path — keying on the basename alone would let two different dirs
    named sf0.01 silently overwrite each other's object."""
    import hashlib

    h = hashlib.md5(os.path.normpath(sf_dir).encode()).hexdigest()[:12]
    return f"tpch/{h}/part.parquet"


def _moto_endpoint(sf_dir: str) -> str | None:
    """Lazily boot a process-lifetime moto S3 server and mirror
    ``part.parquet`` into s3://ballista/ (the reference's bucket name,
    tests/store.rs:23). Returns the endpoint URL, or None when moto is
    unavailable in this environment."""
    try:
        from ..sources.moto_s3 import s3_client, start_moto_s3
    except ImportError:
        return None
    if _MOTO_S3["server"] is None:
        try:
            server, endpoint = start_moto_s3()
        except ImportError:
            return None
        _MOTO_S3["server"] = server
        _MOTO_S3["endpoint"] = endpoint
    if sf_dir not in _MOTO_S3["uploaded"]:
        s3 = s3_client(_MOTO_S3["endpoint"])
        try:
            s3.create_bucket(Bucket="ballista")
        except Exception as exc:
            # Only bucket-already-exists may pass silently — a dead moto
            # daemon or wrong endpoint must fail HERE, not resurface as
            # a confusing put_object/read error later.
            code = getattr(exc, "response", {}).get("Error", {}).get("Code")
            if code not in ("BucketAlreadyOwnedByYou", "BucketAlreadyExists"):
                raise
        with open(os.path.join(sf_dir, "part.parquet"), "rb") as fh:
            # seekable file handle streams at constant memory (at a big
            # SF, fh.read() would materialize the object in the driver)
            s3.put_object(Bucket="ballista", Key=_sf_key(sf_dir), Body=fh)
        _MOTO_S3["uploaded"].add(sf_dir)
    return _MOTO_S3["endpoint"]


@_q(
    "scan_s3",
    """
    SELECT p_brand, count(*) AS n_parts
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def scan_s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_s3_parquet

    endpoint = _moto_endpoint(sf_dir)
    if endpoint is None:  # environment without moto: URL-routing fallback
        url = "file://" + os.path.join(sf_dir, "part.parquet")
        register_parquet(spark, "part_url", url)
        return spark.sql(
            "SELECT p_brand, count(*) AS n_parts FROM part_url "
            "GROUP BY p_brand ORDER BY p_brand"
        )
    register_s3_parquet(
        spark,
        "part_s3",
        f"s3://ballista/{_sf_key(sf_dir)}",
        endpoint=endpoint,
        access_key="testing",
        secret_key="testing",
        # the aggregation needs ONE column; prune it below the Python
        # boundary so only p_brand's column chunks cross the wire
        columns=["p_brand"],
    )
    return spark.sql(
        "SELECT p_brand, count(*) AS n_parts FROM part_s3 "
        "GROUP BY p_brand ORDER BY p_brand"
    )


# --- S7 scan_http: HTTP(S) object store (reference src/object_store.rs:36-41).
# Served from a real local HTTP server; the fetch localizes through the driver
# (SURVEY §2.1: addFile+local read), then the scan is a normal parquet scan.
@_q(
    "scan_http",
    """
    SELECT r_regionkey, r_name FROM region
    """,
)
def scan_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_http_parquet

    # Process-lifetime cached server: the registered scan can fetch
    # LAZILY (the distributed fallback for big files / non-local
    # masters fetches at action time), so shutting the server down here
    # would fail the query at collect; caching also stops a bench loop
    # from accumulating one listener per run.
    url = _http_serve(sf_dir) + "/region.parquet"
    register_http_parquet(spark, "region_http", url)
    return spark.sql("SELECT r_regionkey, r_name FROM region_http")


# --- S32 scan_delta_http: a Delta table behind plain HTTP(S) — the log
# mirrors driver-side (metadata-sized), data files stream executor-side
# through ranged GETs, and the where-clause prunes files on the mirrored
# stats BEFORE any data byte moves. Mirrors the reference serving Delta
# scans through its HTTP object store (reference src/object_store.rs:36-41),
# which the parquet-only http path did not cover (r8 verdict gap #1).
@_q(
    "scan_delta_http",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey <= 2
    """,
)
def scan_delta_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import register_delta_http

    tbl = _nation_delta(spark, sf_dir)
    # Process-lifetime cached server (one per directory): the
    # executor-side fetch runs when the returned DataFrame executes, so
    # the server must outlive this call — and re-running the id must
    # not stack up listeners.
    base = _http_serve(os.path.dirname(tbl))
    df = register_delta_http(
        spark, "nation_delta_http",
        f"{base}/{os.path.basename(tbl)}",
        where="n_regionkey <= 2",
    )
    return df.select("n_nationkey", "n_name", "n_regionkey")


# --- S8 meta_information_schema: catalog introspection
# (reference src/lib.rs:19 with_information_schema; SHOW TABLES analogue).
@_q(
    "meta_information_schema",
    f"""
    SELECT table_name FROM information_schema.tables
    WHERE table_name IN ({", ".join(repr(t) for t in TABLES)})
    ORDER BY table_name
    """,
)
def meta_information_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return (
        spark.sql("SHOW TABLES")
        .filter(F.col("tableName").isin(*TABLES))
        .select(F.col("tableName").alias("table_name"))
        .orderBy("table_name")
    )


# --- S8b meta_describe_columns: column-level catalog introspection
# (reference src/lib.rs:19 with_information_schema implies columns/types;
# Spark surface: spark.catalog.listColumns / DESCRIBE). Catalog metadata is
# driver-side by nature — O(#columns), no data scan. Type names are
# normalized to the ANSI/DuckDB spellings so the oracle is exact.
_SPARK_TO_ANSI_TYPE = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "boolean": "BOOLEAN",
}


@_q(
    "meta_describe_columns",
    """
    SELECT table_name, column_name,
           CAST(ordinal_position AS BIGINT) AS pos,
           data_type
    FROM information_schema.columns
    WHERE table_name IN ('nation', 'region', 'orders')
    ORDER BY table_name, pos
    """,
)
def meta_describe_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "nation", "region", "orders")
    rows = []
    for t in ("nation", "region", "orders"):
        for pos, col in enumerate(spark.catalog.listColumns(t), start=1):
            rows.append(
                (t, col.name, pos, _SPARK_TO_ANSI_TYPE.get(col.dataType, col.dataType.upper()))
            )
    return spark.createDataFrame(
        rows, "table_name string, column_name string, pos bigint, data_type string"
    ).orderBy("table_name", "pos")


# --- meta_describe_detail: DESCRIBE DETAIL — one row of table-level
# metadata (format, partition/clustering columns, file count, protocol,
# features); the deterministic subset is oracle-checked as literals:
# the table is built fresh with a pinned file layout (coalesce(1) per
# region partition -> 5 files) and then CLUSTER BY upgrades the protocol
# to writer 7 with a fully-predictable feature list.
@_q(
    "meta_describe_detail",
    """
    SELECT 'delta' AS format,
           'n_regionkey' AS partition_cols,
           'n_nationkey' AS clustering_cols,
           CAST(5 AS BIGINT) AS num_files,
           1 AS min_reader, 7 AS min_writer,
           'appendOnly,clustering,domainMetadata,invariants' AS features
    """,
)
def meta_describe_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import (
        cluster_by,
        describe_detail,
    )
    from ._tables import load

    path = os.path.join(_tmp("mdd"), "t")
    nat = load(spark, sf_dir, "nation")
    write_delta(
        # coalesce(1) collapses to a single task regardless of any
        # preceding hash partitioning; partition_by alone yields the
        # pinned 5-file layout without a dead full shuffle
        nat.coalesce(1), path,
        partition_by=["n_regionkey"],
    )
    cluster_by(path, ["n_nationkey"])
    return describe_detail(spark, path).select(
        "format",
        F.array_join("partitionColumns", ",").alias("partition_cols"),
        F.array_join("clusteringColumns", ",").alias("clustering_cols"),
        F.col("numFiles").alias("num_files"),
        F.col("minReaderVersion").alias("min_reader"),
        F.col("minWriterVersion").alias("min_writer"),
        F.array_join("tableFeatures", ",").alias("features"),
    )


# --- S9 sink_delta_insert: INSERT INTO a Delta table. The reference DECLARES
# this and asserts it FAILS ("Can't encode non-delta tables",
# tests/local.rs:100-103). Here the same SQL shape commits a real Delta
# version and the read-back reflects it — parity exceeded.
@_q(
    "sink_delta_insert",
    """
    SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM (SELECT n_nationkey, n_regionkey FROM nation
          UNION ALL
          SELECT n_nationkey + 100 AS n_nationkey, n_regionkey FROM nation
          WHERE n_regionkey <= 1) t
    GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def sink_delta_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Clone the shared artifact: INSERT mutates, and each run must start from
    # the pristine base for the oracle comparison to hold.
    path = _clone(_nation_delta(spark, sf_dir), "s9")
    bd_session.sql(spark, f"CREATE EXTERNAL TABLE nation_ins STORED AS DELTA LOCATION '{path}'")
    bd_session.sql(
        spark,
        """INSERT INTO nation_ins
           SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey
           FROM nation_ins WHERE n_regionkey <= 1""",
    )
    return spark.sql(
        """
        SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS key_sum
        FROM nation_ins GROUP BY n_regionkey ORDER BY n_regionkey
        """
    )


# --- S10 sink_delta_write_local: DataFrame-API Delta write (append after
# overwrite, partitioned) + versioned read-back. The reference's working write
# path silently degrades to single-process local execution
# (examples/local_write_standalone.rs:11-15); Spark's stays distributed.
@_q(
    "sink_delta_write_local",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM (SELECT o_orderstatus FROM orders
          UNION ALL
          SELECT o_orderstatus FROM orders WHERE o_totalprice > 400000) t
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sink_delta_write_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_orders_delta_partitioned(spark, sf_dir), "s10")
    orders = load(spark, sf_dir, "orders")
    write_delta(orders.filter(F.col("o_totalprice") > 400000), path, mode="append")
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


# --- S11 sink_delta_delete: copy-on-write DELETE. No reference analogue at
# all (its whole write surface errors, reference src/lib.rs:140-174) — this is
# the delta-spark DELETE FROM path. The predicate spans a full partition
# (o_orderstatus='F' -> every file in that Hive dir removed METADATA-ONLY,
# zero rewrite I/O — the 100 TB retention-delete shape) plus a selective
# in-partition predicate (P files partially rewritten).
@_q(
    "sink_delta_delete",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders
    WHERE NOT coalesce(
        o_orderstatus = 'F'
        OR (o_orderstatus = 'P' AND o_totalprice > 150000), false)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sink_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_orders_delta_partitioned(spark, sf_dir), "s11")
    delete_delta(
        spark, path,
        "o_orderstatus = 'F' OR (o_orderstatus = 'P' AND o_totalprice > 150000)",
    )
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


# --- S12 sink_delta_update: copy-on-write UPDATE ... SET ... WHERE. Only
# files containing a matching row are rewritten; SET expressions see the
# pre-update row (SQL semantics), checked by updating the key its own SET
# references.
@_q(
    "sink_delta_update",
    """
    SELECT CASE WHEN n_regionkey IN (1, 3) THEN n_nationkey + 100
                ELSE n_nationkey END AS n_nationkey,
           CASE WHEN n_regionkey IN (1, 3) THEN n_name || '_EU'
                ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
)
def sink_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s12")
    update_delta(
        spark, path,
        "n_regionkey IN (1, 3)",
        {"n_nationkey": "n_nationkey + 100", "n_name": "concat(n_name, '_EU')"},
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S13 sink_delta_merge: MERGE INTO (update + insert branches). Source =
# derived updates for every 3rd nation + 3 brand-new keys; ambiguous
# multi-match sources are rejected (tests). The oracle reconstructs the
# post-merge table with LEFT JOIN + ANTI JOIN.
@_q(
    "sink_delta_merge",
    """
    WITH src AS (
      SELECT n_nationkey, upper(n_name) AS new_name
      FROM nation WHERE n_nationkey % 3 = 0
      UNION ALL
      SELECT n_nationkey + 30 AS n_nationkey, 'NEW_' || n_name AS new_name
      FROM nation WHERE n_nationkey < 3)
    SELECT t.n_nationkey,
           CASE WHEN s.n_nationkey IS NOT NULL THEN s.new_name
                ELSE t.n_name END AS n_name,
           t.n_regionkey
    FROM nation t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey
    UNION ALL
    SELECT s.n_nationkey, s.new_name AS n_name, 9 AS n_regionkey
    FROM src s ANTI JOIN nation t ON t.n_nationkey = s.n_nationkey
    """,
)
def sink_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s13")
    nat = load(spark, sf_dir, "nation")
    src = nat.filter("n_nationkey % 3 = 0").select(
        "n_nationkey", F.upper("n_name").alias("new_name")
    ).unionByName(
        nat.filter("n_nationkey < 3").select(
            (F.col("n_nationkey") + 30).alias("n_nationkey"),
            F.concat(F.lit("NEW_"), F.col("n_name")).alias("new_name"),
        )
    )
    merge_delta(
        spark, path, src,
        "t.n_nationkey = s.n_nationkey",
        matched_update={"n_name": "s.new_name"},
        not_matched_insert={
            "n_nationkey": "s.n_nationkey",
            "n_name": "s.new_name",
            "n_regionkey": "9",
        },
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S18 sink_delta_merge_conditional: MERGE with per-clause conditions
# (WHEN MATCHED AND ... THEN DELETE / UPDATE, WHEN NOT MATCHED AND ... THEN
# INSERT), delta-spark first-match-wins semantics. Beyond the reference
# (whose write surface errors) AND beyond our own r4 MERGE, which raised on
# conditional clauses. The oracle reconstructs the post-merge state: a
# matched row is deleted if clause 1 holds, updated if clause 2 holds,
# otherwise untouched; unmatched source rows insert only under the insert
# clause's condition.
@_q(
    "sink_delta_merge_conditional",
    """
    WITH src AS (
      SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT n_nationkey + 30 AS n_nationkey, 'NEW_' || n_name AS n_name
      FROM nation WHERE n_nationkey < 5)
    SELECT t.n_nationkey,
           CASE WHEN s.n_nationkey IS NOT NULL
                     AND NOT t.n_regionkey IN (1, 3)
                     AND s.n_nationkey % 2 = 0
                THEN lower(s.n_name) ELSE t.n_name END AS n_name,
           t.n_regionkey
    FROM nation t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey
    WHERE NOT (s.n_nationkey IS NOT NULL AND t.n_regionkey IN (1, 3))
    UNION ALL
    SELECT s.n_nationkey, s.n_name, 9 AS n_regionkey
    FROM src s ANTI JOIN nation t ON t.n_nationkey = s.n_nationkey
    WHERE s.n_nationkey >= 32
    """,
)
def sink_delta_merge_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s18")
    nat = load(spark, sf_dir, "nation")
    src = nat.filter("n_nationkey < 10").select("n_nationkey", "n_name").unionByName(
        nat.filter("n_nationkey < 5").select(
            (F.col("n_nationkey") + 30).alias("n_nationkey"),
            F.concat(F.lit("NEW_"), F.col("n_name")).alias("n_name"),
        )
    )
    merge_delta(
        spark, path, src,
        "t.n_nationkey = s.n_nationkey",
        matched_clauses=[
            ("t.n_regionkey IN (1, 3)", "delete", None),
            ("s.n_nationkey % 2 = 0", "update", {"n_name": "lower(s.n_name)"}),
        ],
        not_matched_clauses=[
            ("s.n_nationkey >= 32", {
                "n_nationkey": "s.n_nationkey",
                "n_name": "s.n_name",
                "n_regionkey": "9",
            }),
        ],
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S20 sink_delta_delete_dv: merge-on-read DELETE — rows recorded in a
# per-file DELETION VECTOR (sources/dv.py), no data file rewritten; cost is
# O(deleted rows) vs copy-on-write's O(rewritten bytes) — the delta-spark
# default for point deletes at 100 TB. First DV commit upgrades the table
# to reader v3 / writer v7 + deletionVectors, like delta-spark. The oracle
# is the surviving-row relation; the DV mechanics (same files, bitmap
# content, protocol bump, purge-on-OPTIMIZE) are pinned in
# tests/test_deletion_vectors.py.
@_q(
    "sink_delta_delete_dv",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE NOT coalesce(n_regionkey IN (0, 2) AND n_nationkey % 2 = 1, false)
    """,
)
def sink_delta_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s20")
    delete_delta(
        spark, path,
        "n_regionkey IN (0, 2) AND n_nationkey % 2 = 1",
        mode="dv",
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S22 sink_delta_update_dv: merge-on-read UPDATE — pre-image rows die
# in per-file deletion vectors, only post-image rows are appended as new
# files (delta-spark's default since 3.1). Cost O(updated rows), not
# O(rewritten bytes): on a 100 TB table a low-selectivity wide UPDATE
# stops paying full copy-on-write rewrites. Oracle = the post-update
# relation; DV mechanics (files kept, bitmap merge, second-update
# remarking, CDF images) are pinned in tests/test_deletion_vectors.py.
@_q(
    "sink_delta_update_dv",
    """
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 2 AND n_nationkey % 2 = 0
                THEN lower(n_name) ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
)
def sink_delta_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s22")
    update_delta(
        spark, path,
        "n_regionkey = 2 AND n_nationkey % 2 = 0",
        {"n_name": "lower(n_name)"},
        mode="dv",
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S23 sink_delta_merge_dv: merge-on-read MERGE — matched update/delete
# pre-images recorded in deletion vectors, post-images + inserts appended;
# no target file rewritten. The (file, row_index) identity the DV needs
# doubles as the duplicate-match key. Same relational contract as the
# copy-on-write MERGE, so the oracle has the same LEFT JOIN + ANTI JOIN
# shape (delete clause filtered, update applied, unmatched inserted).
@_q(
    "sink_delta_merge_dv",
    """
    WITH src AS (
      SELECT n_nationkey, upper(n_name) AS new_name
      FROM nation WHERE n_nationkey % 3 = 0
      UNION ALL
      SELECT n_nationkey + 30 AS n_nationkey, 'NEW_' || n_name AS new_name
      FROM nation WHERE n_nationkey < 3)
    SELECT t.n_nationkey,
           CASE WHEN s.n_nationkey IS NOT NULL THEN s.new_name
                ELSE t.n_name END AS n_name,
           t.n_regionkey
    FROM nation t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey
    WHERE NOT (s.n_nationkey IS NOT NULL AND t.n_regionkey = 4)
    UNION ALL
    SELECT s.n_nationkey, s.new_name AS n_name, 9 AS n_regionkey
    FROM src s ANTI JOIN nation t ON t.n_nationkey = s.n_nationkey
    """,
)
def sink_delta_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s23")
    nat = load(spark, sf_dir, "nation")
    src = nat.filter("n_nationkey % 3 = 0").select(
        "n_nationkey", F.upper("n_name").alias("new_name")
    ).unionByName(
        nat.filter("n_nationkey < 3").select(
            (F.col("n_nationkey") + 30).alias("n_nationkey"),
            F.concat(F.lit("NEW_"), F.col("n_name")).alias("new_name"),
        )
    )
    merge_delta(
        spark, path, src,
        "t.n_nationkey = s.n_nationkey",
        matched_clauses=[
            ("t.n_regionkey = 4", "delete", None),
            (None, "update", {"n_name": "s.new_name"}),
        ],
        not_matched_clauses=[(None, {
            "n_nationkey": "s.n_nationkey",
            "n_name": "s.new_name",
            "n_regionkey": "9",
        })],
        mode="dv",
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S21 sink_delta_cdf: change data feed — UPDATE and DELETE on a
# delta.enableChangeDataFeed=true table stage _change_data files
# (update_preimage/update_postimage/delete) with cdc actions, and
# read_delta_changes consumes them per the spec (a commit with cdc actions
# is read exclusively through them). The oracle reconstructs the exact
# change set; the delete runs AFTER the update, so deleted region-1 rows
# carry their post-update names.
@_q(
    "sink_delta_cdf",
    """
    SELECT n_nationkey, n_name, n_regionkey,
           'update_preimage' AS _change_type
    FROM nation WHERE n_regionkey = 1
    UNION ALL
    SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey,
           'update_postimage' AS _change_type
    FROM nation WHERE n_regionkey = 1
    UNION ALL
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 1 THEN upper(n_name) ELSE n_name END
             AS n_name,
           n_regionkey, 'delete' AS _change_type
    FROM nation WHERE n_nationkey >= 20
    """,
)
def sink_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import read_delta_changes
    from ballista_delta_spark.sources.delta_dml import delete_delta

    path = _clone(_nation_delta(spark, sf_dir), "s21")
    _enable_cdf_v0(path)
    update_delta(
        spark, path, "n_regionkey = 1", {"n_name": "upper(n_name)"}
    )
    delete_delta(spark, path, "n_nationkey >= 20")
    return read_delta_changes(spark, path, 0, 2).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )


# --- S24 sink_delta_rename_column: ALTER TABLE RENAME/DROP COLUMN via
# columnMapping=name (round 7). O(1) metadata commits — no data rewrite —
# then an APPEND that must stage parquet under the ORIGINAL physical name
# for the mapped reads to stay consistent. The oracle replays the logical
# outcome: renamed header, appended rows, dropped column gone.
@_q(
    "sink_delta_rename_column",
    """
    SELECT n_nationkey, n_name AS nation_name FROM nation
    UNION ALL SELECT 90, 'ATLANTIS'
    UNION ALL SELECT 91, 'LEMURIA'
    """,
)
def sink_delta_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import alter_columns

    path = _clone(_nation_delta(spark, sf_dir), "s24")
    alter_columns(path, renames={"n_name": "nation_name"})
    extra = spark.createDataFrame(
        [(90, "ATLANTIS", 9), (91, "LEMURIA", 9)],
        "n_nationkey int, nation_name string, n_regionkey int",
    )
    write_delta(extra, path, mode="append")
    alter_columns(path, drops=["n_regionkey"])
    return read_delta(spark, path).select("n_nationkey", "nation_name")


# --- S25 sink_delta_clone: SHALLOW CLONE (round 7) — zero-copy fork whose
# version-0 commit references the source's files by absolute path, then
# independent DML on the clone. The oracle replays the logical outcome;
# the final SELECT also implicitly proves the source survived (the clone's
# non-region-2 rows must equal the source's, which the nation view is).
@_q(
    "sink_delta_clone",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey <> 2
    UNION ALL SELECT 99, 'CLONETOPIA', 2
    """,
)
def sink_delta_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import clone_delta
    from ballista_delta_spark.sources.delta_dml import delete_delta

    src = _nation_delta(spark, sf_dir)
    dst = os.path.join(_tmp("s25"), "clone")
    clone_delta(src, dst)
    delete_delta(spark, dst, "n_regionkey = 2")
    extra = spark.createDataFrame(
        [(99, "CLONETOPIA", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write_delta(extra, dst, mode="append")
    return read_delta(spark, dst).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# --- S27 sink_delta_reorg: REORG TABLE APPLY (PURGE) (round 7) — after a
# merge-on-read DELETE leaves deletion vectors behind, REORG rewrites ONLY
# the DV-carrying files (dataChange=false), leaving untouched files alone;
# afterwards no active file references a DV. 100 TB shape: the rewrite
# scan is the DV'd-file subset, not the table. The oracle is the
# surviving-row relation (REORG must be content-preserving); the
# file-level contract (clean files untouched, DVs gone, stream-invisible)
# is pinned in tests/test_deletion_vectors.py.
@_q(
    "sink_delta_reorg",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE NOT coalesce(n_nationkey % 5 = 0, false)
    """,
)
def sink_delta_reorg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import DeltaTable, reorg_purge

    path = _clone(_nation_delta(spark, sf_dir), "s27")
    delete_delta(spark, path, "n_nationkey % 5 = 0", mode="dv")
    reorg_purge(spark, path)
    snap = DeltaTable(path).snapshot
    if any(a.get("deletionVector") for a in snap.files.values()):
        raise AssertionError("REORG left an active deletion vector")
    return read_delta(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# --- S28 sink_delta_evolve: schema evolution (round 7) — metadata-only
# ALTER TABLE ADD COLUMN (old files read the new column as null; zero
# data jobs) followed by a mergeSchema append that widens the schema with
# a second new column in the same commit as its data. The oracle replays
# the logical outcome over the nation view.
@_q(
    "sink_delta_evolve",
    """
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS VARCHAR) AS note,
           CAST(NULL AS BIGINT) AS pop
    FROM nation
    UNION ALL SELECT 95, 'NOVA', 9, 'added', 7
    """,
)
def sink_delta_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import alter_columns

    path = _clone(_nation_delta(spark, sf_dir), "s28")
    alter_columns(path, adds={"note": "string"})
    extra = spark.createDataFrame(
        [(95, "NOVA", 9, "added", 7)],
        "n_nationkey int, n_name string, n_regionkey int, "
        "note string, pop bigint",
    )
    write_delta(extra, path, mode="append", merge_schema=True)
    return read_delta(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey", "note", "pop"
    )


# --- S29 sink_delta_widen: ALTER COLUMN TYPE — the typeWidening table
# feature (metadata-only lossless retype; files written under the narrow
# type read back widened — Spark 4 parquet widening conversions, see
# sources/delta.py alter_column_type). The query widens nation's int key
# to BIGINT, appends a row whose key only fits in 64 bits, and reads the
# mixed-file table back; the oracle computes the same union with the key
# cast wide. Exceeds the reference (no ALTER surface, src/lib.rs:36).
@_q(
    "sink_delta_widen",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, n_regionkey
    FROM nation
    UNION ALL SELECT 5000000000, 'WIDE', 9
    """,
)
def sink_delta_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import alter_column_type

    path = _clone(_nation_delta(spark, sf_dir), "s29")
    alter_column_type(path, "n_nationkey", "bigint")
    extra = spark.createDataFrame(
        [(5_000_000_000, "WIDE", 9)],
        "n_nationkey long, n_name string, n_regionkey int",
    )
    write_delta(extra, path, mode="append")
    return read_delta(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# --- S30 sink_delta_variant: VARIANT column through a Delta table — the
# variantType table feature (reader 3 / writer 7 pair, schema-implied;
# sources/delta.py). Rows from events become binary variants, land in a
# Delta commit (Spark-side numRecords stats — pyarrow predates the
# parquet logical type), and read back through typed path extraction;
# the oracle computes the identical scalars straight from the JSON.
@_q(
    "sink_delta_variant",
    """
    SELECT event_id,
           COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
           concat('u', user_id) AS uname
    FROM events WHERE event_id < 200
    """,
)
def sink_delta_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    # COALESCE: Spark's concat is NULL-absorbing (one NULL extract would
    # void the whole doc) while DuckDB's concat skips NULLs — pin both
    # sides to 0 so a props row without $.k cannot diverge.
    doc = F.concat(
        F.lit('{"k": '),
        F.coalesce(F.get_json_object("props", "$.k").cast("bigint"),
                   F.lit(0)).cast("string"),
        F.lit(', "u": "u'),
        F.col("user_id").cast("string"),
        F.lit('"}'),
    )
    path = os.path.join(_tmp("s30"), "variant-delta")
    write_delta(
        e.select("event_id", F.parse_json(doc).alias("v")), path
    )
    back = read_delta(spark, path)
    return back.select(
        "event_id",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.u", "string").alias("uname"),
    )


# --- S31 sink_delta_replace_where: predicate overwrite — delta-spark's
# option("replaceWhere") (sources/delta_dml.py replace_where_delta). The
# idempotent backfill primitive: one commit deletes the declared slice
# (metadata-only for fully-covered files) and inserts its recomputed
# replacement; strict containment refuses rows leaking outside. The
# query replaces region 2's nations with renamed rows; the oracle is the
# equivalent anti-slice union.
@_q(
    "sink_delta_replace_where",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey <> 2
    UNION ALL
    SELECT n_nationkey, concat('NEW_', n_name) AS n_name, n_regionkey
    FROM nation WHERE n_regionkey = 2
    """,
)
def sink_delta_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta_dml import replace_where_delta

    path = _clone(_nation_delta(spark, sf_dir), "s31")
    recomputed = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select(
            "n_nationkey",
            F.concat(F.lit("NEW_"), F.col("n_name")).alias("n_name"),
            "n_regionkey",
        )
    )
    replace_where_delta(spark, path, recomputed, "n_regionkey = 2")
    return read_delta(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# --- S19 sink_delta_zorder: OPTIMIZE ... ZORDER BY — Morton-curve
# clustering rewrite (dataChange=false). The query proves the rewrite is
# content-preserving (rows identical to the source table) AND actually
# clustered: it recomputes per-file stats tightness driver-side in the
# implementation's test (tests/test_delta.py); here the oracle checks the
# data contract, which is what a reader of the table observes.
@_q(
    "sink_delta_zorder",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def sink_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import optimize

    path = _clone(_nation_delta(spark, sf_dir), "s19")
    optimize(
        spark, path, target_file_rows=8,
        zorder_by=["n_nationkey", "n_regionkey"],
    )
    return read_delta(spark, path).select("n_nationkey", "n_name", "n_regionkey")


# --- S15 sink_delta_restore: RESTORE TO VERSION AS OF — metadata-only
# rollback committed as a NEW version (delta-spark RESTORE semantics; no
# reference analogue, its write surface errors). The query reads BOTH the
# restored current state (== pristine v0) and the pre-restore v1 snapshot,
# proving history survives the rollback.
@_q(
    "sink_delta_restore",
    """
    SELECT 'restored' AS snap, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'pre_restore' AS snap, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation WHERE NOT coalesce(n_regionkey = 2, false)
    """,
)
def sink_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.delta import restore_delta

    path = _clone(_nation_delta(spark, sf_dir), "s15")
    delete_delta(spark, path, "n_regionkey = 2")  # v1
    restore_delta(path, 0)                        # v2: back to pristine

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        ).select(F.lit(tag).alias("snap"), "n", "key_sum")

    return agg(read_delta(spark, path), "restored").unionByName(
        agg(read_delta(spark, path, version=1), "pre_restore")
    )


# --- S16 sink_delta_changes: row-level change feed between versions (CDC
# from the file-level snapshot diff; copy-on-write UPDATE = delete+insert
# pair). Only changed files are scanned — O(churn) incremental consumption.
@_q(
    "sink_delta_changes",
    """
    SELECT n_nationkey, n_name, n_regionkey, 'delete' AS _change_type
    FROM nation WHERE n_regionkey IN (1, 3)
    UNION ALL
    SELECT n_nationkey, n_name || '_EU' AS n_name, n_regionkey, 'insert'
    FROM nation WHERE n_regionkey IN (1, 3)
    """,
)
def sink_delta_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.delta import read_delta_changes

    path = _clone(_nation_delta(spark, sf_dir), "s16")
    update_delta(
        spark, path, "n_regionkey IN (1, 3)",
        {"n_name": "concat(n_name, '_EU')"},
    )
    return read_delta_changes(spark, path, 0, 1).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )


# --- S14 scan_delta_time_travel: versioned reads (VERSION AS OF analogue;
# delta-rs load_version). v0 = pristine table, v1 = after a DELETE — both
# snapshots served from one log by replaying adds/removes up to the pinned
# version. The oracle reconstructs each snapshot relationally.
@_q(
    "scan_delta_time_travel",
    """
    SELECT 'v0' AS snap, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'v1' AS snap, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation WHERE NOT coalesce(n_regionkey = 2, false)
    """,
)
def scan_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _clone(_nation_delta(spark, sf_dir), "s14")
    delete_delta(spark, path, "n_regionkey = 2")

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        ).select(F.lit(tag).alias("snap"), "n", "key_sum")

    return agg(read_delta(spark, path, version=0), "v0").unionByName(
        agg(read_delta(spark, path), "v1")
    )


# --- meta_describe_history: DESCRIBE HISTORY — the commit ledger every
# table UI/debugger reads. Fixture table built fresh with a pinned
# 4-operation history (WRITE, WRITE, DELETE, OPTIMIZE); the
# deterministic (version, operation, mode) triples are oracle-checked as
# literals. Metadata-only: O(versions) driver work, zero data jobs
# beyond the fixture build. Reference parity: delta-rs surfaces the same
# ledger as `DeltaTable.history()`.
@_q(
    "meta_describe_history",
    """
    SELECT CAST(version AS BIGINT) AS version, operation, op_mode
    FROM (VALUES (0, 'WRITE', 'Append'),
                 (1, 'WRITE', 'Append'),
                 (2, 'DELETE', ''),
                 (3, 'OPTIMIZE', '')) AS t(version, operation, op_mode)
    ORDER BY version
    """,
)
def meta_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import DeltaTable, optimize
    from ballista_delta_spark.sources.delta_dml import delete_delta
    from ._tables import load

    path = os.path.join(_tmp("mdh"), "t")
    nat = load(spark, sf_dir, "nation")
    write_delta(nat.coalesce(1), path)
    write_delta(
        nat.withColumn(
            "n_nationkey", F.col("n_nationkey") + F.lit(100)
        ).coalesce(1),
        path,
        mode="append",
    )
    delete_delta(spark, path, "n_nationkey < 5")
    optimize(spark, path)
    rows = [
        (
            h["version"],
            h["operation"],
            (h.get("operationParameters") or {}).get("mode", ""),
        )
        for h in DeltaTable(path).history()
    ]
    return spark.createDataFrame(
        rows, "version long, operation string, op_mode string"
    ).orderBy("version")


# --- meta_version_checksum: the N.crc VersionChecksum surface as a query
# — per-version audit of the stored checksum sidecars against a fresh
# log replay (verify_checksum), plus the deterministic aggregates the
# crc records (file count, DV count, DV-deleted records). Fixture: two
# single-file writes, then a deletion-vector DELETE of 5 rows — every
# stored crc must verify, and v2 must record exactly one DV holding 5
# deleted records while numFiles stays put (merge-on-read).
@_q(
    "meta_version_checksum",
    """
    SELECT CAST(version AS BIGINT) AS version, crc_ok,
           CAST(num_files AS BIGINT) AS num_files,
           CAST(num_dvs AS BIGINT) AS num_dvs,
           CAST(deleted_records AS BIGINT) AS deleted_records
    FROM (VALUES (0, true, 1, 0, 0),
                 (1, true, 2, 0, 0),
                 (2, true, 2, 1, 5)) AS t(
        version, crc_ok, num_files, num_dvs, deleted_records)
    ORDER BY version
    """,
)
def meta_version_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_delta_spark.sources.delta import (
        read_version_checksum,
        verify_checksum,
    )
    from ballista_delta_spark.sources.delta_dml import delete_delta
    from ._tables import load

    path = os.path.join(_tmp("mvc"), "t")
    nat = load(spark, sf_dir, "nation")
    write_delta(nat.coalesce(1), path)
    write_delta(
        nat.withColumn(
            "n_nationkey", F.col("n_nationkey") + F.lit(100)
        ).coalesce(1),
        path,
        mode="append",
    )
    delete_delta(spark, path, "n_nationkey < 5", mode="dv")
    rows = []
    for v in range(3):
        crc = read_version_checksum(path, v) or {}
        rows.append(
            (
                v,
                verify_checksum(path, version=v)["ok"],
                crc.get("numFiles"),
                crc.get("numDeletionVectorsOpt"),
                crc.get("numDeletedRecordsOpt"),
            )
        )
    return spark.createDataFrame(
        rows,
        "version long, crc_ok boolean, num_files long, num_dvs long, "
        "deleted_records long",
    ).orderBy("version")


# --- scan_text: the line-oriented TEXT source (BEYOND the reference —
# raw-log ingestion is the classic first hop of every event pipeline:
# read lines, parse fields with string expressions, aggregate). The
# fixture exports events as pipe-delimited log lines (values serialized
# through DECIMAL(18,2) so the text round-trip is exact — float
# formatting would drift between engines), then the query reads them
# back with spark.read.text and parses entirely with codegen'd splits.
# Scale: a text scan is splittable and projection is moot (one column);
# the parse is a narrow map into the usual two-phase aggregate.
@_q(
    "scan_text",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    path = _artifact(
        sf_dir, "events-text",
        lambda p: ev.selectExpr(
            "concat(CAST(event_id AS STRING), '|', event_type, '|', "
            "CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS STRING))"
            " AS value"
        ).write.mode("overwrite").text(p),
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        F.split("value", r"\|").alias("f")
    ).select(
        F.col("f").getItem(1).alias("event_type"),
        F.col("f").getItem(2).cast("decimal(18,2)").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("decimal(18,2)").cast("double").alias("total_value"),
    )


# --- S33 sink_delta_scd2_apply: CDC -> SCD2 dimension maintenance — the
# flagship lakehouse integration pattern: a CDF-enabled dimension table
# takes an UPDATE (v1) and a DELETE (v2); the change feed is then folded
# into a Type-2 history (valid_from_version / valid_to_version /
# is_current) exactly as a warehouse dimension loader would persist it.
# Openings = the v0 snapshot plus every update_postimage; every later
# event on the same key (next postimage or delete) closes the previous
# row; deletes close without opening. One lead() window over the
# (key, version) event stream does the folding — the same declarative
# SCD2 core as events_scd2_tiers, here driven by a REAL Delta change
# feed instead of a derived attribute. The oracle replays the fixture's
# literal outcome from the nation table.
@_q(
    "sink_delta_scd2_apply",
    """
    SELECT n_nationkey, n_name,
           0 AS valid_from_version,
           CAST(CASE WHEN n_regionkey = 1 THEN 1
                     WHEN n_nationkey >= 20 THEN 2 END AS INTEGER)
             AS valid_to_version,
           (CASE WHEN n_regionkey = 1 THEN 1
                 WHEN n_nationkey >= 20 THEN 2 END) IS NULL AS is_current
    FROM nation
    UNION ALL
    SELECT n_nationkey, upper(n_name) AS n_name,
           1 AS valid_from_version,
           CAST(CASE WHEN n_nationkey >= 20 THEN 2 END AS INTEGER)
             AS valid_to_version,
           (CASE WHEN n_nationkey >= 20 THEN 2 END) IS NULL AS is_current
    FROM nation WHERE n_regionkey = 1
    """,
)
def sink_delta_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ballista_delta_spark.sources.delta import (
        read_delta,
        read_delta_changes,
    )
    from ballista_delta_spark.sources.delta_dml import delete_delta

    path = _clone(_nation_delta(spark, sf_dir), "s33")
    _enable_cdf_v0(path)
    update_delta(
        spark, path, "n_regionkey = 1", {"n_name": "upper(n_name)"}
    )
    delete_delta(spark, path, "n_nationkey >= 20")

    base = read_delta(spark, path, version=0).select(
        "n_nationkey", "n_name",
        F.lit(0).alias("v"), F.lit(1).alias("is_open"),
    )
    post1 = (
        read_delta_changes(spark, path, 0, 1)
        .filter(F.col("_change_type") == "update_postimage")
        .select(
            "n_nationkey", "n_name",
            F.lit(1).alias("v"), F.lit(1).alias("is_open"),
        )
    )
    del2 = (
        read_delta_changes(spark, path, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(
            "n_nationkey",
            F.lit(None).cast("string").alias("n_name"),
            F.lit(2).alias("v"), F.lit(0).alias("is_open"),
        )
    )
    evs = base.unionAll(post1).unionAll(del2)
    w = Window.partitionBy("n_nationkey").orderBy("v")
    return (
        evs.withColumn("valid_to_version", F.lead("v").over(w).cast("int"))
        .filter(F.col("is_open") == 1)
        .select(
            "n_nationkey",
            "n_name",
            F.col("v").cast("int").alias("valid_from_version"),
            "valid_to_version",
            F.col("valid_to_version").isNull().alias("is_current"),
        )
    )


# --- S35 scan_delta_or_pushdown: TPC-H q19-shaped DISJUNCTIVE stats
# skipping on the Delta scan path (round 12; VERDICT r11 directive #8).
# skip_files prunes a file only when EVERY top-level OR branch is
# provably dead from its min/max stats — the pruning itself is pinned in
# tests/test_data_skipping.py::test_or_pruning_prunes_and_stays_exact
# and the scale-plan pin below; here the oracle checks exactness of the
# pruned scan end-to-end. Delta-rs/delta-spark evaluate the same shape
# via expression trees; this engine's sound-by-construction parser keeps
# files on any branch it can't judge.
@_q(
    "scan_delta_or_pushdown",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE (o_orderkey >= 256 AND o_orderkey < 1024 AND o_totalprice > 120000)
       OR (o_orderkey >= 4096 AND o_orderkey < 4608 AND o_totalprice < 50000)
    """,
)
def scan_delta_or_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _orders_delta_ranged(spark, sf_dir)
    return read_delta(
        spark, path,
        where="(o_orderkey >= 256 AND o_orderkey < 1024 "
              "AND o_totalprice > 120000) "
              "OR (o_orderkey >= 4096 AND o_orderkey < 4608 "
              "AND o_totalprice < 50000)",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def _orders_delta_mixedlog(spark: SparkSession, sf_dir: str) -> str:
    """orders as a Delta table whose log REPLAY mixes all three commit
    layouts: a classic checkpoint (v2), a log-compaction range
    (3.5.compacted.json — with the individual v3-v5 commits removed, so
    the compacted file is REQUIRED, not merely preferred), and a plain
    JSON tail (v6). The 7 commits append disjoint o_orderkey%7 slices,
    so the final content is exactly the orders table."""
    from ..sources.delta import compact_log, create_checkpoint

    def build(p: str) -> None:
        orders = load(spark, sf_dir, "orders")
        for i in range(7):
            write_delta(
                orders.filter(F.col("o_orderkey") % 7 == i), p,
                mode="overwrite" if i == 0 else "append",
            )
            if i == 2:
                create_checkpoint(p)  # classic checkpoint at v2
            if i == 5:
                compact_log(p, 3, 5)
                for v in (3, 4, 5):
                    for ext in ("json", "crc"):
                        f = os.path.join(
                            p, "_delta_log", f"{v:020d}.{ext}"
                        )
                        if os.path.exists(f):
                            os.remove(f)

    return _artifact(sf_dir, "orders-delta-mixedlog", build)


# --- S36 scan_delta_uniform_mixed: snapshot reconstruction over a MIXED
# log layout — classic checkpoint + compacted range + JSON tail in ONE
# replay (round 12; VERDICT r11 directive #8). The compact_log replay
# path had unit tests but no registered id; this pins it end-to-end: the
# individual commits inside the compacted range are GONE, so a replay
# that ignored compaction files would lose 3 of the 7 slices and the
# oracle hash would catch it. At 100 TB this is the layout a busy table
# converges to (checkpoints every N commits, minor compaction between) —
# replay stays O(compactions + tail), never O(commits).
@_q(
    "scan_delta_uniform_mixed",
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def scan_delta_uniform_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _orders_delta_mixedlog(spark, sf_dir)
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )
