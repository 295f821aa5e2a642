"""Star-schema table loading for the declared queries (TESTDATA.md).

Loads are plain parquet scans — Catalyst pushes filters/projections into them.
``register_views`` mirrors the reference's catalog registration step
(reference README.md:51-57) so SQL-form queries see the same table names the
DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver supplies its own SparkSession; timestamp collection goes
    # through the session timezone, so pin UTC here (runtime conf, cheap)
    # or every timestamp-bearing query would drift vs the UTC-naive oracle
    # on a non-UTC host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader rejects
    (TimestampType is µs). Read nanos as long and truncate to µs — the same
    ns→µs truncation DuckDB applies when casting its TIMESTAMP_NS, so the
    oracle comparison sees identical values (FIXTURES.md flags this edge)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # Integer division: a float path here loses ±1µs at 1e18-ns magnitudes.
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
