"""CTAS (CREATE TABLE ... USING DELTA LOCATION ... AS SELECT) and COPY
INTO — the SQL ingestion surface."""

from __future__ import annotations

import os

import pytest

from ballista_delta_spark.session import sql as bd_sql
from ballista_delta_spark.sources.delta import (
    _load_snapshot,
    copy_into,
    read_delta,
    write_delta,
)


def test_ctas_materializes_query_into_new_table(spark, tmp_path):
    loc = str(tmp_path / "ctas")
    out = bd_sql(spark, f"""
        CREATE TABLE ctas_t USING DELTA PARTITIONED BY (p)
        LOCATION '{loc}'
        AS SELECT id, CAST(id % 3 AS INT) AS p FROM range(30)
    """)
    assert out.collect()[0].registered_table == "ctas_t"
    snap = _load_snapshot(loc)
    assert snap.partition_columns == ["p"]
    assert read_delta(spark, loc).count() == 30
    assert bd_sql(spark, "SELECT count(*) AS n FROM ctas_t").collect()[0].n == 30
    # re-create refuses; IF NOT EXISTS just registers
    with pytest.raises(ValueError, match="already exists"):
        bd_sql(spark, f"""
            CREATE TABLE ctas_t USING DELTA LOCATION '{loc}'
            AS SELECT 1 AS x
        """)
    bd_sql(spark, f"""
        CREATE TABLE IF NOT EXISTS ctas_t USING DELTA LOCATION '{loc}'
        AS SELECT 1 AS x
    """)
    assert read_delta(spark, loc).count() == 30  # untouched
    spark.catalog.dropTempView("ctas_t")


def test_copy_into_is_idempotent_and_atomic(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(0, "seed")], "id int, s string").coalesce(1),
        tbl,
    )
    land = tmp_path / "landing"
    land.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, s string"
    ).coalesce(1).write.mode("overwrite").parquet(str(land / "batch1"))

    m1 = copy_into(spark, tbl, str(land / "batch1"))
    assert m1["numRowsLoaded"] == 2 and m1["numFilesLoaded"] >= 1
    assert read_delta(spark, tbl).count() == 3
    # re-run: nothing new, nothing loaded twice
    m2 = copy_into(spark, tbl, str(land / "batch1"))
    assert m2 == {"numFilesLoaded": 0, "numRowsLoaded": 0}
    assert read_delta(spark, tbl).count() == 3
    # a NEW file in the same tree loads exactly once
    spark.createDataFrame([(3, "c")], "id int, s string").coalesce(1)\
        .write.mode("overwrite").parquet(str(land / "batch2"))
    m3 = copy_into(spark, tbl, str(land))
    assert m3["numRowsLoaded"] == 1
    assert sorted(r.id for r in read_delta(spark, tbl).collect()) == [0, 1, 2, 3]
    # the ledger rides the table's own log: survives checkpoint+cleanup
    from ballista_delta_spark.sources.delta import cleanup_log, create_checkpoint

    create_checkpoint(tbl)
    cleanup_log(tbl, retention_ms=0)
    m4 = copy_into(spark, tbl, str(land))
    assert m4["numFilesLoaded"] == 0
    # force reloads regardless
    m5 = copy_into(spark, tbl, str(land / "batch2"), force=True)
    assert m5["numRowsLoaded"] == 1
    assert read_delta(spark, tbl).count() == 5


def test_copy_into_sql_form_with_csv(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(0, "seed")], "id int, s string").coalesce(1),
        tbl,
    )
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "one.csv").write_text("id|s\n7|x\n8|y\n")
    bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE cpi_t STORED AS DELTA LOCATION '{tbl}'",
    )
    out = bd_sql(spark, f"""
        COPY INTO cpi_t FROM '{csv_dir}' FILEFORMAT = CSV
        FORMAT_OPTIONS ('sep' = '|')
    """).collect()[0]
    assert out.numRowsLoaded == 2
    # idempotent through SQL too
    out2 = bd_sql(spark, f"""
        COPY INTO cpi_t FROM '{csv_dir}' FILEFORMAT = CSV
        FORMAT_OPTIONS ('sep' = '|')
    """).collect()[0]
    assert out2.numFilesLoaded == 0
    got = sorted(r.id for r in bd_sql(spark, "SELECT * FROM cpi_t").collect())
    assert got == [0, 7, 8]
    # malformed data fails loudly (FAILFAST default)
    (csv_dir / "bad.csv").write_text("id|s\nnotanint|x\n")
    with pytest.raises(Exception):
        bd_sql(spark, f"""
            COPY INTO cpi_t FROM '{csv_dir}/bad.csv' FILEFORMAT = CSV
            FORMAT_OPTIONS ('sep' = '|')
        """)
    spark.catalog.dropTempView("cpi_t")


def test_ctas_strips_file_scheme_and_respects_dialect(spark, tmp_path):
    """file:// LOCATIONs hit the same existence check as bare paths (a
    scheme'd re-CTAS must refuse, not silently append), and the CTAS
    body runs through THIS dialect — time travel works inside it."""
    loc = str(tmp_path / "sch")
    bd_sql(spark, f"""
        CREATE TABLE sch_t USING DELTA LOCATION 'file://{loc}'
        AS SELECT id FROM range(5)
    """)
    assert read_delta(spark, loc).count() == 5
    with pytest.raises(ValueError, match="already exists"):
        bd_sql(spark, f"""
            CREATE TABLE sch_t USING DELTA LOCATION 'file://{loc}'
            AS SELECT id FROM range(3)
        """)
    assert read_delta(spark, loc).count() == 5  # nothing appended
    # time-travel body: snapshot v0 of sch_t into a new table
    write_delta(
        spark.createDataFrame([(99,)], "id long"), loc, mode="append"
    )
    loc2 = str(tmp_path / "snap")
    bd_sql(spark, f"""
        CREATE TABLE sch_snap USING DELTA LOCATION '{loc2}'
        AS SELECT * FROM sch_t VERSION AS OF 0
    """)
    assert read_delta(spark, loc2).count() == 5  # pre-append snapshot
    spark.catalog.dropTempView("sch_t")
    spark.catalog.dropTempView("sch_snap")


def test_copy_into_option_value_containing_paren(spark, tmp_path):
    """A ')' inside a quoted FORMAT_OPTIONS value must not break the
    statement parse."""
    tbl = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(0, "seed")], "id int, s string").coalesce(1),
        tbl,
    )
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "one.csv").write_text("id|s\n7|x\n)|skipme\n")
    bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE paren_t STORED AS DELTA LOCATION '{tbl}'",
    )
    out = bd_sql(spark, f"""
        COPY INTO paren_t FROM '{csv_dir}' FILEFORMAT = CSV
        FORMAT_OPTIONS ('sep' = '|', 'comment' = ')')
    """).collect()[0]
    assert out.numRowsLoaded == 1  # the ')' comment line was skipped
    spark.catalog.dropTempView("paren_t")
