"""Column-mapping writes + RENAME/DROP COLUMN schema evolution.

Reference context: the reference has no schema-evolution surface at all
(its ALTER is DataFusion's in-memory catalog, reference src/lib.rs:36);
this mirrors delta-spark's ALTER TABLE RENAME/DROP COLUMN behavior per the
public Delta PROTOCOL.md column-mapping rules: parquet keeps physical
names forever, the log maps logical names, renames/drops are O(1)
metadata commits.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from ballista_delta_spark.sources.delta import (
    DeltaTable,
    _load_snapshot,
    alter_columns,
    alter_properties,
    optimize,
    read_delta,
    read_delta_changes,
    write_delta,
)
from ballista_delta_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id % 3 AS INT) AS p"
    )
    write_delta(df, path, mode="overwrite", partition_by=["p"])
    return path


def test_rename_enables_name_mapping_and_pins_physical(spark, tbl):
    v = alter_columns(tbl, renames={"v": "value"})
    assert v == 1
    snap = _load_snapshot(tbl)
    assert snap.column_mapping_mode == "name"
    # Existing fields keep their CURRENT name as physicalName — that is
    # what the already-committed parquet files spell.
    assert snap.column_mapping == {"k": "k", "value": "v", "p": "p"}
    # columnMapping legacy protocol floor: reader 2 / writer 5.
    assert snap.min_reader_version >= 2
    assert snap.min_writer_version >= 5
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "value", "p"]
    assert out.agg({"value": "sum"}).collect()[0][0] == 90


def test_append_after_rename_writes_physical_names(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})
    df2 = spark.range(10, 15).selectExpr(
        "id AS k", "id * 2 AS value", "CAST(id % 3 AS INT) AS p"
    )
    write_delta(df2, tbl, mode="append")
    out = read_delta(spark, tbl)
    assert out.count() == 15
    assert out.agg({"value": "sum"}).collect()[0][0] == 210
    newest = max(
        glob.glob(os.path.join(tbl, "**", "*.parquet"), recursive=True),
        key=os.path.getmtime,
    )
    # The new file must spell the PHYSICAL name 'v', not 'value'.
    assert "v" in pq.read_schema(newest).names
    assert "value" not in pq.read_schema(newest).names


def test_rename_partition_column(spark, tbl):
    alter_columns(tbl, renames={"p": "bucket"})
    snap = _load_snapshot(tbl)
    assert snap.partition_columns == ["bucket"]
    out = read_delta(spark, tbl)
    assert out.filter("bucket = 1").count() == 3
    # Partition pruning still works through the physical directory name.
    plan = out.filter("bucket = 1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_drop_column_is_metadata_only(spark, tbl):
    files_before = set(
        glob.glob(os.path.join(tbl, "**", "*.parquet"), recursive=True)
    )
    alter_columns(tbl, drops=["v"])
    files_after = set(
        glob.glob(os.path.join(tbl, "**", "*.parquet"), recursive=True)
    )
    assert files_before == files_after  # zero data rewrite
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "p"]


def test_dml_on_mapped_table(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})
    update_delta(spark, tbl, "k = 3", {"value": "999"})
    assert read_delta(spark, tbl).filter("k = 3").collect()[0]["value"] == 999
    delete_delta(spark, tbl, "k >= 8")
    assert read_delta(spark, tbl).count() == 8
    src = spark.range(7, 9).selectExpr(
        "id AS k", "id * 100 AS value", "CAST(id % 3 AS INT) AS p"
    )
    merge_delta(
        spark, tbl, src, on="t.k = s.k",
        matched_update={"value": "s.value"},
        not_matched_insert={"k": "s.k", "value": "s.value", "p": "s.p"},
    )
    got = {
        r["k"]: r["value"]
        for r in read_delta(spark, tbl).filter("k IN (7, 8)").collect()
    }
    assert got == {7: 700, 8: 800}


def test_cdf_reads_logical_names_on_mapped_table(spark, tbl):
    alter_properties(spark, tbl, set_props={"delta.enableChangeDataFeed": "true"})
    alter_columns(tbl, renames={"v": "value"})
    v_before = _load_snapshot(tbl).version
    update_delta(spark, tbl, "k = 1", {"value": "111"})
    ch = read_delta_changes(spark, tbl, from_version=v_before)
    # r14: table_changes column parity — version/timestamp stamps ride
    # along with every change row
    assert set(ch.columns) == {
        "k", "value", "p", "_change_type",
        "_commit_version", "_commit_timestamp",
    }
    types = {
        r["_change_type"]: r["value"]
        for r in ch.filter("k = 1").collect()
    }
    assert types["update_preimage"] == 2
    assert types["update_postimage"] == 111


def test_time_travel_across_rename(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})
    old = read_delta(spark, tbl, version=0)
    assert old.columns == ["k", "v", "p"]
    assert read_delta(spark, tbl).columns == ["k", "value", "p"]


def test_optimize_and_zorder_on_mapped_table(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})
    write_delta(
        spark.range(10, 20).selectExpr(
            "id AS k", "id * 2 AS value", "CAST(id % 3 AS INT) AS p"
        ),
        tbl, mode="append",
    )
    optimize(spark, tbl, target_file_rows=1000, zorder_by=["value"])
    out = read_delta(spark, tbl)
    assert out.count() == 20
    assert out.agg({"value": "sum"}).collect()[0][0] == sum(2 * i for i in range(20))


def test_alter_column_validation(spark, tbl):
    with pytest.raises(ValueError, match="no such column"):
        alter_columns(tbl, renames={"zzz": "a"})
    with pytest.raises(ValueError, match="already exists"):
        alter_columns(tbl, renames={"v": "k"})
    with pytest.raises(ValueError, match="partition column"):
        alter_columns(tbl, drops=["p"])
    with pytest.raises(ValueError, match="rename and drop"):
        alter_columns(tbl, renames={"v": "w"}, drops=["v"])


def test_rename_and_drop_sql_ddl(spark, tbl):
    from ballista_delta_spark.session import sql as bds_sql

    bds_sql(
        spark,
        f"CREATE EXTERNAL TABLE cm_ddl STORED AS DELTA LOCATION '{tbl}'",
    )
    bds_sql(spark, "ALTER TABLE cm_ddl RENAME COLUMN v TO value")
    assert "value" in spark.table("cm_ddl").columns
    bds_sql(spark, "ALTER TABLE cm_ddl DROP COLUMN (value)")
    assert spark.table("cm_ddl").columns == ["k", "p"]
    spark.catalog.dropTempView("cm_ddl")


def test_rename_refused_when_constraint_references_column(spark, tbl):
    """Renaming/dropping a column referenced by a CHECK constraint or a
    generated-column expression would break every later write — refuse."""
    from ballista_delta_spark.sources.delta import alter_constraints

    alter_constraints(spark, tbl, add={"pos_v": "v >= 0"})
    with pytest.raises(ValueError, match="referenced by constraint"):
        alter_columns(tbl, renames={"v": "value"})
    with pytest.raises(ValueError, match="referenced by constraint"):
        alter_columns(tbl, drops=["v"])
    # unrelated columns still rename
    alter_columns(tbl, renames={"k": "key"})
    alter_constraints(spark, tbl, drop=["pos_v"])
    alter_columns(tbl, renames={"v": "value"})  # now fine
