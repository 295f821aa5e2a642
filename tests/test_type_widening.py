"""typeWidening table feature: metadata-only ALTER COLUMN TYPE; narrow
parquet files read under the widened logical schema (Spark 4's parquet
widening conversions), delta.typeChanges audit trail, protocol upgrade."""

from __future__ import annotations

import json
import os

import pytest

from ballista_delta_spark.sources.delta import (
    _load_snapshot,
    alter_column_type,
    create_checkpoint,
    read_delta,
    write_delta,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, 1.5, "a"), (2, 2.5, "b")],
                              "id int, f float, s string"),
        p,
    )
    return p


def test_widen_int_to_long_is_metadata_only(spark, tbl):
    files_before = set(_load_snapshot(tbl).files)
    v = alter_column_type(tbl, "id", "bigint")
    snap = _load_snapshot(tbl)
    assert set(snap.files) == files_before  # no data files touched
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    assert "typeWidening" in snap.writer_features
    assert "typeWidening" in snap.reader_features
    changes = snap.schema["id"].metadata["delta.typeChanges"]
    assert changes == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]
    # Old (int32) files read back as longs; values intact.
    got = sorted((r.id, r.f, r.s) for r in read_delta(spark, tbl).collect())
    assert got == [(1, 1.5, "a"), (2, 2.5, "b")]
    assert read_delta(spark, tbl).schema["id"].dataType.simpleString() == (
        "bigint"
    )


def test_widened_table_mixes_old_and_new_files(spark, tbl):
    alter_column_type(tbl, "id", "bigint")
    alter_column_type(tbl, "f", "double")
    # New append writes the WIDE types; old narrow files coexist.
    write_delta(
        spark.createDataFrame([(3_000_000_000, 3.5, "c")],
                              "id long, f double, s string"),
        tbl, mode="append",
    )
    got = sorted((r.id, r.f, r.s) for r in read_delta(spark, tbl).collect())
    assert got == [(1, 1.5, "a"), (2, 2.5, "b"), (3_000_000_000, 3.5, "c")]


def test_widen_chains_accumulate_type_changes(spark, tbl):
    v1 = alter_column_type(tbl, "id", "bigint")
    v2 = alter_column_type(tbl, "id", "decimal(25, 2)")
    snap = _load_snapshot(tbl)
    assert snap.schema["id"].dataType.simpleString() == "decimal(25,2)"
    changes = snap.schema["id"].metadata["delta.typeChanges"]
    assert [c["tableVersion"] for c in changes] == [v1, v2]
    assert changes[1] == {
        "fromType": "long", "toType": "decimal(25,2)", "tableVersion": v2,
    }
    got = sorted(float(r.id) for r in read_delta(spark, tbl).collect())
    assert got == [1.0, 2.0]


def test_narrowing_and_lossy_changes_refused(spark, tbl):
    alter_column_type(tbl, "id", "bigint")
    for bad_col, bad_type in [
        ("id", "int"),            # narrowing
        ("f", "decimal(10,2)"),   # float -> decimal not lossless
        ("s", "int"),             # nonsense
        ("id", "double"),         # long -> double loses precision
    ]:
        with pytest.raises(ValueError, match="not a lossless widening"):
            alter_column_type(tbl, bad_col, bad_type)
    with pytest.raises(ValueError, match="already has type"):
        alter_column_type(tbl, "id", "bigint")
    with pytest.raises(ValueError, match="no such column"):
        alter_column_type(tbl, "zz", "bigint")


def test_widen_partition_column_refused(spark, tmp_path):
    p = str(tmp_path / "tp")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "id int, k int"),
        p, partition_by=["k"],
    )
    with pytest.raises(ValueError, match="partition column"):
        alter_column_type(p, "k", "bigint")


def test_widen_date_to_timestamp_ntz_adds_ntz_feature(spark, tmp_path):
    import datetime

    p = str(tmp_path / "td")
    write_delta(
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 2))], "id int, d date"
        ),
        p,
    )
    alter_column_type(p, "d", "timestamp_ntz")
    snap = _load_snapshot(p)
    assert "timestampNtz" in snap.reader_features
    assert "typeWidening" in snap.reader_features
    row = read_delta(spark, p).collect()[0]
    assert row.d == datetime.datetime(2024, 1, 2, 0, 0)


def test_widening_survives_checkpoint_and_sql_route(spark, tmp_path):
    from ballista_delta_spark.session import sql as bd_sql

    p = str(tmp_path / "ts")
    write_delta(
        spark.createDataFrame([(7, "x")], "id int, s string"), p
    )
    bd_sql(spark, f"CREATE EXTERNAL TABLE tw STORED AS DELTA LOCATION '{p}'")
    v = bd_sql(
        spark, "ALTER TABLE tw ALTER COLUMN id TYPE BIGINT"
    ).collect()[0][0]
    assert v == 1
    create_checkpoint(p)
    snap = _load_snapshot(p)
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    assert snap.schema["id"].metadata["delta.typeChanges"][0]["toType"] == (
        "long"
    )
    assert spark.table("tw").schema["id"].dataType.simpleString() == "bigint"


def test_widened_column_still_prunes_with_stats(spark, tmp_path):
    """Data skipping must keep working over stats recorded under the
    NARROW type (JSON numbers parse under the wide one)."""
    from ballista_delta_spark.sources.delta import skip_files

    p = str(tmp_path / "tk")
    write_delta(spark.range(10).selectExpr("CAST(id AS INT) AS id").coalesce(1), p)
    write_delta(
        spark.range(100, 110).selectExpr("CAST(id AS INT) AS id").coalesce(1),
        p, mode="append",
    )
    alter_column_type(p, "id", "bigint")
    snap = _load_snapshot(p)
    kept = skip_files(snap, "id >= 100")
    assert len(kept) == 1  # the first file is pruned on stats


_MATRIX = [
    # (write type, value sql, widen chain)
    ("tinyint", "CAST(-7 AS TINYINT)", ["smallint", "int", "bigint"]),
    ("smallint", "CAST(999 AS SMALLINT)", ["int", "decimal(12,2)"]),
    ("int", "CAST(-123456 AS INT)", ["double"]),
    ("float", "CAST(1.5 AS FLOAT)", ["double"]),
    ("decimal(5,2)", "CAST(123.45 AS DECIMAL(5,2))",
     ["decimal(10,2)", "decimal(12,4)"]),
    ("bigint", "CAST(5000000000 AS BIGINT)", ["decimal(22,2)"]),
]


def test_widening_matrix_preserves_values_through_chains(spark, tmp_path):
    """Every allowed widening (and chains of them) must read the
    originally-written narrow value back exactly."""
    for i, (wt, val_sql, chain) in enumerate(_MATRIX):
        p = str(tmp_path / f"m{i}")
        write_delta(
            spark.sql(f"SELECT 1 AS id, {val_sql} AS x"), p
        )
        base = spark.sql(f"SELECT {val_sql} AS x").collect()[0].x
        for to in chain:
            alter_column_type(p, "x", to)
            got = read_delta(spark, p).collect()[0].x
            assert float(got) == float(base), (wt, to, got, base)
        # append a wide-typed row after the chain: both files coexist
        final = _load_snapshot(p).schema["x"].dataType.simpleString()
        write_delta(
            spark.sql(
                f"SELECT 2 AS id, CAST({val_sql} AS {final}) AS x"
            ),
            p, mode="append",
        )
        assert read_delta(spark, p).count() == 2


def test_widen_refuses_cleanly_on_concurrent_commit(spark, tbl):
    """The typeChanges entry embeds its commit version; a table that
    advanced concurrently must produce a clean ConcurrentWriteException,
    never a commit with a wrong embedded tableVersion."""
    from unittest import mock

    from ballista_delta_spark.sources import delta as d

    real_load = d._load_snapshot
    state = {"armed": True}

    def stale_load(path, version=None):
        if not state["armed"]:
            return real_load(path, version)
        state["armed"] = False  # inject exactly once (write_delta below
        # re-enters the patched loader for its own snapshot reads)
        snap = real_load(path, version)
        # simulate: another writer commits AFTER our snapshot load
        write_delta(
            spark.createDataFrame([(99, 9.9, "z")],
                                  "id int, f float, s string"),
            tbl, mode="append",
        )
        return snap

    with mock.patch.object(d, "_load_snapshot", side_effect=stale_load):
        with pytest.raises(d.ConcurrentWriteException, match="advanced"):
            alter_column_type(tbl, "id", "bigint")
    # nothing half-committed: schema unchanged, a plain retry succeeds
    assert _load_snapshot(tbl).schema["id"].dataType.simpleString() == "int"
    alter_column_type(tbl, "id", "bigint")
    snap = _load_snapshot(tbl)
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    ch = snap.schema["id"].metadata["delta.typeChanges"][0]
    assert ch["tableVersion"] == snap.version
