"""CHECK constraints + column invariants are ENFORCED at write time
(round 6) instead of refusing every v2-invariant / v3-constraint table,
and writer v4-v6 tables are writable when their bundled features are
inactive.
"""

from __future__ import annotations

import json
import os

import pytest

from ballista_delta_spark.sources.delta import (
    DeltaTable,
    read_delta,
    write_delta,
)
from ballista_delta_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)


def _patch_log0(tbl, *, configuration=None, protocol=None, field_meta=None):
    log0 = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    with open(log0) as fh:
        acts = [json.loads(line) for line in fh]
    for a in acts:
        if configuration is not None and "metaData" in a:
            a["metaData"]["configuration"] = configuration
        if field_meta is not None and "metaData" in a:
            schema = json.loads(a["metaData"]["schemaString"])
            for f in schema["fields"]:
                if f["name"] in field_meta:
                    f["metadata"] = field_meta[f["name"]]
            a["metaData"]["schemaString"] = json.dumps(schema)
        if protocol is not None and "protocol" in a:
            a["protocol"] = protocol
    with open(log0, "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in acts)


@pytest.fixture()
def ctbl(spark, tmp_path):
    """v3 table with CHECK constraint v >= 0 and invariant id < 1000."""
    tbl = str(tmp_path / "c")
    write_delta(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double"),
        tbl,
    )
    _patch_log0(
        tbl,
        configuration={"delta.constraints.nonneg": "v >= 0"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 3},
        field_meta={"id": {"delta.invariants": json.dumps(
            {"expression": {"expression": "id < 1000"}}
        )}},
    )
    return tbl


def test_append_enforces_check_constraint(spark, ctbl):
    # Satisfying rows commit.
    write_delta(
        spark.createDataFrame([(3, 30.0)], "id int, v double"), ctbl,
        mode="append",
    )
    assert read_delta(spark, ctbl).count() == 3
    # Violating CHECK refuses and commits nothing.
    with pytest.raises(ValueError, match="nonneg"):
        write_delta(
            spark.createDataFrame([(4, -1.0)], "id int, v double"), ctbl,
            mode="append",
        )
    # Violating the column invariant refuses too.
    with pytest.raises(ValueError, match="invariant"):
        write_delta(
            spark.createDataFrame([(5000, 1.0)], "id int, v double"), ctbl,
            mode="append",
        )
    # NULL satisfies (SQL CHECK semantics).
    write_delta(
        spark.createDataFrame([(4, None)], "id int, v double"), ctbl,
        mode="append",
    )
    assert read_delta(spark, ctbl).count() == 4


def test_update_enforces_constraints_on_changed_rows_only(spark, ctbl):
    with pytest.raises(ValueError, match="nonneg"):
        update_delta(spark, ctbl, "id = 1", {"v": "-5.0"})
    m = update_delta(spark, ctbl, "id = 1", {"v": "v + 1"})
    assert m["numUpdatedRows"] == 1
    got = {r.id: r.v for r in read_delta(spark, ctbl).collect()}
    assert got[1] == 11.0


def test_merge_enforces_constraints_on_inserts_and_updates(spark, ctbl):
    bad_src = spark.createDataFrame([(9, -3.0)], "id int, nv double")
    with pytest.raises(ValueError, match="nonneg"):
        merge_delta(
            spark, ctbl, bad_src, "t.id = s.id",
            not_matched_insert={"id": "s.id", "v": "s.nv"},
        )
    with pytest.raises(ValueError, match="nonneg"):
        merge_delta(
            spark, ctbl,
            spark.createDataFrame([(1, -3.0)], "id int, nv double"),
            "t.id = s.id",
            matched_update={"v": "s.nv"}, not_matched_insert=False,
        )
    # Delete never violates.
    m = delete_delta(spark, ctbl, "id = 2")
    assert m["numDeletedRows"] == 1


def test_writer_v4_inactive_features_allow_write(spark, tmp_path):
    tbl = str(tmp_path / "v4")
    write_delta(spark.createDataFrame([(1,)], "id int"), tbl)
    _patch_log0(
        tbl,
        configuration={"delta.enableChangeDataFeed": "false"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
    )
    write_delta(
        spark.createDataFrame([(2,)], "id int"), tbl, mode="append"
    )
    assert read_delta(spark, tbl).count() == 2


def test_writer_v4_active_cdf_overwrite_derivable(spark, tmp_path):
    # CDF-capable operations (append, UPDATE, DELETE — see tests/
    # test_cdf.py) write _change_data; OVERWRITE writes none, but its
    # commit is pure file-level add+remove so CDF readers DERIVE its
    # changes (the spec's derivation rule; delta-spark INSERT OVERWRITE
    # behaves identically) — it must be accepted, and the derived feed
    # must carry the full delete+insert picture.
    from ballista_delta_spark.sources.delta import read_delta_changes

    tbl = str(tmp_path / "v4cdf")
    write_delta(spark.createDataFrame([(1,)], "id int"), tbl)
    _patch_log0(
        tbl,
        configuration={"delta.enableChangeDataFeed": "true"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
    )
    write_delta(spark.createDataFrame([(2,)], "id int"), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 2
    write_delta(
        spark.createDataFrame([(3,)], "id int"), tbl, mode="overwrite"
    )
    assert [r.id for r in read_delta(spark, tbl).collect()] == [3]
    got = sorted(
        (r["_change_type"], r["id"])
        for r in read_delta_changes(spark, tbl, 1, 2).collect()
    )
    assert got == [("delete", 1), ("delete", 2), ("insert", 3)], got


def test_writer_v4_generated_columns_computed_and_validated(spark, tmp_path):
    tbl = str(tmp_path / "v4gen")
    write_delta(spark.createDataFrame([(1, 2)], "id int, twice int"), tbl)
    _patch_log0(
        tbl,
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
        field_meta={"twice": {"delta.generationExpression": "id * 2"}},
    )
    # Omitted generated column -> computed from the expression.
    write_delta(
        spark.createDataFrame([(5,)], "id int"), tbl, mode="append"
    )
    got = {r.id: r.twice for r in read_delta(spark, tbl).collect()}
    assert got[5] == 10
    # Provided and consistent -> accepted.
    write_delta(
        spark.createDataFrame([(6, 12)], "id int, twice int"), tbl,
        mode="append",
    )
    # Provided but WRONG -> refused, nothing committed.
    with pytest.raises(ValueError, match="generated-column"):
        write_delta(
            spark.createDataFrame([(7, 99)], "id int, twice int"), tbl,
            mode="append",
        )
    assert read_delta(spark, tbl).count() == 3
    # Row-level DML refuses (it would commit stale generated values).
    from ballista_delta_spark.sources.delta_dml import delete_delta

    with pytest.raises(ValueError, match="generated columns"):
        delete_delta(spark, tbl, "id = 1")


def test_v7_checkConstraints_feature_enforced_not_refused(spark, tmp_path):
    tbl = str(tmp_path / "v7c")
    write_delta(spark.createDataFrame([(1, 5.0)], "id int, v double"), tbl)
    _patch_log0(
        tbl,
        configuration={"delta.constraints.pos": "v > 0"},
        protocol={
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["checkConstraints"],
        },
    )
    write_delta(
        spark.createDataFrame([(2, 1.0)], "id int, v double"), tbl,
        mode="append",
    )
    with pytest.raises(ValueError, match="pos"):
        write_delta(
            spark.createDataFrame([(3, 0.0)], "id int, v double"), tbl,
            mode="append",
        )
    assert read_delta(spark, tbl).count() == 2


def test_alter_table_add_drop_constraint_sql(spark, tmp_path):
    from ballista_delta_spark.session import sql
    from ballista_delta_spark.sources.delta import alter_constraints

    tbl = str(tmp_path / "alter")
    write_delta(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double"), tbl
    )
    sql(spark, f"CREATE EXTERNAL TABLE alt STORED AS DELTA LOCATION '{tbl}'")
    out = sql(spark, "ALTER TABLE alt ADD CONSTRAINT nonneg CHECK (v >= 0)")
    assert out.collect()[0].committed_version == 1
    snap = DeltaTable(tbl).snapshot
    assert snap.configuration["delta.constraints.nonneg"] == "v >= 0"
    assert snap.min_writer_version == 3
    # Now enforced on writes.
    with pytest.raises(ValueError, match="nonneg"):
        write_delta(
            spark.createDataFrame([(3, -1.0)], "id int, v double"), tbl,
            mode="append",
        )
    # Adding a constraint existing data violates refuses, commits nothing.
    with pytest.raises(ValueError, match="existing row"):
        sql(spark, "ALTER TABLE alt ADD CONSTRAINT big CHECK (v > 100)")
    assert DeltaTable(tbl).version == 1
    # Duplicate name refuses.
    with pytest.raises(ValueError, match="already exists"):
        alter_constraints(spark, tbl, add={"nonneg": "v >= 0"})
    # DROP removes enforcement; unknown name refuses.
    out = sql(spark, "ALTER TABLE alt DROP CONSTRAINT nonneg")
    assert out.collect()[0].committed_version == 2
    write_delta(
        spark.createDataFrame([(3, -1.0)], "id int, v double"), tbl,
        mode="append",
    )
    assert read_delta(spark, tbl).count() == 3
    with pytest.raises(ValueError, match="no such constraint"):
        alter_constraints(spark, tbl, drop=["nope"])
    # Table id survives metadata commits (same table, not a new one).
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")) as fh:
        id0 = next(
            json.loads(ln)["metaData"]["id"] for ln in fh
            if "metaData" in json.loads(ln)
        )
    assert DeltaTable(tbl).snapshot.metadata_raw["id"] == id0


def test_identity_columns_generated_with_high_water_mark(spark, tmp_path):
    tbl = str(tmp_path / "ident")
    write_delta(spark.createDataFrame([(100, "seed")], "uid long, s string"), tbl)
    _patch_log0(
        tbl,
        protocol={"minReaderVersion": 1, "minWriterVersion": 6},
        field_meta={"uid": {
            "delta.identity.start": 100,
            "delta.identity.step": 10,
            "delta.identity.highWaterMark": 100,
        }},
    )
    # Append WITHOUT the identity column: values generated past the mark.
    write_delta(
        spark.createDataFrame([("a",), ("b",), ("c",)], "s string"),
        tbl, mode="append",
    )
    got = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert got == [100, 110, 120, 130]
    # The high-water mark advanced in the same commit...
    from ballista_delta_spark.sources.delta import identity_columns

    snap = DeltaTable(tbl).snapshot
    assert snap.metadata_raw["id"]  # same table id preserved
    assert int(
        identity_columns(snap)["uid"]["delta.identity.highWaterMark"]
    ) == 130
    # ...so the NEXT append continues beyond it.
    write_delta(
        spark.createDataFrame([("d",)], "s string"), tbl, mode="append"
    )
    got = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert got == [100, 110, 120, 130, 140]
    # GENERATED ALWAYS: explicit values refuse.
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame([(999, "x")], "uid long, s string"), tbl,
            mode="append",
        )
    # UPDATE of the identity column refuses; other columns fine.
    with pytest.raises(ValueError, match="identity column"):
        update_delta(spark, tbl, "s = 'a'", {"uid": "1"})
    m = update_delta(spark, tbl, "s = 'a'", {"s": "'A'"})
    assert m["numUpdatedRows"] == 1
    # MERGE INSERT refuses on GENERATED ALWAYS tables.
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_delta(
            spark, tbl,
            spark.createDataFrame([(1, "z")], "uid long, s string"),
            "t.uid = s.uid",
        )


def test_identity_allow_explicit_insert(spark, tmp_path):
    tbl = str(tmp_path / "identx")
    write_delta(spark.createDataFrame([(1, "a")], "uid long, s string"), tbl)
    _patch_log0(
        tbl,
        protocol={"minReaderVersion": 1, "minWriterVersion": 6},
        field_meta={"uid": {
            "delta.identity.start": 1,
            "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": True,
        }},
    )
    write_delta(
        spark.createDataFrame([(50, "b")], "uid long, s string"), tbl,
        mode="append",
    )
    assert sorted(r.uid for r in read_delta(spark, tbl).collect()) == [1, 50]


def test_alter_table_set_unset_tblproperties(spark, tmp_path):
    from ballista_delta_spark.session import sql
    from ballista_delta_spark.sources.delta import write_delta as _wd

    tbl = str(tmp_path / "props")
    _wd(spark.createDataFrame([(1, 1.0)], "id int, v double"), tbl)
    sql(spark, f"CREATE EXTERNAL TABLE props STORED AS DELTA LOCATION '{tbl}'")
    out = sql(spark, "ALTER TABLE props SET TBLPROPERTIES ("
                     "'delta.enableChangeDataFeed' = 'true', "
                     "'delta.enableInCommitTimestamps' = 'true')")
    assert out.collect()[0].committed_version == 1
    snap = DeltaTable(tbl).snapshot
    assert snap.configuration["delta.enableChangeDataFeed"] == "true"
    # CDF property pulled the writer protocol to v4.
    assert snap.min_writer_version >= 4
    # The flipped behaviors are live: UPDATE emits _change_data and the
    # commit carries a monotonic inCommitTimestamp.
    update_delta(spark, tbl, "id = 1", {"v": "2.0"})
    import glob as _glob

    assert _glob.glob(os.path.join(tbl, "_change_data", "cdc-*.parquet"))
    with open(os.path.join(tbl, "_delta_log", f"{2:020d}.json")) as fh:
        ci = next(
            json.loads(ln)["commitInfo"] for ln in fh
            if "commitInfo" in json.loads(ln)
        )
    assert "inCommitTimestamp" in ci
    # UNSET turns CDF back off; appendOnly via property is enforced.
    sql(spark, "ALTER TABLE props UNSET TBLPROPERTIES "
               "('delta.enableChangeDataFeed')")
    sql(spark, "ALTER TABLE props SET TBLPROPERTIES "
               "('delta.appendOnly' = 'true')")
    with pytest.raises(ValueError, match="append-only"):
        delete_delta(spark, tbl, "id = 1")
    # Constraint namespace is fenced off.
    with pytest.raises(ValueError, match="ADD/DROP CONSTRAINT"):
        sql(spark, "ALTER TABLE props SET TBLPROPERTIES "
                   "('delta.constraints.x' = 'v > 0')")
