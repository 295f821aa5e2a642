"""Change data feed WRITES (round 6): tables with
delta.enableChangeDataFeed=true accept appends, UPDATE and DELETE — the
data-changing DML emits _change_data files with cdc actions, and
read_delta_changes consumes them (update_preimage/update_postimage instead
of the file-diff's delete+insert pair). Operations that would starve CDF
readers (overwrite, MERGE) refuse loudly.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from ballista_delta_spark.sources.delta import (
    DeltaTable,
    read_delta,
    read_delta_changes,
    write_delta,
)
from ballista_delta_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)


def _enable_cdf(tbl: str) -> None:
    log0 = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    with open(log0) as fh:
        acts = [json.loads(ln) for ln in fh]
    for a in acts:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"
            }
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 4}
    with open(log0, "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in acts)


@pytest.fixture()
def cdf_tbl(spark, tmp_path):
    tbl = str(tmp_path / "cdf")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id int, v double"
        ).coalesce(1),
        tbl,
    )
    _enable_cdf(tbl)
    return tbl


def test_append_allowed_no_cdc_files(spark, cdf_tbl):
    write_delta(
        spark.createDataFrame([(100, 1.0)], "id int, v double"), cdf_tbl,
        mode="append",
    )
    assert read_delta(spark, cdf_tbl).count() == 11
    assert not os.path.isdir(os.path.join(cdf_tbl, "_change_data"))
    # Derivable insert commit: CDF readers still see the rows.
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    assert [(r.id, r._change_type) for r in ch.collect()] == [(100, "insert")]


def test_update_emits_pre_and_postimage(spark, cdf_tbl):
    m = update_delta(spark, cdf_tbl, "id >= 8", {"v": "v * 100"})
    assert m["numUpdatedRows"] == 2
    # cdc files exist and are referenced by cdc actions.
    assert glob.glob(os.path.join(cdf_tbl, "_change_data", "cdc-*.parquet"))
    with open(os.path.join(cdf_tbl, "_delta_log", f"{1:020d}.json")) as fh:
        kinds = [next(iter(json.loads(ln))) for ln in fh if ln.strip()]
    assert "cdc" in kinds
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    got = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (8, 8.0, "update_preimage"), (8, 800.0, "update_postimage"),
        (9, 9.0, "update_preimage"), (9, 900.0, "update_postimage"),
    ]
    # The table itself reads post-update.
    assert read_delta(spark, cdf_tbl).filter("v >= 100").count() == 2


def test_delete_emits_delete_rows(spark, cdf_tbl):
    delete_delta(spark, cdf_tbl, "id < 3")
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    got = sorted((r.id, r._change_type) for r in ch.collect())
    assert got == [(0, "delete"), (1, "delete"), (2, "delete")]


def test_dv_delete_emits_delete_rows(spark, cdf_tbl):
    delete_delta(spark, cdf_tbl, "id IN (4, 6)", mode="dv")
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    got = sorted((r.id, r._change_type) for r in ch.collect())
    assert got == [(4, "delete"), (6, "delete")]
    assert read_delta(spark, cdf_tbl).count() == 8


def test_mixed_range_cdc_plus_derivable_commits(spark, cdf_tbl):
    write_delta(
        spark.createDataFrame([(50, 5.5)], "id int, v double"), cdf_tbl,
        mode="append",
    )  # v1: derivable insert
    update_delta(spark, cdf_tbl, "id = 50", {"v": "9.9"})  # v2: cdc
    ch = read_delta_changes(spark, cdf_tbl, 0, 2)
    got = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (50, 5.5, "insert"),
        (50, 5.5, "update_preimage"),
        (50, 9.9, "update_postimage"),
    ]


def test_overwrite_on_cdf_serves_derived_changes(spark, cdf_tbl):
    # OVERWRITE writes no _change_data, but its commit is pure file-level
    # add+remove so the spec's derivation rule serves it: every prior row
    # reads back as a delete, every new row as an insert (delta-spark's
    # INSERT OVERWRITE on a CDF table behaves identically).
    # -5.0 matches no pre-image: a rewritten row whose content is
    # IDENTICAL would cancel in the content diff (by design — the diff
    # reports true row-level change, not file motion)
    df = spark.createDataFrame([(1, -5.0)], "id int, v double")
    write_delta(df, cdf_tbl, mode="overwrite")
    changes = read_delta_changes(spark, cdf_tbl, 0, 1).collect()
    kinds = sorted((r["_change_type"], r["id"]) for r in changes)
    assert kinds == [("delete", i) for i in range(10)] + [("insert", 1)]


def test_merge_emits_full_change_set(spark, cdf_tbl):
    src = spark.createDataFrame(
        [(1, 111.0), (2, -1.0), (77, 7.7)], "id int, nv double"
    )
    m = merge_delta(
        spark, cdf_tbl, src, "t.id = s.id",
        matched_clauses=[
            ("s.nv < 0", "delete", None),
            (None, "update", {"v": "s.nv"}),
        ],
        not_matched_clauses=[(None, {"id": "s.id", "v": "s.nv"})],
    )
    assert m["numTargetRowsUpdated"] == 1
    assert m["numTargetRowsDeleted"] == 1
    assert m["numTargetRowsInserted"] == 1
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    got = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (1, 1.0, "update_preimage"),
        (1, 111.0, "update_postimage"),
        (2, 2.0, "delete"),
        (77, 7.7, "insert"),
    ]
    # Table state agrees with the feed.
    rows = {r.id: r.v for r in read_delta(spark, cdf_tbl).collect()}
    assert rows[1] == 111.0 and 2 not in rows and rows[77] == 7.7


def test_insert_only_merge_on_cdf_stays_derivable(spark, cdf_tbl):
    src = spark.createDataFrame([(200, 2.0)], "id int, v double")
    merge_delta(spark, cdf_tbl, src, "t.id = s.id")
    # No cdc actions (pure insert), but the feed still reports the row.
    with open(os.path.join(cdf_tbl, "_delta_log", f"{1:020d}.json")) as fh:
        kinds = [next(iter(json.loads(ln))) for ln in fh if ln.strip()]
    assert "cdc" not in kinds
    ch = read_delta_changes(spark, cdf_tbl, 0, 1)
    assert [(r.id, r._change_type) for r in ch.collect()] == [(200, "insert")]


def test_dv_change_visible_without_cdf(spark, tmp_path):
    """Non-CDF table: a DV delete changes file CONTENT under the same path;
    the file-diff CDC must still surface the deleted rows."""
    tbl = str(tmp_path / "nocdf")
    write_delta(
        spark.createDataFrame([(i,) for i in range(10)], "id int").coalesce(1),
        tbl,
    )
    delete_delta(spark, tbl, "id = 7", mode="dv")
    ch = read_delta_changes(spark, tbl, 0, 1)
    assert [(r.id, r._change_type) for r in ch.collect()] == [(7, "delete")]
