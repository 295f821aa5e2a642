"""Per-version checksum sidecars (``_delta_log/N.crc`` — delta-spark's
VersionChecksum): written after every commit, verifiable against a fresh
log replay, reaped with their commit by metadata retention.

Reference parity: the reference delegates table state entirely to
delta-rs (SURVEY.md §2.1); delta-spark writes a .crc per commit and
validates snapshot state against it — this is that surface.
"""

from __future__ import annotations

import json
import os

from ballista_delta_spark.sources.delta import (
    read_version_checksum,
    verify_checksum,
    write_delta,
)


def _crc_path(tbl: str, v: int) -> str:
    return os.path.join(tbl, "_delta_log", f"{v:020d}.crc")


def test_checksum_written_per_commit_and_verifies(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta(spark.range(10).selectExpr("id AS k"), tbl, mode="overwrite")
    write_delta(
        spark.range(10, 15).selectExpr("id AS k"), tbl, mode="append"
    )
    for v in (0, 1):
        assert os.path.exists(_crc_path(tbl, v)), v
    crc = read_version_checksum(tbl, 1)
    # aggregates match the on-disk truth
    files = [
        json.loads(line)["add"]
        for v in (0, 1)
        for line in open(
            os.path.join(tbl, "_delta_log", f"{v:020d}.json")
        )
        if line.strip() and "add" in json.loads(line)
    ]
    assert crc["numFiles"] == len(files)
    assert crc["tableSizeBytes"] == sum(a["size"] for a in files)
    assert crc["numMetadata"] == 1 and crc["numProtocol"] == 1
    assert crc["metadata"].get("schemaString")
    assert crc["protocol"]["minWriterVersion"] >= 1
    rep = verify_checksum(tbl)
    assert rep["ok"] and rep["version"] == 1, rep


def test_checksum_tracks_dv_deletes(spark, tmp_path):
    from ballista_delta_spark.sources.delta_dml import delete_delta

    tbl = str(tmp_path / "dv")
    write_delta(
        spark.range(100).selectExpr("id AS k", "id % 4 AS g"),
        tbl,
        mode="overwrite",
    )
    delete_delta(spark, tbl, "g = 1", mode="dv")
    v = 1
    crc = read_version_checksum(tbl, v)
    assert crc["numDeletedRecordsOpt"] == 25, crc
    assert crc["numDeletionVectorsOpt"] >= 1, crc
    assert verify_checksum(tbl)["ok"]


def test_checksum_detects_tampering_and_absence(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta(spark.range(10).selectExpr("id AS k"), tbl, mode="overwrite")
    fp = _crc_path(tbl, 0)
    crc = json.load(open(fp))
    crc["numFiles"] += 1
    crc["tableSizeBytes"] += 7
    with open(fp, "w") as fh:
        fh.write(json.dumps(crc))
    rep = verify_checksum(tbl)
    assert not rep["ok"]
    assert {m["field"] for m in rep["mismatches"]} == {
        "numFiles", "tableSizeBytes"
    }, rep
    # rewrite repairs it
    from ballista_delta_spark.sources.delta import write_version_checksum

    write_version_checksum(tbl, 0)
    assert verify_checksum(tbl)["ok"]
    os.unlink(fp)
    rep = verify_checksum(tbl)
    assert not rep["ok"]
    assert rep["mismatches"][0]["field"] == "missing"


def test_checksum_carries_in_commit_timestamp(spark, tmp_path):
    tbl = str(tmp_path / "ict")
    from ballista_delta_spark.sources.delta import alter_properties

    write_delta(spark.range(5).selectExpr("id AS k"), tbl, mode="overwrite")
    alter_properties(
        spark, tbl, set_props={"delta.enableInCommitTimestamps": "true"}
    )
    write_delta(spark.range(5, 9).selectExpr("id AS k"), tbl, mode="append")
    with open(os.path.join(tbl, "_delta_log", f"{2:020d}.json")) as fh:
        ict = next(
            json.loads(l)["commitInfo"]["inCommitTimestamp"]
            for l in fh
            if l.strip() and "commitInfo" in json.loads(l)
        )
    assert read_version_checksum(tbl, 2)["inCommitTimestampOpt"] == ict


def test_checksum_reaped_with_its_commit(spark, tmp_path):
    from ballista_delta_spark.sources.delta import (
        cleanup_log,
        create_checkpoint,
    )

    tbl = str(tmp_path / "t")
    write_delta(spark.range(5).selectExpr("id AS k"), tbl, mode="overwrite")
    for i in range(2):
        write_delta(
            spark.range(5 * (i + 1), 5 * (i + 2)).selectExpr("id AS k"),
            tbl,
            mode="append",
        )
    create_checkpoint(tbl)
    gone = cleanup_log(tbl, retention_ms=0)
    for v in (0, 1):
        assert f"{v:020d}.crc" in gone, gone
        assert not os.path.exists(_crc_path(tbl, v))
    # the checkpoint version's crc survives with its json
    assert os.path.exists(_crc_path(tbl, 2))
