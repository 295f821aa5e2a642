"""End-to-end lakehouse lifecycle: every round-7 Delta feature chained on
ONE table, in the order a real operator would run them. Each step checks
its own invariant AND that the running row-set stays exactly right — the
integration risk these features carry is interaction, not isolation.

convert → cluster → optimize → enable CDF+rowTracking → DV DELETE →
streaming CDF read → REORG PURGE → schema evolution (add/default/merge)
→ idempotent txn append → checkpoint(v2) + log truncation → DROP FEATURE
→ FSCK dry run → final full-table scan.
"""

from __future__ import annotations

import json
import os

import pytest

from ballista_delta_spark.sources.delta import (
    _load_snapshot,
    alter_column_default,
    alter_columns,
    alter_properties,
    cleanup_log,
    cluster_by,
    clustering_columns,
    convert_to_delta,
    create_checkpoint,
    drop_feature,
    fsck_repair,
    optimize,
    read_delta,
    read_delta_with_row_ids,
    reorg_purge,
    write_delta,
)
from ballista_delta_spark.sources.delta_dml import delete_delta


def test_full_lifecycle(spark, tmp_path):
    tbl = str(tmp_path / "life")

    # 1. start from a plain parquet directory — CONVERT in place
    spark.range(500).selectExpr(
        "id", "id % 37 AS a", "CAST(id % 5 AS INT) AS p"
    ).repartition(4).write.partitionBy("p").parquet(tbl)
    assert convert_to_delta(spark, tbl) == 0
    assert read_delta(spark, tbl).count() == 500

    # 2. declare liquid clustering, compact: plain OPTIMIZE clusters on a
    cluster_by(tbl, ["a"])
    optimize(spark, tbl, target_file_rows=100)
    snap = _load_snapshot(tbl)
    assert clustering_columns(snap) == ["a"]
    assert read_delta(spark, tbl).count() == 500

    # 3. turn on CDF + row tracking (backfills row ids)
    alter_properties(spark, tbl, {
        "delta.enableChangeDataFeed": "true",
        "delta.enableRowTracking": "true",
    })
    with_ids = read_delta_with_row_ids(spark, tbl)
    assert with_ids.select("row_id").distinct().count() == 500

    # 4. merge-on-read DELETE (writes a deletion vector + CDF rows)
    m = delete_delta(spark, tbl, "id % 10 = 0", mode="dv")
    assert m["numDeletedRows"] == 50
    assert read_delta(spark, tbl).count() == 450

    # 5. the change feed STREAMS the delete
    from ballista_delta_spark.sources.delta_stream import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    dv_version = _load_snapshot(tbl).version
    cdf = (
        spark.readStream.format("delta_stream")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(dv_version))
        .load()
    )
    q = (
        cdf.writeStream.format("memory").queryName("life_cdf")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    changes = spark.table("life_cdf")
    assert changes.filter("_change_type = 'delete'").count() == 50

    # 6. REORG purges the DVs; row identity stays unique
    r = reorg_purge(spark, tbl)
    assert r["numFilesRewritten"] >= 1
    snap = _load_snapshot(tbl)
    assert not any(a.get("deletionVector") for a in snap.files.values())
    assert read_delta_with_row_ids(spark, tbl).select(
        "row_id"
    ).distinct().count() == 450

    # 7. schema evolution: ADD COLUMN, give it a default, mergeSchema
    alter_columns(tbl, adds={"note": "string"})
    alter_column_default(tbl, "note", "'legacy'")
    write_delta(
        spark.createDataFrame([(9001, 1, 1)], "id long, a long, p int"),
        tbl, mode="append",
    )  # omits note -> default fills
    got = read_delta(spark, tbl)
    assert got.filter("note = 'legacy'").count() == 1
    write_delta(
        spark.createDataFrame(
            [(9002, 2, 2, "x", 1.5)],
            "id long, a long, p int, note string, score double",
        ),
        tbl, mode="append", merge_schema=True,
    )
    assert "score" in read_delta(spark, tbl).columns

    # 8. idempotent append: a replayed (app, version) commits nothing
    df = spark.createDataFrame(
        [(9003, 3, 3)], "id long, a long, p int"
    )
    v1 = write_delta(
        df, tbl, mode="append", merge_schema=True,
        txn_app="life", txn_version=1,
    )  # merge_schema null-fills the score column widened in step 7
    assert write_delta(
        df, tbl, mode="append", merge_schema=True,
        txn_app="life", txn_version=1,
    ) == v1
    assert read_delta(spark, tbl).count() == 453

    # 9. v2 checkpoint + log truncation: everything survives replay
    alter_properties(spark, tbl, {"delta.checkpointPolicy": "v2"})
    create_checkpoint(tbl)
    cleanup_log(tbl, retention_ms=0)
    snap = _load_snapshot(tbl)
    assert snap.app_transactions == {"life": 1}
    assert clustering_columns(snap) == ["a"]
    assert json.loads(
        snap.domain_metadata["delta.rowTracking"]
    )["rowIdHighWaterMark"] >= 452
    assert read_delta(spark, tbl).count() == 453

    # 10. retire the DV feature for downgraded engines (no DVs remain;
    # CDF must be unset first per its own trace rule)
    alter_properties(
        spark, tbl, unset_keys=["delta.enableChangeDataFeed"]
    )
    drop_feature(tbl, "changeDataFeed", truncate_history=True)
    drop_feature(tbl, "deletionVectors", truncate_history=True)
    snap = _load_snapshot(tbl)
    assert "deletionVectors" not in snap.writer_features
    assert "deletionVectors" not in snap.reader_features

    # 11. FSCK finds nothing to repair; the table is intact end to end
    assert fsck_repair(tbl, dry_run=True)["numMissingFiles"] == 0
    final = read_delta(spark, tbl)
    assert final.count() == 453
    assert final.filter("id % 10 = 0 AND id < 500").count() == 0
    spark.catalog.dropTempView("life_cdf")
