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


# ------------------------------------------------------ log compaction
def test_log_compaction_replays_identically_and_survives_cleanup(
    spark, tmp_path
):
    """compact_log writes {s}.{e}.compacted.json with the range's
    reconciled actions; _load_snapshot replays it INSTEAD of the
    individual commits — including after those commits are deleted — and
    the snapshot is action-for-action identical. Versioned loads inside
    the range fall back to per-commit replay."""
    import os

    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        compact_log,
        read_delta,
        write_delta,
    )
    from ballista_delta_spark.sources.delta_dml import delete_delta

    tbl = str(tmp_path / "t")
    write_delta(
        spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1), tbl
    )                                                               # v0
    write_delta(
        spark.range(10, 20).selectExpr("id", "id * 2 AS v").coalesce(1),
        tbl, mode="append",
    )                                                               # v1
    delete_delta(spark, tbl, "id < 5")                              # v2
    write_delta(
        spark.range(20, 25).selectExpr("id", "id * 2 AS v").coalesce(1),
        tbl, mode="append",
    )                                                               # v3
    before = _load_snapshot(tbl)
    out = compact_log(tbl, 0, 3)
    assert os.path.basename(out) == (
        f"{0:020d}.{3:020d}.compacted.json"
    )
    after = _load_snapshot(tbl)
    assert after.version == before.version == 3
    assert after.files == before.files
    assert after.tombstones == before.tombstones
    assert after.configuration == before.configuration
    assert after.schema == before.schema
    assert read_delta(spark, tbl).count() == 20
    # Versioned load INSIDE the range must not use the (overshooting)
    # compacted file.
    assert read_delta(spark, tbl, version=1).count() == 20
    # Delete the individual commits: the compacted file alone still
    # reconstructs the latest snapshot (version=1 history is now gone).
    for v in range(4):
        os.unlink(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    again = _load_snapshot(tbl)
    assert again.version == 3 and again.files == before.files
    assert read_delta(spark, tbl).count() == 20


def test_log_compaction_tail_continues_and_cleanup_is_range_aware(
    spark, tmp_path
):
    import os

    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        cleanup_log,
        compact_log,
        create_checkpoint,
        read_delta,
        write_delta,
    )

    tbl = str(tmp_path / "t")
    for i in range(4):                                   # v0..v3
        write_delta(
            spark.range(i * 5, i * 5 + 5).selectExpr("id").coalesce(1),
            tbl, mode="append" if i else "overwrite",
        )
    compact_log(tbl, 0, 1)
    write_delta(
        spark.range(100, 103).selectExpr("id").coalesce(1), tbl,
        mode="append",
    )                                                    # v4 (tail)
    snap = _load_snapshot(tbl)
    assert snap.version == 4
    assert read_delta(spark, tbl).count() == 23
    # Checkpoint at v2 covers only part of a [0..3] compaction: a
    # range-overshooting compacted file must SURVIVE cleanup.
    compact_log(tbl, 0, 3)
    create_checkpoint(tbl)                               # checkpoint @ v4
    cleanup_log(tbl, retention_ms=0)
    names = os.listdir(os.path.join(tbl, "_delta_log"))
    assert not any(
        n.endswith(".json") and ".compacted." not in n and int(n[:20]) < 4
        for n in names if n[:20].isdigit()
    )
    # compacted [0..1] and [0..3] are both fully under cv=4 -> retired
    assert not any(".compacted." in n for n in names)
    assert read_delta(spark, tbl).count() == 23


def test_compact_log_refuses_missing_commits(spark, tmp_path):
    import pytest as _pytest

    from ballista_delta_spark.sources.delta import compact_log, write_delta

    tbl = str(tmp_path / "t")
    write_delta(spark.range(3).selectExpr("id"), tbl)
    with _pytest.raises(ValueError, match="missing commits"):
        compact_log(tbl, 0, 5)


def test_auto_compact_after_threshold(spark, tmp_path):
    """delta.autoOptimize.autoCompact: once the file count crosses
    minNumFiles, an append is followed by an automatic OPTIMIZE
    (dataChange=false) in the same call; below the threshold appends
    stay cheap."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        alter_properties,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    write_delta(spark.range(3).selectExpr("id").coalesce(1), p)
    alter_properties(spark, p, {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "4",
    })
    for i in range(3):
        write_delta(
            spark.range(10 * (i + 1), 10 * (i + 1) + 3)
            .selectExpr("id").coalesce(1),
            p, mode="append",
        )
    snap = _load_snapshot(p)
    assert len(snap.files) == 1  # the 4th file tripped the compaction
    ops = []
    import json as _json
    import os as _os

    for v in range(snap.version + 1):
        fp = _os.path.join(p, "_delta_log", f"{v:020d}.json")
        with open(fp) as fh:
            for line in fh:
                act = _json.loads(line)
                if "commitInfo" in act:
                    ops.append(act["commitInfo"]["operation"])
    assert "OPTIMIZE" in ops
    assert read_delta(spark, p).count() == 12


def test_liquid_clustering_is_incremental(spark, tmp_path):
    """Plain OPTIMIZE on a clustered table clusters ONLY files no
    clustering rewrite has produced yet (fresh appends); already-
    clustered files are left untouched. OPTIMIZE ... FULL re-clusters
    everything. At 100 TB this is the difference between touching the
    daily delta and re-sorting the table."""
    from ballista_delta_spark.session import sql as bd_sql
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        cluster_by,
        create_checkpoint,
        cleanup_log,
        optimize,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    write_delta(
        spark.range(100).selectExpr("id", "id % 7 AS a").repartition(3), p
    )
    cluster_by(p, ["a"])
    optimize(spark, p)  # first cluster pass: everything rewritten
    snap1 = _load_snapshot(p)
    assert all(
        a.get("clusteringProvider") == "liquid"
        for a in snap1.files.values()
    )
    clustered_files = set(snap1.files)
    # no pending files -> incremental OPTIMIZE is a metadata no-op
    assert optimize(spark, p) == snap1.version
    # fresh append: only IT gets clustered; old files stay put.
    # min_cube_size=0 marks the existing cube SETTLED at this tiny scale
    # (the default 100 GB would merge it with the append — that ZCube
    # merge path is exercised in test_zcube_tracking_selection_rule).
    write_delta(
        spark.range(100, 120).selectExpr("id", "id % 7 AS a").coalesce(1),
        p, mode="append",
    )
    v = optimize(spark, p, min_cube_size=0)
    snap2 = _load_snapshot(p)
    assert clustered_files <= set(snap2.files)  # untouched
    assert all(
        a.get("clusteringProvider") == "liquid"
        for a in snap2.files.values()
    )
    assert read_delta(spark, p).count() == 120
    # FULL re-clusters everything into one pass
    bd_sql(spark, f"CREATE EXTERNAL TABLE liq STORED AS DELTA LOCATION '{p}'")
    bd_sql(spark, "OPTIMIZE liq FULL")
    snap3 = _load_snapshot(p)
    assert not (clustered_files & set(snap3.files))  # all rewritten
    assert read_delta(spark, p).count() == 120
    # the clusteringProvider tag survives a checkpoint + log truncation
    create_checkpoint(p)
    cleanup_log(p, retention_ms=0)
    snap4 = _load_snapshot(p)
    assert all(
        a.get("clusteringProvider") == "liquid"
        for a in snap4.files.values()
    )
    assert optimize(spark, p) == snap4.version  # still a no-op


def test_optimize_write_rebalances_tiny_partitions(spark, tmp_path):
    """delta.autoOptimize.optimizeWrite: an append arriving as 32 tiny
    partitions lands as few right-sized files (AQE rebalance), instead
    of 32 part-files needing compaction after the fact."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        alter_properties,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    write_delta(spark.range(10).selectExpr("id"), p)
    alter_properties(
        spark, p, {"delta.autoOptimize.optimizeWrite": "true"}
    )
    files_before = len(_load_snapshot(p).files)
    write_delta(
        spark.range(10, 1000).selectExpr("id").repartition(32),
        p, mode="append",
    )
    snap = _load_snapshot(p)
    new_files = len(snap.files) - files_before
    assert new_files <= 4, new_files  # 32 tiny partitions coalesced
    assert read_delta(spark, p).count() == 1000


def test_auto_compact_rewrites_only_the_small_file_backlog(spark, tmp_path):
    """Auto-compaction is bounded by the small-file backlog: files at or
    above delta.autoOptimize.maxFileSize are never rewritten, so a small
    append's write amplification is O(backlog), not O(table)."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        alter_properties,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    # One "already compacted" large file (many rows)...
    write_delta(spark.range(5000).selectExpr("id").coalesce(1), p)
    snap0 = _load_snapshot(p)
    (big_rel,) = snap0.files
    big_size = snap0.files[big_rel]["size"]
    # ...and a threshold that classifies it as large and the tiny
    # appends as small.
    alter_properties(spark, p, {
        "delta.autoOptimize.autoCompact": "true",
        "delta.autoOptimize.minNumFiles": "3",
        "delta.autoOptimize.maxFileSize": str(big_size),
    })
    for i in range(3):
        write_delta(
            spark.range(10000 + 3 * i, 10000 + 3 * i + 3)
            .selectExpr("id").coalesce(1),
            p, mode="append",
        )
    snap = _load_snapshot(p)
    # The 3rd small file tripped compaction of the SMALL files only: the
    # big file's original add action survives untouched.
    assert big_rel in snap.files
    assert len(snap.files) == 2  # big + one compacted small
    assert read_delta(spark, p).count() == 5000 + 9


def test_liquid_clustering_hilbert_beats_morton(spark, tmp_path):
    """The liquid-clustering rewrite rides the Hilbert curve (delta-spark's
    choice); explicit ZORDER BY keeps Morton. Hilbert's unit-step locality
    must show up where it matters — tighter per-file min-max
    hyper-rectangles (= more files pruned by stats) at identical cost."""
    import json as _json

    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        cluster_by,
        optimize,
        write_delta,
    )

    def avg_span(path):
        snap = _load_snapshot(path)
        tot = 0.0
        for a in snap.files.values():
            st = _json.loads(a["stats"])
            tot += st["maxValues"]["x"] - st["minValues"]["x"]
            tot += st["maxValues"]["y"] - st["minValues"]["y"]
        return tot / len(snap.files), len(snap.files)

    df = spark.range(40000).selectExpr(
        "CAST(pmod(hash(id), 1000) AS INT) AS x",
        "CAST(pmod(hash(id * 7 + 3), 1000) AS INT) AS y",
        "id AS payload",
    )
    m = str(tmp_path / "morton")
    write_delta(df, m)
    optimize(spark, m, target_file_rows=2500, zorder_by=["x", "y"])
    morton_span, morton_files = avg_span(m)

    h = str(tmp_path / "hilbert")
    write_delta(df, h)
    cluster_by(h, ["x", "y"])
    optimize(spark, h, target_file_rows=2500, full=True)
    hilbert_span, hilbert_files = avg_span(h)

    assert morton_files == hilbert_files  # identical file budget
    # measured locally: 549 vs 721 (24% tighter); pin the direction
    assert hilbert_span < morton_span


def test_auto_checkpoint_on_interval(spark, tmp_path):
    """delta.checkpointInterval (default 10): every Nth commit writes a
    checkpoint automatically, so snapshot loads stay O(interval) replays
    — delta-spark's post-commit checkpointing. 0 disables."""
    import os

    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        alter_properties,
        read_delta,
        write_delta,
    )

    one = spark.createDataFrame([(1, "a")], "id int, s string").coalesce(1)

    p = str(tmp_path / "dflt")
    write_delta(one, p)
    for _ in range(10):
        write_delta(one, p, mode="append")  # v1..v10
    log = os.path.join(p, "_delta_log")
    assert "00000000000000000010.checkpoint.parquet" in os.listdir(log)
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))
    # the checkpointed table still loads and reads exactly
    assert read_delta(spark, p).count() == 11
    assert _load_snapshot(p).version == 10

    p3 = str(tmp_path / "iv3")
    write_delta(one, p3)
    alter_properties(spark, p3, {"delta.checkpointInterval": "3"})  # v1
    for _ in range(5):
        write_delta(one, p3, mode="append")  # v2..v6
    names = os.listdir(os.path.join(p3, "_delta_log"))
    assert "00000000000000000003.checkpoint.parquet" in names
    assert "00000000000000000006.checkpoint.parquet" in names

    p0 = str(tmp_path / "off")
    write_delta(one, p0)
    alter_properties(spark, p0, {"delta.checkpointInterval": "0"})
    for _ in range(10):
        write_delta(one, p0, mode="append")
    assert not any(
        "checkpoint" in n for n in os.listdir(os.path.join(p0, "_delta_log"))
    )


def test_retention_duration_table_properties(spark, tmp_path):
    """VACUUM and log cleanup resolve their windows from the table's
    delta.deletedFileRetentionDuration / delta.logRetentionDuration
    ("interval N unit" syntax) when no explicit retention is passed —
    delta-spark's resolution order. Calendar units refuse."""
    import os

    import pytest as _pytest

    from ballista_delta_spark.sources.delta import (
        _parse_retention_interval,
        alter_properties,
        cleanup_log,
        create_checkpoint,
        vacuum,
        write_delta,
    )

    assert _parse_retention_interval("interval 7 days") == 7 * 86_400_000
    assert _parse_retention_interval("interval 1 week") == 7 * 86_400_000
    assert _parse_retention_interval("48 hours") == 48 * 3_600_000
    with _pytest.raises(ValueError, match="calendar"):
        _parse_retention_interval("interval 1 month")
    with _pytest.raises(ValueError, match="cannot parse"):
        _parse_retention_interval("soon")

    one = spark.createDataFrame([(1, "a")], "id int, s string").coalesce(1)
    p = str(tmp_path / "ret")
    write_delta(one, p)
    write_delta(one, p, mode="overwrite")  # tombstones v0's file
    # default window (7 days): a fresh tombstone survives a bare vacuum()
    assert vacuum(p) == []
    # property window of 0: the same bare vacuum() reaps it
    alter_properties(
        spark, p, {"delta.deletedFileRetentionDuration": "interval 0 seconds"}
    )
    assert len(vacuum(p)) == 1

    # log retention property: 0-second window reaps pre-checkpoint JSON
    alter_properties(
        spark, p, {"delta.logRetentionDuration": "interval 0 seconds"}
    )
    create_checkpoint(p)
    removed = cleanup_log(p)
    assert removed  # default 30-day window would have kept everything
    assert not os.path.exists(
        os.path.join(p, "_delta_log", f"{0:020d}.json")
    )


def test_generate_symlink_manifest(spark, tmp_path):
    """GENERATE symlink_format_manifest: one Hive symlink manifest per
    partition dir listing the ACTIVE files; the table property keeps the
    touched partitions' manifests fresh on every commit; DV tables
    refuse (external readers would resurrect deleted rows)."""
    import os

    import pytest as _pytest

    from ballista_delta_spark.session import sql as bd_sql
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        alter_properties,
        generate_symlink_manifest,
        write_delta,
    )
    from ballista_delta_spark.sources.delta_dml import delete_delta

    def manifest_files(tbl, pdir=""):
        man = os.path.join(tbl, "_symlink_format_manifest", pdir, "manifest")
        if not os.path.exists(man):
            return None
        with open(man) as fh:
            return sorted(
                os.path.relpath(line.strip()[len("file://"):], tbl)
                for line in fh if line.strip()
            )

    # unpartitioned
    p = str(tmp_path / "plain")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        .coalesce(1), p,
    )
    written = generate_symlink_manifest(p)
    assert written == ["_symlink_format_manifest/manifest"]
    assert manifest_files(p) == sorted(_load_snapshot(p).files)

    # partitioned + auto-refresh property: only touched partitions regen
    q = str(tmp_path / "part")
    write_delta(
        spark.createDataFrame(
            [(1, 7), (2, 7), (3, 8)], "id int, k int"
        ).coalesce(1), q, partition_by=["k"],
    )
    # enabling the property runs the FULL generation (existing
    # partitions covered without a manual GENERATE) — delta-spark parity
    assert manifest_files(q, "k=8") is None
    alter_properties(
        spark, q,
        {"delta.compatibility.symlinkFormatManifest.enabled": "true"},
    )
    before_k8 = manifest_files(q, "k=8")
    assert before_k8  # backfilled at enablement
    write_delta(
        spark.createDataFrame([(4, 7)], "id int, k int").coalesce(1), q,
        mode="append",
    )  # touches only k=7
    snap = _load_snapshot(q)
    k7 = sorted(f for f in snap.files if f.startswith("k=7/"))
    assert manifest_files(q, "k=7") == k7      # refreshed with the commit
    assert manifest_files(q, "k=8") == before_k8  # untouched partition kept
    # rewriting DML refreshes too (delete empties no partition here)
    delete_delta(spark, q, "id = 1")
    snap2 = _load_snapshot(q)
    assert manifest_files(q, "k=7") == sorted(
        f for f in snap2.files if f.startswith("k=7/")
    )

    # SQL form
    out = bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE gsm_t STORED AS DELTA LOCATION '{p}'",
    )
    rows = bd_sql(
        spark, "GENERATE symlink_format_manifest FOR TABLE gsm_t"
    ).collect()
    assert [r.manifest for r in rows] == ["_symlink_format_manifest/manifest"]
    spark.catalog.dropTempView("gsm_t")

    # DV refusal
    d = str(tmp_path / "dv")
    write_delta(
        spark.createDataFrame([(i, "x") for i in range(10)],
                              "id int, s string").coalesce(1), d,
    )
    delete_delta(spark, d, "id = 3", mode="dv")
    with _pytest.raises(ValueError, match="deletion vectors"):
        generate_symlink_manifest(d)


def test_zcube_tracking_selection_rule(spark, tmp_path):
    """ZCube tracking (delta-spark OptimizeExecutor parity, VERDICT r9
    'What's missing' #3): each clustering rewrite stamps one ZCUBE_ID on
    its outputs; a second OPTIMIZE leaves SETTLED cubes (matching
    columns, >= min_cube_size) untouched, merges small cubes with new
    data, skips single-cube bins, and re-clusters a cube when the
    clustering key changes."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        cluster_by,
        create_checkpoint,
        cleanup_log,
        optimize,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    write_delta(
        spark.range(200).selectExpr("id", "id % 7 AS a", "id % 5 AS b")
        .repartition(3),
        p,
    )
    cluster_by(p, ["a"])
    optimize(spark, p)
    snap1 = _load_snapshot(p)
    tags1 = {rel: a["tags"] for rel, a in snap1.files.items()}
    assert tags1, "clustered files must carry tags"
    ids1 = {t["ZCUBE_ID"] for t in tags1.values()}
    assert len(ids1) == 1, "one rewrite batch = one ZCube"
    assert all(
        t["ZCUBE_ZORDER_BY"] == '["a"]'
        and t["ZCUBE_ZORDER_CURVE"] == "hilbert"
        for t in tags1.values()
    )

    # SETTLED cube (min_cube_size=1 byte): a new append clusters alone,
    # the settled cube's files are untouched and keep their ZCUBE_ID.
    write_delta(
        spark.range(200, 260).selectExpr(
            "id", "id % 7 AS a", "id % 5 AS b"
        ).coalesce(1),
        p, mode="append",
    )
    optimize(spark, p, min_cube_size=1)
    snap2 = _load_snapshot(p)
    assert set(tags1) <= set(snap2.files), "settled ZCube was rewritten"
    new_files = set(snap2.files) - set(tags1)
    ids2 = {snap2.files[r]["tags"]["ZCUBE_ID"] for r in new_files}
    assert len(ids2) == 1 and not (ids2 & ids1)

    # SMALL cubes (default 100 GB min): two cubes + fresh data all merge
    # into ONE new cube; both old ids disappear.
    write_delta(
        spark.range(260, 300).selectExpr(
            "id", "id % 7 AS a", "id % 5 AS b"
        ).coalesce(1),
        p, mode="append",
    )
    optimize(spark, p)
    snap3 = _load_snapshot(p)
    ids3 = {a["tags"]["ZCUBE_ID"] for a in snap3.files.values()}
    assert len(ids3) == 1 and not (ids3 & (ids1 | ids2))

    # single-cube bin filter: everything is one small cube now, nothing
    # new to merge -> metadata no-op even though the cube is < 100 GB.
    assert optimize(spark, p) == snap3.version

    # key change: the settled-on-'a' cube is NOT settled for 'b' —
    # ZCUBE_ZORDER_BY mismatch makes every file pending again.
    cluster_by(p, ["b"])
    optimize(spark, p, min_cube_size=1)
    snap4 = _load_snapshot(p)
    assert not (set(snap3.files) & set(snap4.files)), "key change must recluster"
    assert all(
        a["tags"]["ZCUBE_ZORDER_BY"] == '["b"]'
        for a in snap4.files.values()
    )

    # tags survive checkpoint + log truncation (else every settled cube
    # would look unclustered after retention).
    create_checkpoint(p)
    cleanup_log(p, retention_ms=0)
    snap5 = _load_snapshot(p)
    assert {a["tags"]["ZCUBE_ID"] for a in snap5.files.values()} == {
        a["tags"]["ZCUBE_ID"] for a in snap4.files.values()
    }
    assert optimize(spark, p, min_cube_size=1) == snap5.version
    assert read_delta(spark, p).count() == 300


def test_autocompact_scope_does_not_break_settled_zcubes(spark, tmp_path):
    """ZCube sizes must be accounted over the WHOLE table, not the
    autoCompact-narrowed candidate set (r10 review fix): a settled cube
    whose individual members sit below the small-file threshold must not
    be ripped apart on every write-triggered compaction."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        cluster_by,
        optimize,
        read_delta,
        write_delta,
    )

    p = str(tmp_path / "t")
    df = spark.range(1020).selectExpr(
        "id", "id % 7 AS a",
        "CAST(CASE WHEN id < 10 THEN 0 WHEN id < 20 THEN 1 ELSE 2 END AS INT) AS p",
    )
    write_delta(df, p, partition_by=["p"])
    cluster_by(p, ["a"])
    optimize(spark, p)  # one ZCube spanning all three partitions
    snap1 = _load_snapshot(p)
    sizes = {rel: a["size"] for rel, a in snap1.files.items()}
    total = sum(sizes.values())
    small_sizes = sorted(sizes.values())
    threshold = small_sizes[-2] + 1  # catches all but the biggest file
    assert small_sizes[-1] >= threshold, "need one file above the threshold"
    cube_ids = {a["tags"]["ZCUBE_ID"] for a in snap1.files.values()}
    assert len(cube_ids) == 1

    # fresh tiny append (unclustered, below the threshold)
    write_delta(
        spark.createDataFrame([(5000, 1, 0)], "id long, a long, p int")
        .coalesce(1),
        p, mode="append",
    )
    pre = _load_snapshot(p)
    new_files = set(pre.files) - set(snap1.files)
    assert len(new_files) == 1

    # autoCompact shape: only_files_below scoping + a settled cube
    # (min_cube_size == the cube's full size). Only the fresh file may
    # be rewritten; every settled-cube member stays byte-identical.
    optimize(spark, p, only_files_below=threshold, min_cube_size=total)
    snap2 = _load_snapshot(p)
    assert set(snap1.files) <= set(snap2.files), (
        "settled ZCube members were rewritten by scoped compaction"
    )
    assert not (new_files & set(snap2.files)), "fresh file must be clustered"
    rewritten = set(snap2.files) - set(snap1.files)
    assert {snap2.files[r]["tags"]["ZCUBE_ID"] for r in rewritten} != cube_ids
    assert read_delta(spark, p).count() == 1021
