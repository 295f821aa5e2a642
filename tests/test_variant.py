"""variantType table feature: Delta tables with VARIANT columns —
schema-implied protocol, Spark-side numRecords stats fallback, append /
time-travel / checkpoint survival, feature drop guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ballista_delta_spark.sources.delta import (
    _load_snapshot,
    create_checkpoint,
    drop_feature,
    read_delta,
    write_delta,
)


def _vdf(spark, lo: int, hi: int):
    return spark.sql(
        f"""SELECT id, parse_json(concat('{{"a": ', id, ', "tags": ["t', id,
        '"]}}')) AS v FROM range({lo}, {hi})"""
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    p = str(tmp_path / "vt")
    write_delta(_vdf(spark, 0, 5), p)
    return p


def test_new_variant_table_declares_feature_pair(spark, tbl):
    snap = _load_snapshot(tbl)
    assert snap.min_reader_version == 3 and snap.min_writer_version == 7
    assert "variantType" in snap.reader_features
    assert "variantType" in snap.writer_features
    # Legacy (1,2)-implied features enumerated on the upgrade.
    assert {"appendOnly", "invariants"} <= set(snap.writer_features)
    assert snap.schema["v"].dataType.typeName() == "variant"


def test_variant_roundtrip_and_stats_fallback(spark, tbl):
    got = sorted(
        (r.id, r.a, r.t0)
        for r in read_delta(spark, tbl).select(
            "id",
            F.try_variant_get("v", "$.a", "bigint").alias("a"),
            F.try_variant_get("v", "$.tags[0]", "string").alias("t0"),
        ).collect()
    )
    assert got == [(i, i, f"t{i}") for i in range(5)]
    snap = _load_snapshot(tbl)
    # pyarrow can't open variant parquet; stats come from the Spark-side
    # aggregation — numRecords sums to the row count AND the scalar
    # sibling column keeps min/max, so data skipping survives a variant
    # payload column.
    sts = [json.loads(a["stats"]) for a in snap.files.values()]
    assert sum(s["numRecords"] for s in sts) == 5
    nonempty = [s for s in sts if s["numRecords"]]
    assert all("id" in s["minValues"] for s in nonempty)
    assert min(s["minValues"]["id"] for s in nonempty) == 0
    assert max(s["maxValues"]["id"] for s in nonempty) == 4
    assert all("v" not in s["minValues"] for s in nonempty)


def test_variant_table_scalar_columns_still_skip(spark, tmp_path):
    from ballista_delta_spark.sources.delta import skip_files

    p = str(tmp_path / "vskip")
    write_delta(_vdf(spark, 0, 10).coalesce(1), p)
    write_delta(_vdf(spark, 100, 110).coalesce(1), p, mode="append")
    snap = _load_snapshot(p)
    kept = skip_files(snap, "id >= 100")
    assert len(kept) == 1


def test_variant_append_and_time_travel(spark, tbl):
    write_delta(_vdf(spark, 5, 8), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 8
    assert read_delta(spark, tbl, version=0).count() == 5
    create_checkpoint(tbl)
    snap = _load_snapshot(tbl)
    assert "variantType" in snap.reader_features  # survives checkpoint


def test_merge_schema_evolves_in_variant_with_upgrade(spark, tmp_path):
    p = str(tmp_path / "plain")
    write_delta(spark.range(3).selectExpr("id"), p)
    assert _load_snapshot(p).min_reader_version == 1
    evolved = spark.sql(
        """SELECT id, parse_json('{"x": 1}') AS v FROM range(3, 5)"""
    )
    write_delta(evolved, p, mode="append", merge_schema=True)
    snap = _load_snapshot(p)
    assert "variantType" in snap.reader_features
    assert snap.schema["v"].dataType.typeName() == "variant"
    rows = read_delta(spark, p).select(
        "id", F.try_variant_get("v", "$.x", "int").alias("x")
    ).collect()
    assert sorted((r.id, r.x) for r in rows) == [
        (0, None), (1, None), (2, None), (3, 1), (4, 1),
    ]


def test_drop_variant_feature_refused_while_column_exists(spark, tbl):
    with pytest.raises(ValueError, match="VARIANT column"):
        drop_feature(tbl, "variantType", truncate_history=True)


def test_nested_variant_gates_too(spark, tmp_path):
    p = str(tmp_path / "nested")
    write_delta(
        spark.sql(
            """SELECT id, array(parse_json('{"q": 2}')) AS arr
               FROM range(2)"""
        ),
        p,
    )
    snap = _load_snapshot(p)
    assert "variantType" in snap.reader_features
    rows = read_delta(spark, p).select(
        F.try_variant_get(F.col("arr")[0], "$.q", "int").alias("q")
    ).collect()
    assert [r.q for r in rows] == [2, 2]


def test_variant_stats_survive_path_with_spaces_and_unicode(spark, tmp_path):
    """The Spark-side stats map is keyed by _metadata.file_path, a
    percent-encoded URI; the writer looks files up by filesystem path.
    A table path with a space/unicode char must still resolve real
    numRecords (rowTracking sizes baseRowId ranges off it) instead of
    silently zeroing every file's stats."""
    p = str(tmp_path / "var tbl ü")
    write_delta(_vdf(spark, 0, 7), p)
    snap = _load_snapshot(p)
    sts = [json.loads(a["stats"]) for a in snap.files.values()]
    assert sum(s["numRecords"] for s in sts) == 7
    assert all(s["numRecords"] > 0 for s in sts)
    # scalar sibling stats survive too (not just the footer fallback)
    assert any("minValues" in s and "id" in s["minValues"] for s in sts)
