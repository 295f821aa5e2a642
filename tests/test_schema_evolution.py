"""ALTER TABLE ADD COLUMN + mergeSchema append (schema widening).

Reference context: the reference has no schema-evolution surface at all
(its ALTER is DataFusion's in-memory catalog, reference src/lib.rs:36);
this mirrors delta-spark's metadata-only ADD COLUMNS and
``.option("mergeSchema", "true")`` append behavior: existing files are
never touched, new columns read back as null for old rows, and on a
column-mapped table the new field is minted a fresh physical name + id.
"""

import json

import pytest

from ballista_delta_spark.sources.delta import (
    _load_snapshot,
    alter_columns,
    read_delta,
    write_delta,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id % 3 AS INT) AS p"
    )
    write_delta(df, path, mode="overwrite", partition_by=["p"])
    return path


def test_add_column_is_metadata_only(spark, tbl):
    before = set(_load_snapshot(tbl).files)
    v = alter_columns(tbl, adds={"note": "string"})
    assert v == 1
    snap = _load_snapshot(tbl)
    assert set(snap.files) == before  # zero data jobs
    # A pure ADD must NOT drag the table into column mapping.
    assert snap.column_mapping_mode == "none"
    assert [f.name for f in snap.schema.fields] == ["k", "v", "p", "note"]
    out = read_delta(spark, tbl)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["note"] is None for r in rows)


def test_add_column_types_and_validation(spark, tbl):
    alter_columns(tbl, adds={"d": "decimal(10,2)", "arr": "array<int>"})
    snap = _load_snapshot(tbl)
    types = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
    assert types["d"] == "decimal(10,2)"
    assert types["arr"] == "array<int>"
    with pytest.raises(ValueError, match="already exists"):
        alter_columns(tbl, adds={"k": "long"})
    with pytest.raises(ValueError, match="nothing to alter"):
        alter_columns(tbl)


def test_add_column_on_mapped_table_gets_physical_name(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})  # enables mapping
    alter_columns(tbl, adds={"note": "string"})
    snap = _load_snapshot(tbl)
    phys = snap.column_mapping["note"]
    assert phys.startswith("col-") and phys != "note"
    fields = json.loads(snap.metadata_raw["schemaString"])["fields"]
    note_id = next(
        f["metadata"]["delta.columnMapping.id"]
        for f in fields
        if f["name"] == "note"
    )
    assert int(
        snap.configuration["delta.columnMapping.maxColumnId"]
    ) == note_id == len(fields)
    # writes after the add land under the physical name and read back
    df = spark.createDataFrame(
        [(100, 200, 1, "x")], "k long, value long, p int, note string"
    )
    write_delta(df, tbl, mode="append")
    out = read_delta(spark, tbl)
    assert out.filter("note = 'x'").count() == 1
    assert out.filter("note IS NULL").count() == 10


def test_add_column_sql_ddl(spark, tbl):
    from ballista_delta_spark.session import sql as bd_sql

    bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE evo_t STORED AS DELTA LOCATION '{tbl}'",
    )
    bd_sql(spark, "ALTER TABLE evo_t ADD COLUMNS (note string, d decimal(10,2))")
    snap = _load_snapshot(tbl)
    names = [f.name for f in snap.schema.fields]
    assert names == ["k", "v", "p", "note", "d"]
    assert snap.schema["d"].dataType.simpleString() == "decimal(10,2)"
    spark.catalog.dropTempView("evo_t")


def test_merge_schema_append_new_column(spark, tbl):
    df = spark.createDataFrame(
        [(100, 200, 1, "x")], "k long, v long, p int, note string"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(df, tbl, mode="append")
    v = write_delta(df, tbl, mode="append", merge_schema=True)
    snap = _load_snapshot(tbl)
    assert [f.name for f in snap.schema.fields] == ["k", "v", "p", "note"]
    assert snap.schema["note"].nullable
    out = read_delta(spark, tbl)
    assert out.count() == 11
    assert out.filter("note = 'x'").count() == 1
    assert out.filter("note IS NULL").count() == 10
    # the widening commit re-emitted metaData with the SAME table id
    with open(f"{tbl}/_delta_log/{v:020d}.json") as fh:
        acts = [json.loads(line) for line in fh]
    mds = [a["metaData"] for a in acts if "metaData" in a]
    assert len(mds) == 1
    assert mds[0]["id"] == snap.metadata_raw["id"]


def test_merge_schema_append_missing_nullable_column(spark, tmp_path, tbl):
    # nullable-v table (the shared fixture's v is non-nullable via range())
    path = str(tmp_path / "nullable")
    base = spark.createDataFrame(
        [(i, i * 2, i % 3) for i in range(10)], "k long, v long, p int"
    )
    write_delta(base, path, mode="overwrite", partition_by=["p"])
    # input omits v entirely — filled with typed nulls
    df = spark.createDataFrame([(100, 1)], "k long, p int")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(df, path, mode="append")
    write_delta(df, path, mode="append", merge_schema=True)
    out = read_delta(spark, path)
    assert out.filter("v IS NULL").count() == 1
    assert out.count() == 11
    # partition columns can never be omitted
    df2 = spark.createDataFrame([(7, 7)], "k long, v long")
    with pytest.raises(ValueError, match="partition column"):
        write_delta(df2, path, mode="append", merge_schema=True)
    # nor can non-nullable ones (the fixture's v came from range())
    df3 = spark.createDataFrame([(7, 1)], "k long, p int")
    with pytest.raises(ValueError, match="non-nullable"):
        write_delta(df3, tbl, mode="append", merge_schema=True)


def test_merge_schema_type_drift_still_errors(spark, tbl):
    df = spark.createDataFrame([(1.5, 2, 1)], "k double, v long, p int")
    with pytest.raises(ValueError, match="type mismatch"):
        write_delta(df, tbl, mode="append", merge_schema=True)


def test_merge_schema_on_mapped_table(spark, tbl):
    alter_columns(tbl, renames={"v": "value"})
    df = spark.createDataFrame(
        [(100, 200, 1, 3.5)], "k long, value long, p int, score double"
    )
    write_delta(df, tbl, mode="append", merge_schema=True)
    snap = _load_snapshot(tbl)
    assert snap.column_mapping["score"].startswith("col-")
    out = read_delta(spark, tbl)
    assert out.filter("score IS NOT NULL").count() == 1
    assert out.count() == 11


def test_column_default_fills_omitted_column(spark, tbl):
    from ballista_delta_spark.sources.delta import alter_column_default

    alter_columns(tbl, adds={"note": "string"})
    alter_column_default(tbl, "note", "'n/a'")
    snap = _load_snapshot(tbl)
    assert snap.min_writer_version == 7
    assert "allowColumnDefaults" in snap.writer_features
    assert snap.schema["note"].metadata["CURRENT_DEFAULT"] == "'n/a'"
    # append omitting the defaulted column -> filled with the default
    df = spark.createDataFrame([(100, 200, 1)], "k long, v long, p int")
    write_delta(df, tbl, mode="append")
    out = read_delta(spark, tbl)
    assert out.filter("note = 'n/a'").count() == 1
    # pre-existing rows predate the default and stay null
    assert out.filter("note IS NULL").count() == 10
    # an explicit value still wins
    df2 = spark.createDataFrame(
        [(101, 202, 1, "real")], "k long, v long, p int, note string"
    )
    write_delta(df2, tbl, mode="append")
    assert read_delta(spark, tbl).filter("note = 'real'").count() == 1


def test_column_default_drop_and_validation(spark, tbl):
    from ballista_delta_spark.sources.delta import alter_column_default

    alter_columns(tbl, adds={"note": "string"})
    alter_column_default(tbl, "note", "'x'")
    alter_column_default(tbl, "note", None)  # DROP DEFAULT
    snap = _load_snapshot(tbl)
    assert "CURRENT_DEFAULT" not in (snap.schema["note"].metadata or {})
    # with the default gone, omitting the column is a schema mismatch again
    df = spark.createDataFrame([(1, 2, 1)], "k long, v long, p int")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(df, tbl, mode="append")
    with pytest.raises(ValueError, match="no such column"):
        alter_column_default(tbl, "ghost", "'x'")
    with pytest.raises(ValueError, match="partition column"):
        alter_column_default(tbl, "p", "0")
    with pytest.raises(ValueError, match="constant-foldable"):
        alter_column_default(tbl, "note", "concat(k, '!')")


def test_column_default_sql_ddl(spark, tbl):
    from ballista_delta_spark.session import sql as bd_sql

    bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE dflt_t STORED AS DELTA LOCATION '{tbl}'",
    )
    bd_sql(spark, "ALTER TABLE dflt_t ADD COLUMNS (score int)")
    bd_sql(spark, "ALTER TABLE dflt_t ALTER COLUMN score SET DEFAULT 7")
    df = spark.createDataFrame([(100, 200, 1)], "k long, v long, p int")
    write_delta(df, tbl, mode="append")
    assert read_delta(spark, tbl).filter("score = 7").count() == 1
    bd_sql(spark, "ALTER TABLE dflt_t ALTER COLUMN score DROP DEFAULT")
    snap = _load_snapshot(tbl)
    assert "CURRENT_DEFAULT" not in (snap.schema["score"].metadata or {})
    spark.catalog.dropTempView("dflt_t")


def test_merge_schema_evolution_adds_source_columns(spark, tmp_path):
    """schema_evolution=True (delta-spark's withSchemaEvolution): new
    top-level source columns join the table schema (metadata-only);
    existing rows read them as NULL; inserts carry them; updates can
    reference them — in both cow and dv modes."""
    from ballista_delta_spark.sources.delta import _load_snapshot, read_delta, write_delta
    from ballista_delta_spark.sources.delta_dml import merge_delta

    for mode in ("cow", "dv"):
        p = str(tmp_path / f"ev_{mode}")
        write_delta(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id int, s string"
            ).coalesce(1), p,
        )
        src = spark.createDataFrame(
            [(2, "B", 20.0), (3, "c", 30.0)], "id int, s string, score double"
        )
        m = merge_delta(
            spark, p, src, "t.id = s.id",
            matched_update={"s": "s.s", "score": "s.score"},
            not_matched_insert=True,
            mode=mode,
            schema_evolution=True,
        )
        assert m["numTargetRowsUpdated"] == 1
        assert m["numTargetRowsInserted"] == 1
        snap = _load_snapshot(p)
        assert [f.name for f in snap.schema.fields] == ["id", "s", "score"]
        got = {
            r["id"]: (r["s"], r["score"])
            for r in read_delta(spark, p).collect()
        }
        assert got == {
            1: ("a", None),       # pre-evolution row: NULL-filled
            2: ("B", 20.0),       # updated, new column set from source
            3: ("c", 30.0),       # inserted with the new column
        }


def test_merge_schema_evolution_null_fills_missing_source_columns(
    spark, tmp_path
):
    """The evolved INSERT * must span the widened schema even when the
    SOURCE lacks target columns: they insert as NULL (delta-spark's
    evolved positional insert), instead of erroring."""
    from ballista_delta_spark.sources.delta import read_delta, write_delta
    from ballista_delta_spark.sources.delta_dml import merge_delta

    p = str(tmp_path / "nf")
    write_delta(
        spark.createDataFrame([(1, "a", 1.5)], "id int, s string, w double")
        .coalesce(1), p,
    )
    src = spark.createDataFrame([(9, "z2")], "id int, extra string")
    merge_delta(
        spark, p, src, "t.id = s.id",
        not_matched_insert=True, schema_evolution=True,
    )
    got = {
        r["id"]: (r["s"], r["w"], r["extra"])
        for r in read_delta(spark, p).collect()
    }
    assert got == {1: ("a", 1.5, None), 9: (None, None, "z2")}


def test_merge_without_schema_evolution_keeps_schema_fixed(spark, tmp_path):
    """Without the flag, extra source columns never leak into the table:
    the insert is positional-by-name over the EXISTING schema (documented
    merge contract) and the schema is unchanged."""
    from ballista_delta_spark.sources.delta import _load_snapshot, read_delta, write_delta
    from ballista_delta_spark.sources.delta_dml import merge_delta

    p = str(tmp_path / "strict")
    write_delta(
        spark.createDataFrame([(1, "a")], "id int, s string").coalesce(1), p
    )
    src = spark.createDataFrame([(3, "c", 1.0)], "id int, s string, x double")
    merge_delta(spark, p, src, "t.id = s.id", not_matched_insert=True)
    snap = _load_snapshot(p)
    assert [f.name for f in snap.schema.fields] == ["id", "s"]
    assert read_delta(spark, p).count() == 2


def test_sql_merge_with_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION INTO ... (delta-spark's SQL form)."""
    from ballista_delta_spark.session import sql as bd_sql
    from ballista_delta_spark.sources.delta import _load_snapshot, write_delta

    p = str(tmp_path / "sqlmev")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        .coalesce(1), p,
    )
    bd_sql(
        spark,
        f"CREATE EXTERNAL TABLE mev_t STORED AS DELTA LOCATION '{p}'",
    )
    spark.createDataFrame(
        [(2, "B", 7), (3, "c", 9)], "id int, s string, rank int"
    ).createOrReplaceTempView("mev_src")
    out = bd_sql(spark, """
        MERGE WITH SCHEMA EVOLUTION INTO mev_t t USING mev_src s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET s = s.s, rank = s.rank
        WHEN NOT MATCHED THEN INSERT *
    """).collect()[0]
    assert out.numTargetRowsUpdated == 1 and out.numTargetRowsInserted == 1
    snap = _load_snapshot(p)
    assert [f.name for f in snap.schema.fields] == ["id", "s", "rank"]
    got = {
        r.id: (r.s, r.rank) for r in bd_sql(spark, "SELECT * FROM mev_t").collect()
    }
    assert got == {1: ("a", None), 2: ("B", 7), 3: ("c", 9)}
    spark.catalog.dropTempView("mev_t")
    spark.catalog.dropTempView("mev_src")


def test_merge_schema_evolution_is_case_insensitive(spark, tmp_path):
    """A source column differing only in CASE must not evolve into a
    duplicate column (Spark's default resolution is case-insensitive —
    a second 'ID' column would make every later reference ambiguous)."""
    from ballista_delta_spark.sources.delta import _load_snapshot, write_delta
    from ballista_delta_spark.sources.delta_dml import merge_delta

    p = str(tmp_path / "ci")
    write_delta(
        spark.createDataFrame([(1, "a")], "id int, s string").coalesce(1), p
    )
    src = spark.createDataFrame([(2, "b")], "ID int, s string")
    merge_delta(
        spark, p, src, "t.id = s.ID",
        not_matched_insert=True, schema_evolution=True,
    )
    snap = _load_snapshot(p)
    assert [f.name for f in snap.schema.fields] == ["id", "s"]  # no dup


def test_merge_schema_rejects_case_duplicate_column(spark, tmp_path):
    """Evolving 'ID' next to an existing 'id' would commit a schema that
    bricks every Spark read under caseSensitive=false — refused, like
    delta-spark (review finding, r11)."""
    from ballista_delta_spark.sources.delta import write_delta

    tbl = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id long, s string"), tbl)
    with pytest.raises(ValueError, match="differ only in case"):
        write_delta(
            spark.createDataFrame([(2, "b", 9)], "ID long, s string, v long"),
            tbl, mode="append", merge_schema=True,
        )
