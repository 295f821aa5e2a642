"""SQL dialect robustness (r10 review fixes): string literals must be
DATA to the statement router — keywords inside them can neither
mis-route, mis-split, nor be rewritten — plus alias-collision, comment,
qualified-name, and generic-type parsing edges."""

from __future__ import annotations

import pytest

from ballista_delta_spark.session import sql
from ballista_delta_spark.sources.delta import read_delta, write_delta


@pytest.fixture()
def view(spark, tmp_path):
    """A registered Delta view with a few rows."""
    loc = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, s string, v long",
        ),
        loc,
    )
    name = f"dlt_{abs(hash(loc)) % 10**8}"
    sql(spark, f"CREATE EXTERNAL TABLE {name} STORED AS DELTA LOCATION '{loc}'")
    return name, loc


def test_update_set_literal_containing_where(spark, view):
    name, loc = view
    sql(spark, f"UPDATE {name} SET s = 'a where b' WHERE id = 1")
    got = {r.id: r.s for r in read_delta(spark, loc).collect()}
    assert got == {1: "a where b", 2: "b", 3: "c"}


def test_time_travel_keyword_inside_literal_is_data(spark, view):
    name, loc = view
    sql(spark, f"UPDATE {name} SET s = '{name} VERSION AS OF 2' WHERE id = 2")
    rows = sql(
        spark,
        f"SELECT id FROM {name} WHERE s = '{name} VERSION AS OF 2'",
    ).collect()
    assert [r.id for r in rows] == [2]


def test_merge_target_aliased_s_and_literal_with_alias_prefix(spark, view):
    """Crossed/colliding aliases: target aliased 's', source aliased 'x';
    and a VALUES literal containing 'x.' must not be rewritten."""
    name, loc = view
    sql(
        spark,
        f"MERGE INTO {name} AS s USING "
        "(SELECT 2 AS id, 222 AS nv UNION ALL SELECT 9, 999) AS x "
        "ON s.id = x.id "
        "WHEN MATCHED THEN UPDATE SET v = x.nv "
        "WHEN NOT MATCHED THEN INSERT (id, s, v) "
        "VALUES (x.id, 'x.example.com', x.nv)",
    )
    got = {r.id: (r.s, r.v) for r in read_delta(spark, loc).collect()}
    assert got[2][1] == 222          # only the matched row updated
    assert got[1][1] == 10 and got[3][1] == 30
    assert got[9] == ("x.example.com", 999)  # literal NOT rewritten


def test_merge_on_condition_with_when_inside_literal(spark, view):
    name, loc = view
    sql(
        spark,
        f"MERGE INTO {name} t USING (SELECT 1 AS id) u "
        "ON t.id = u.id AND t.s <> 'when matched' "
        "WHEN MATCHED THEN DELETE",
    )
    assert sorted(r.id for r in read_delta(spark, loc).collect()) == [2, 3]


def test_replace_where_literal_containing_select(spark, tmp_path):
    loc = str(tmp_path / "rw")
    write_delta(
        spark.createDataFrame(
            [("a SELECT b", 1), ("other", 2)], "note string, v long"
        ),
        loc,
    )
    name = f"rw_{abs(hash(loc)) % 10**8}"
    sql(spark, f"CREATE EXTERNAL TABLE {name} STORED AS DELTA LOCATION '{loc}'")
    sql(
        spark,
        f"INSERT INTO {name} REPLACE WHERE note = 'a SELECT b' "
        "SELECT 'a SELECT b' AS note, 111 AS v",
    )
    got = {r.note: r.v for r in read_delta(spark, loc).collect()}
    assert got == {"a SELECT b": 111, "other": 2}


def test_add_columns_generic_types_survive_commas(spark, view):
    name, loc = view
    sql(
        spark,
        f"ALTER TABLE {name} ADD COLUMNS "
        "(m MAP<string,int>, st STRUCT<a:int,b:string>)",
    )
    cols = {f.name: f.dataType.simpleString() for f in read_delta(spark, loc).schema.fields}
    assert cols["m"] == "map<string,int>"
    assert cols["st"] == "struct<a:int,b:string>"


def test_leading_comment_does_not_disable_interception(spark, view):
    name, loc = view
    sql(
        spark,
        f"-- nightly cleanup\nDELETE FROM {name} WHERE id = 3",
    )
    assert sorted(r.id for r in read_delta(spark, loc).collect()) == [1, 2]
    sql(spark, f"/* batch */ UPDATE {name} SET v = v + 1 WHERE id = 1")
    assert {r.id: r.v for r in read_delta(spark, loc).collect()}[1] == 11


def test_qualified_catalog_table_not_hijacked_by_view_tail(spark, view):
    """A real catalog table sharing its tail with a registered view must
    NOT have DML routed to the view's Delta files."""
    name, loc = view
    spark.sql(f"DROP TABLE IF EXISTS {name}_real")
    # a catalog table whose qualified name ends with the view's name
    # cannot exist (views are single-component), so exercise the guard
    # through tableExists directly: a qualified name that resolves in
    # the catalog must return None.
    spark.sql(f"CREATE TABLE {name}_real (id INT) USING parquet")
    try:
        from ballista_delta_spark.session import _delta_views, _resolve_view

        _delta_views[f"{name}_real"] = loc  # simulate the collision
        try:
            assert _resolve_view(f"{name}_real", spark) == f"{name}_real"
            # qualified name of the REAL table -> catalog wins
            assert _resolve_view(f"default.{name}_real", spark) is None
            # qualified name that does NOT exist -> tail fallback holds
            assert _resolve_view(f"nosuchdb.{name}_real", spark) == f"{name}_real"
        finally:
            _delta_views.pop(f"{name}_real", None)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_real")


def test_update_literal_with_backslash_escaped_quote(spark, view):
    """Spark's default parser accepts 'O\\'Brien'; the literal mask must
    skip the escaped quote or the WHERE clause is swallowed into a
    phantom literal and the UPDATE silently hits every row (ADVICE r10)."""
    name, loc = view
    sql(spark, f"UPDATE {name} SET s = 'O\\'Brien where x' WHERE id = 1")
    got = {r.id: r.s for r in read_delta(spark, loc).collect()}
    assert got == {1: "O'Brien where x", 2: "b", 3: "c"}


def test_mask_literals_backslash_stays_in_sync():
    from ballista_delta_spark.session import _mask_literals

    stmt = "UPDATE t SET name = 'O\\'Brien' WHERE id = 1"
    masked = _mask_literals(stmt)
    assert len(masked) == len(stmt)
    assert "WHERE id = 1" in masked           # not swallowed
    assert "O" not in masked.split("'")[1]    # contents masked
    # doubled-quote escaping still handled
    m2 = _mask_literals("SELECT 'it''s' AS x, 2 AS y")
    assert "AS x, 2 AS y" in m2
    # trailing backslash before end-of-statement: mask to end, no crash
    assert len(_mask_literals("SELECT 'abc\\")) == len("SELECT 'abc\\")


def test_resolve_view_fails_closed_on_catalog_error(spark, view, monkeypatch):
    """If the catalog cannot answer tableExists for a dotted name, the
    tail fallback must NOT re-enable wrong-table DML (ADVICE r10)."""
    from ballista_delta_spark.session import _delta_views, _resolve_view

    name, loc = view
    assert _resolve_view(f"somedb.{name}", spark) == name  # healthy catalog

    class _BrokenCatalog:
        def tableExists(self, _n):
            raise RuntimeError("metastore down")

    monkeypatch.setattr(
        type(spark), "catalog", property(lambda self: _BrokenCatalog())
    )
    assert _resolve_view(f"somedb.{name}", spark) is None  # fail closed
    assert _resolve_view(name, spark) == name  # exact match unaffected


def test_insert_body_supports_time_travel(spark, view):
    name, loc = view
    sql(spark, f"UPDATE {name} SET v = 0 WHERE id = 1")  # bump a version
    sql(
        spark,
        f"INSERT INTO {name} SELECT id + 100, s, v FROM {name} "
        "VERSION AS OF 0 WHERE id = 1",
    )
    got = {r.id: r.v for r in read_delta(spark, loc).collect()}
    assert got[101] == 10  # the PRE-update value, read via time travel
