"""One-table tour of the Delta feature surface this engine adds beyond
the reference (which is read-only): conversion, clustering, DML with
deletion vectors, change data feed, schema evolution, row tracking,
checkpoints, and feature retirement — the same chain pinned end-to-end
by tests/test_lifecycle.py.

Run: python examples/lakehouse_tour.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from ballista_delta_spark.session import get_spark, sql
from ballista_delta_spark.sources.delta import (
    alter_columns,
    alter_properties,
    cluster_by,
    convert_to_delta,
    describe_detail,
    optimize,
    read_delta,
    read_delta_changes,
    read_delta_with_row_ids,
    reorg_purge,
)
from ballista_delta_spark.sources.delta_dml import delete_delta, merge_delta


def main() -> None:
    spark = get_spark("lakehouse-tour")
    tbl = tempfile.mkdtemp(prefix="bds-tour-") + "/t"

    # plain parquet -> Delta, in place
    spark.range(1000).selectExpr(
        "id", "id % 37 AS a", "CAST(id % 5 AS INT) AS p"
    ).write.partitionBy("p").parquet(tbl)
    convert_to_delta(spark, tbl)

    cluster_by(tbl, ["a"])          # liquid clustering metadata
    optimize(spark, tbl)            # clusters on `a` by default
    alter_properties(spark, tbl, {
        "delta.enableChangeDataFeed": "true",
        "delta.enableRowTracking": "true",
    })

    delete_delta(spark, tbl, "id % 10 = 0", mode="dv")   # merge-on-read
    merge_delta(
        spark, tbl,
        spark.range(995, 1005).selectExpr(
            "id", "id % 37 AS a", "CAST(id % 5 AS INT) AS p"
        ),
        "t.id = s.id",
        matched_update={"a": "s.a"},
        not_matched_insert={"id": "s.id", "a": "s.a", "p": "s.p"},
    )
    read_delta_changes(spark, tbl, from_version=3).groupBy(
        "_change_type"
    ).count().show()

    reorg_purge(spark, tbl)                               # drop the DVs
    alter_columns(tbl, adds={"note": "string"})           # O(1) widen
    read_delta_with_row_ids(spark, tbl).select(
        "id", "row_id", "row_commit_version"
    ).show(5)

    sql_name = "tour"
    read_delta(spark, tbl).createOrReplaceTempView(sql_name)
    from ballista_delta_spark import session as _s

    _s._delta_views[sql_name] = tbl

    # r8 surface: lossless retype (typeWidening), a VARIANT column
    # (variantType), and log compaction.
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        compact_log,
        write_delta,
    )

    alter_columns(tbl, adds={"score": "int"})
    sql(spark, f"ALTER TABLE {sql_name} ALTER COLUMN score TYPE BIGINT")
    evolved = spark.sql(
        "SELECT CAST(9999 AS BIGINT) AS id, CAST(1 AS BIGINT) AS a, "
        "CAST(0 AS INT) AS p, 'v' AS note, CAST(7 AS BIGINT) AS score, "
        "parse_json('{\"src\": \"tour\"}') AS meta"
    )
    write_delta(evolved, tbl, mode="append", merge_schema=True)
    read_delta(spark, tbl).selectExpr(
        "id", "a", "try_variant_get(meta, '$.src', 'string') AS src"
    ).filter("id = 9999").show()
    snap = _load_snapshot(tbl)
    compact_log(tbl, 0, snap.version)  # one-file replay of the history

    sql(spark, f"DESCRIBE DETAIL {sql_name}").show(truncate=False)
    describe_detail(spark, tbl).select("numFiles", "tableFeatures").show(
        truncate=False
    )
    spark.stop()


if __name__ == "__main__":
    main()
