"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or --sf DIR) and
compares against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/check.py [--sf /root/testdata/sf0.01] [query_id ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Preserve the int-vs-float distinction: the driver's hash does (a
        # DuckDB HUGEINT output lands as float64 in pandas and hashes as
        # "5.0" against Spark's BIGINT "5"). Round-1 lesson: collapsing
        # 5.0 -> "5" here masked exactly the 3 driver hash failures.
        s = f"{v:.9g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, bool):
        return str(v).lower()
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("T", " ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [",".join(r) for r in out]


# Numeric-type portability gate (round-1 lesson). The driver materializes
# both sides through pandas, where DuckDB HUGEINT (sum of any integer) and
# DECIMAL coerce to float64/object while Spark's BIGINT stays int64 — an
# automatic hash mismatch even for identical values. So: (a) no oracle may
# OUTPUT a HUGEINT/DECIMAL column (CAST it), and (b) each shared column must
# agree on int-ness vs float-ness between the Spark schema and DuckDB.
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_DUCK_BAD = {"HUGEINT", "UHUGEINT"}


def type_problems(spark_dtypes, duck_cols, duck_types):
    problems = []
    duck_by_name = dict(zip(duck_cols, (str(t).upper() for t in duck_types)))
    spark_by_name = dict(spark_dtypes)
    for name, dt in duck_by_name.items():
        if dt in _DUCK_BAD or dt.startswith("DECIMAL"):
            problems.append(
                f"oracle col {name} is {dt} (floats out via pandas) — CAST it"
            )
            continue
        st = spark_by_name.get(name)
        if st is None:
            continue
        if st in _SPARK_INT and dt in _DUCK_FLOAT:
            problems.append(f"col {name}: spark {st} vs duckdb {dt}")
        elif st in _SPARK_FLOAT and dt in _DUCK_INT:
            problems.append(f"col {name}: spark {st} vs duckdb {dt}")
        elif st is not None and st.startswith("decimal"):
            problems.append(f"spark col {name} is {st} — cast to double/bigint")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from ballista_delta_spark.session import get_spark

    spark = get_spark("check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    ids = args.ids or list(qs)
    passed = failed = rows_only = 0
    for name in ids:
        if name not in qs:
            print(f"{name}: UNKNOWN id")
            failed += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = sdf.columns
            s_dtypes = sdf.dtypes
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"{name}: SPARK ERROR\n{traceback.format_exc()}")
            failed += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception:
            print(f"{name}: ORACLE ERROR\n{traceback.format_exc()}")
            failed += 1
            continue
        problems = type_problems(s_dtypes, d_cols, d_types)
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            sn, dn = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"{name}: FAIL ({'; '.join(problems)})")
            if args.verbose:
                print("  spark:", s_rows[:5])
                print("  duck :", d_rows[:5])
            failed += 1
        else:
            print(f"{name}: OK ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            passed += 1
    print(f"\n== {passed} ok, {rows_only} rows-only, {failed} failed, {len(ids)} total ==")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
