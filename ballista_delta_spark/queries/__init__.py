"""The declared query surface: one entry per SURVEY.md §2 id.

Each submodule exposes ``QUERIES: dict[str, tuple[fn, oracle_sql | None]]``
where ``fn(spark, sf_dir) -> DataFrame`` is the idiomatic-PySpark form and
``oracle_sql`` is the ANSI/DuckDB-SQL equivalent the driver hash-compares at
sf0.01. ``None`` marks genuinely non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from . import (
        aggregates,
        dedup,
        functions_q,
        joins,
        multimodal,
        relational,
        sampling,
        scans,
        similarity,
        streaming_q,
        subqueries,
        text,
        udfs,
        windows,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        scans, relational, joins, aggregates, windows, functions_q,
        subqueries, udfs, dedup, similarity, text, multimodal, streaming_q,
        sampling,
    ):
        for key, pair in mod.QUERIES.items():
            if key in out:
                raise ValueError(f"duplicate query id {key}")
            out[key] = pair
    return out
