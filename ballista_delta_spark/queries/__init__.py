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

# Driver-coverage rotation (see ROTATION.md). The driver's correctness gate
# checks the FIRST ~50 ids of this dict, so ordering is a coverage decision,
# not cosmetics.
#
# Round-6 window (round 5 recorded no work, so the r4 window simply re-ran
# in r5 — every id below is either NEVER driver-tested or stale since r1/r3):
#   1. the 14 r4-new ids that have never had a driver row,
#   2. the 2 r6-new ids (conditional MERGE, watermarked stream dedup),
#   3. the 4 ids green only in r1,
#   4. the whole scans/meta/sinks family — r3-green but the Delta layer is
#      the most-changed code since (checkpoints, DML, protocol, SQL routing),
#   5. fill from the r3-green joins family.
# Slow ids (delta sinks ~2-14 s each at the gate) sit mid-window; streaming
# ids sit LAST as the budget-truncation buffer (slowest, and weakest check
# anyway for the three rows-only ones). Everything after position ~50 keeps
# module order so nothing is lost for tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # -- never driver-tested: cheap relational/function ids first
    "scan_orc", "join_null_safe", "agg_regression", "win_range_frame",
    "subq_lateral", "fn_bitwise", "fn_string_agg",
    "emb_normalize", "emb_quantize_int8",
    # -- r1-stale quartet
    "agg_grouping_sets", "agg_cube", "win_row_number", "win_percent",
    # -- scans/meta (r3-green, most-changed code since)
    "scan_delta_register", "scan_delta_ddl", "scan_delta_partitioned",
    "scan_parquet", "scan_csv_json", "scan_s3", "scan_http",
    "meta_information_schema", "meta_describe_columns",
    "scan_delta_time_travel",
    # -- delta sinks (slowest non-streaming family; merge fixtures trimmed)
    "sink_delta_insert", "sink_delta_write_local", "sink_delta_delete",
    "sink_delta_update", "sink_delta_merge", "sink_delta_merge_conditional",
    "sink_delta_restore", "sink_delta_changes", "sink_delta_zorder",
    "sink_delta_delete_dv",
    # -- joins fill (r3-green)
    "join_inner", "join_left", "join_right", "join_full", "join_semi",
    "join_anti", "join_cross", "join_theta", "join_broadcast_hint",
    "join_asof", "join_range_banded",
    # -- agg canary (r3-green; also the bench headline query)
    "agg_basic",
    # -- streaming last (budget-truncation buffer); the two new stream ids
    #    lead so truncation hits the r4-green repeats first
    "stream_dedup", "stream_dedup_watermarked", "stream_stream_join",
    "stream_delta_source", "stream_tumbling_agg",
)


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

    collected: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        scans, relational, joins, aggregates, windows, functions_q,
        subqueries, udfs, dedup, similarity, text, multimodal, streaming_q,
        sampling,
    ):
        for key, pair in mod.QUERIES.items():
            if key in collected:
                raise ValueError(f"duplicate query id {key}")
            collected[key] = pair

    missing = [k for k in ROTATION if k not in collected]
    if missing:
        raise ValueError(f"ROTATION names unknown query ids: {missing}")
    out: dict[str, tuple[QueryFn, str | None]] = {
        k: collected[k] for k in ROTATION
    }
    for key, pair in collected.items():
        out.setdefault(key, pair)
    return out
