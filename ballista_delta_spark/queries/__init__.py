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
# Round-9 window (r8 went 50/50 green — first all-green window):
#   1. the 12 ids with NO driver hash-green row ever: mm_frame_sample
#      FIRST (at its 3-round staleness deadline, last green r5), then
#      the 11 r8 registrations,
#   2. the r6-green scans/meta/sinks family (3 rounds stale, and the
#      Delta layer changed the most in r8: typeWidening, variant stats,
#      replaceWhere, lineage carryover),
#   3. joins J1-J12 (r6-green) + agg_basic (r6-green),
#   4. the r6-green quartet agg_grouping_sets/agg_cube/win_row_number/
#      win_percent,
#   5. streaming buffer (1): stream_dedup (r6-green, stalest stream id).
# Everything after position 50 keeps module order so nothing is lost for
# tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # -- never driver-hash-green (12): staleness-deadline lead + r8 regs
    "mm_frame_sample",
    "sink_delta_widen", "sink_delta_variant", "sink_delta_replace_where",
    "fn_variant", "tpch_q5", "tpch_q10", "tpch_q18",
    "events_funnel", "events_retention", "events_anomaly",
    "sample_weighted",
    # -- r6-green scans/meta/sinks family (20)
    "scan_delta_register", "scan_delta_ddl", "scan_delta_partitioned",
    "scan_parquet", "scan_csv_json", "scan_orc", "scan_s3", "scan_http",
    "meta_information_schema", "meta_describe_columns",
    "sink_delta_insert", "sink_delta_write_local", "sink_delta_delete",
    "sink_delta_update", "sink_delta_merge", "sink_delta_merge_conditional",
    "sink_delta_zorder", "sink_delta_restore", "sink_delta_changes",
    "scan_delta_time_travel",
    # -- r6-green joins J1-J12 (12) + agg_basic (1)
    "join_inner", "join_left", "join_right", "join_full", "join_semi",
    "join_anti", "join_cross", "join_theta", "join_broadcast_hint",
    "join_asof", "join_range_banded", "join_null_safe",
    "agg_basic",
    # -- r6-green quartet (4)
    "agg_grouping_sets", "agg_cube", "win_row_number", "win_percent",
    # -- streaming last (budget-truncation buffer)
    "stream_dedup",
)


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from . import (
        aggregates,
        dedup,
        functions_q,
        joins,
        multimodal,
        pipeline,
        relational,
        sampling,
        scans,
        similarity,
        streaming_q,
        subqueries,
        text,
        tpch,
        udfs,
        windows,
    )

    collected: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        scans, relational, joins, aggregates, windows, functions_q,
        subqueries, tpch, udfs, dedup, similarity, text, pipeline,
        multimodal, streaming_q, sampling,
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
