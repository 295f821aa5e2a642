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
# Round-11 window (r10 went 50/50 green; never-judged count 119 → 69).
# Per VERDICT r10 #1 this window continues the paydown: the 46 OLDEST
# never-driver-judged ids in registration order (r9f → r9h → r9i batches
# 1-6) plus the 4 r6-green staleness-deadline fills (win_range_frame
# first — cheap, non-streaming; the three r6 streaming ids close the
# tail per the budget-truncation-buffer rule, preceded by the
# never-judged stream_static_enrich so a truncation costs a repeat row,
# not a first row). The remaining 23 never-judged ids (r9i batch-6 tail
# + the r9g-class leftovers: join_asof_forward, fn_higher_order,
# dedup_containment, emb_power_iteration, sim_range_search,
# emb_label_drift, sim_hard_negatives, text_code_detect, text_pmi_topk,
# events_type_lift, corpus_token_budget, doc_merge_short,
# events_seasonal_baseline, events_value_pareto, events_streaks,
# mm_clip_filter, agg_winsorized_mean, sample_bootstrap_ci,
# dedup_threshold_sweep, events_cusum_alert, text_readability,
# sample_hash_uniformity, text_blocklist_filter) go to r12 with the
# r7-green staleness fills. Everything after position 50 keeps module
# order so nothing is lost for tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # ==== r12 window: verification debt -> ZERO (VERDICT r11 #1) ====
    # -- the 23 never-judged ids (ROTATION.md "Left for r12")
    "agg_winsorized_mean", "sample_bootstrap_ci", "dedup_threshold_sweep",
    "events_cusum_alert", "text_readability", "sample_hash_uniformity",
    "text_blocklist_filter", "join_asof_forward", "fn_higher_order",
    "dedup_containment", "emb_power_iteration", "sim_range_search",
    "emb_label_drift", "sim_hard_negatives", "text_code_detect",
    "text_pmi_topk", "events_type_lift", "corpus_token_budget",
    "doc_merge_short", "events_seasonal_baseline", "events_value_pareto",
    "events_streaks", "mm_clip_filter",
    # -- the r6-stale quartet (VERDICT r11 #1)
    "agg_regression", "fn_bitwise", "fn_string_agg", "subq_lateral",
    # -- new r12 registrations, judged in their landing round (#8)
    "scan_delta_or_pushdown", "scan_delta_uniform_mixed",
    # -- r7-green staleness fills, Delta layer first (it changed most)
    "scan_delta_skipping", "sink_delta_delete_dv", "sink_delta_update_dv",
    "sink_delta_merge_dv", "sink_delta_cdf", "sink_delta_rename_column",
    "sink_delta_clone", "sink_delta_reorg", "sink_delta_evolve",
    "project_select", "project_expr", "filter_predicate",
    "filter_between_in_like", "filter_null", "project_cast",
    "project_distinct", "sort_multi",
    # -- streaming tail (truncation buffer): new r12 id leads
    "stream_cdf_rate_limit",
    "stream_sliding_agg", "stream_delta_cdf_source", "stream_upsert_delta",
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
