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
    # -- staleness-deadline fill, non-streaming (r6-green)
    "win_range_frame",
    # -- r9f never-judged (2)
    "corpus_curation_verdict", "events_bot_detect",
    # -- r9h never-judged (7)
    "emb_whiten", "text_entropy", "mm_dedup_ahash",
    "corpus_lang_confusion", "emb_kcenter_step", "agg_exact_percentile",
    "corpus_source_psi",
    # -- r9i batch 1 (14 non-streaming, registration order)
    "events_rfm", "text_zipf_fit", "dedup_survivorship",
    "join_interval_overlap", "basket_lift", "corpus_dedup_cascade",
    "agg_histogram", "events_interarrival_fit", "corpus_embedding_audit",
    "events_ab_test", "dedup_fuzzy_names", "emb_cluster_purity",
    "events_conversion_lag", "udf_map_in_arrow",
    # -- r9i batch 2 (6)
    "sim_rrf_fusion", "events_ltv_cohort", "graph_triangle_count",
    "dq_expectations", "events_scd2_tiers", "events_audience_overlap",
    # -- r9i batch 3 (5)
    "emb_knn_graph", "scan_text", "events_ewma_chart",
    "agg_skew_kurtosis", "fn_try_safe",
    # -- r9i batch 4 (3)
    "text_boilerplate_prefix", "text_tokenizer_fertility",
    "events_survival_curve",
    # -- r9i batch 5 (5)
    "events_peak_concurrency", "dedup_source_matrix",
    "text_quality_threshold_sweep", "sink_delta_scd2_apply",
    "events_behavior_entropy",
    # -- r9i batch 6 head (3)
    "corpus_doc_length_gini", "sim_mmr_rerank",
    "corpus_source_ngram_overlap",
    # -- streaming tail (buffer): never-judged first, then r6-stale fills
    "stream_static_enrich",
    "stream_delta_source", "stream_stream_join", "stream_dedup_watermarked",
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
