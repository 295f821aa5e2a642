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
# not cosmetics. Round 4 window = the 47 ids never driver-tested in rounds
# 1-3 (functions/windows/subqueries/UDFs + the whole dedup/ANN/text/
# multimodal/streaming/sampling surface) + 3 regression repeats from the
# r1-only group. Streaming sits last inside the window (slowest family —
# if the driver budget-truncates, it truncates there, not on the cheap
# never-tested ids). Everything after position 50 keeps the original module
# order so nothing is lost for tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # -- scalar-function sweep (F1-F11, T1, fn_json): cheap, never tested
    "fn_string", "fn_regex", "fn_math", "fn_datetime", "fn_interval",
    "fn_conditional", "fn_hash_enc", "fn_array", "fn_unnest",
    "fn_struct_map", "fn_union_misc", "tf_generate_series", "fn_json",
    # -- window tail (W4-W7)
    "win_ntile", "win_lag_lead", "win_value", "win_agg_frame",
    # -- reshaping (A15-A16)
    "agg_pivot", "agg_unpivot",
    # -- subqueries (Q1-Q4)
    "subq_scalar", "subq_in_exists", "cte", "derived_table",
    # -- UDF surface (X1-X2 + applyInPandas)
    "udf_python", "pandas_udf_grouped_agg", "udf_apply_in_pandas",
    # -- regression repeats: 3 of the 7 r1-only ids (rest rotate in r5)
    "agg_bool", "agg_rollup", "win_rank",
    # -- dedup / similarity / text / sampling
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine", "dedup_clusters",
    "sim_cosine_topk", "sim_lsh_bucketed", "sim_ivf_topk",
    "text_token_count", "text_quality", "text_lang_id", "text_fingerprint",
    "sample_stratified", "sample_train_test_split",
    # -- multimodal + streaming last (heaviest; budget-truncation buffer)
    "mm_binary_features", "mm_frame_sample",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
    "stream_stateful_user_stats",
    # -- positions 51-54: the other 4 r1-only ids, next in line if the
    #    driver window ever widens; due back in the r5 window.
    "agg_grouping_sets", "agg_cube", "win_row_number", "win_percent",
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
