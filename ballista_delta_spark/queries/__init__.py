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
# Round-14 window (VERDICT r13 #1 + #2), exactly ROTATION.md's committed
# r14 draft with its displacement rule applied: the 2 NEW r14
# registrations lead (new ids jump the queue — never-judged debt is
# never re-created), then the 29 r8-green non-streaming ids (the oldest
# rows in the union of CORRECTNESS_r*, led by the pair the r13 window
# displaced), then the oldest r9-green scans/sinks block with its OWN
# tail (sink_delta_widen, sink_delta_variant) displaced by the two new
# ids, and the three r8 streaming ids last as the truncation buffer.
# After this window lands green the oldest driver-green row is r9.
ROTATION: tuple[str, ...] = (
    # -- new r14 registrations, judged in their landing round
    "fn_url_parse", "events_holt_level_step",
    # -- the 29 r8-green non-streaming ids (ROTATION.md r14 draft order)
    "fn_struct_map", "tf_generate_series", "subq_scalar", "subq_in_exists",
    "cte", "derived_table", "udf_python", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_cosine", "dedup_clusters", "sim_cosine_topk",
    "sim_lsh_bucketed", "sim_ivf_topk", "emb_project", "text_token_count",
    "text_quality", "text_lang_id", "text_fingerprint", "text_repetition",
    "text_decontaminate", "events_sessionize", "text_unigram_logprob",
    "mm_binary_features", "mm_resize_pool", "sample_stratified",
    "sample_train_test_split",
    # -- the 16 oldest r9-green scans/sinks (registration order, tail
    #    pair displaced by the new ids)
    "scan_delta_register", "scan_delta_ddl", "scan_delta_partitioned",
    "scan_parquet", "scan_csv_json", "scan_orc", "scan_s3", "scan_http",
    "meta_information_schema", "meta_describe_columns", "sink_delta_insert",
    "sink_delta_write_local", "sink_delta_delete", "sink_delta_update",
    "sink_delta_merge", "sink_delta_merge_conditional",
    # -- r8 streaming ids, last inside the window (truncation buffer)
    "stream_tumbling_agg", "stream_session_window",
    "stream_stateful_user_stats",
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
