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
# Round-13 window (VERDICT r12 #1 + #5), drawn by ROTATION.md's standing
# oldest-judged-first policy: the 2 NEW r13 registrations lead (new ids
# jump the queue — never-judged debt is never re-created), then the 30
# r7-green ids (oldest rows in the union of CORRECTNESS_r*), then the 18
# oldest r8-green ids in registration order — the draft's r8 tail
# (fn_struct_map, tf_generate_series) displaced by the two new ids, per
# the draft's own displacement rule. No streaming ids fall in this
# window, so no truncation-buffer tail is needed. After this window
# lands green the oldest driver-green row is r8.
ROTATION: tuple[str, ...] = (
    # -- new r13 registrations, judged in their landing round
    "dedup_url_canonical", "text_bpe_merge_step",
    # -- the 30 r7-green ids (ROTATION.md r13 draft)
    "limit_offset", "topk", "set_union_all", "set_union", "set_intersect",
    "set_except", "agg_count", "agg_distinct", "agg_having", "agg_stats",
    "agg_median", "agg_approx_percentile", "agg_approx_distinct",
    "agg_array_agg", "agg_first_last", "win_lag_lead", "fn_interval",
    "fn_union_misc", "fn_json", "pandas_udf_grouped_agg",
    "udf_apply_in_pandas", "emb_normalize", "emb_quantize_int8",
    "text_pii_redact", "text_gopher_quality", "text_bigram_topk",
    "doc_chunk", "text_tfidf_topk", "corpus_mix", "seq_pack",
    # -- the 18 oldest r8-green ids (registration order)
    "meta_describe_detail", "join_salted", "agg_bool", "agg_rollup",
    "agg_pivot", "agg_unpivot", "win_rank", "win_ntile", "win_value",
    "win_agg_frame", "fn_string", "fn_regex", "fn_math", "fn_datetime",
    "fn_conditional", "fn_hash_enc", "fn_array", "fn_unnest",
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
