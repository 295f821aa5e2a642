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
# Round-8 window (r7 went 49/50 hash-green + fn_union_misc rows-only by
# design — zero failures):
#   1. the 8 ids with NO driver row ever (registered after the r7
#      mid-round window revision),
#   2. the 12 non-streaming fills the revision displaced (r5-green, at
#      their 3-round staleness deadline): win tail, agg
#      bool/rollup/pivot/unpivot, the subquery family,
#   3. the stale fn family (r4/r5-green; fn_interval/fn_json/
#      fn_union_misc were r7-green and sit out) + udf_python,
#   4. fill from the r4/r5-green dedup/sim/text-core/sampling families
#      (longest-untested extension ids; heaviest scale machinery),
#   5. streaming LAST as the budget-truncation buffer (the three
#      r4/r5-stale stream ids; the r6/r7-green seven sit out).
# mm_frame_sample (r4/5-green) is the one id that does not fit — it
# LEADS the r9 window (noted in ROTATION.md).
# Everything after position 50 keeps module order so nothing is lost for
# tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # -- never driver-judged (8)
    "emb_project", "mm_resize_pool", "join_salted", "text_repetition",
    "text_decontaminate", "events_sessionize", "meta_describe_detail",
    "text_unigram_logprob",
    # -- displaced r5-green fills at staleness deadline (12)
    "win_rank", "win_ntile", "win_value", "win_agg_frame",
    "agg_bool", "agg_rollup", "agg_pivot", "agg_unpivot",
    "cte", "derived_table", "subq_in_exists", "subq_scalar",
    # -- stale fn family + udf_python (11)
    "fn_string", "fn_regex", "fn_math", "fn_datetime", "fn_conditional",
    "fn_hash_enc", "fn_array", "fn_unnest", "fn_struct_map",
    "tf_generate_series", "udf_python",
    # -- stale extension fills: dedup (6) + sim (3) + text core (4) +
    #    sampling (2) + mm (1)
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine", "dedup_clusters",
    "sim_cosine_topk", "sim_lsh_bucketed", "sim_ivf_topk",
    "text_token_count", "text_quality", "text_lang_id", "text_fingerprint",
    "sample_stratified", "sample_train_test_split",
    "mm_binary_features",
    # -- streaming last (budget-truncation buffer, stalest first)
    "stream_session_window", "stream_stateful_user_stats",
    "stream_tumbling_agg",
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
