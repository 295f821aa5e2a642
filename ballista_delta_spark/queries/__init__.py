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
# Round-7 window (r6 went 48/50 green; the 2 reds were the emb array-shape
# bug, fixed this round):
#   1. the 4 ids with no driver row ever: sink_delta_cdf (registered past
#      position 50 in r6), the two emb ids (driver-red r6, output shape now
#      scalar rows), fn_union_misc (rows-only by design),
#   2. the 23 relational/agg-core ids last green in r3 (4 rounds stale),
#   3. the 5 non-streaming r4-green ids (3 rounds stale),
#   4. sink_delta_delete_dv — r6-green but its apply path is rewritten this
#      round (executor-side bitmap decode), so it needs a re-green,
#   5. fill from the r5-green families (2 rounds stale),
#   6. streaming LAST as the budget-truncation buffer, the two r4-stale
#      stream ids leading so truncation hits the r5-green repeat first.
# Everything after position ~50 keeps module order so nothing is lost for
# tools/check.py full runs.
ROTATION: tuple[str, ...] = (
    # -- never driver-green
    "sink_delta_cdf", "emb_normalize", "emb_quantize_int8", "fn_union_misc",
    # -- r3-stale relational core
    "project_select", "project_expr", "project_cast", "project_distinct",
    "filter_predicate", "filter_null", "filter_between_in_like",
    "sort_multi", "limit_offset", "topk",
    "set_union", "set_union_all", "set_intersect", "set_except",
    # -- r3-stale agg core
    "agg_count", "agg_distinct", "agg_having", "agg_stats", "agg_median",
    "agg_approx_distinct", "agg_approx_percentile", "agg_array_agg",
    "agg_first_last",
    # -- r4-stale (non-streaming)
    "win_lag_lead", "fn_interval", "fn_json", "pandas_udf_grouped_agg",
    "udf_apply_in_pandas",
    # -- DV apply path rewritten this round (re-green) + the two NEW
    #    r7 merge-on-read DML ids (never driver-tested)
    "sink_delta_delete_dv", "sink_delta_update_dv", "sink_delta_merge_dv",
    # -- r7-registered ids with NO driver row ever: the r6-tail batch
    #    (registered past position 50 last round) then this round's new
    #    Delta-lifecycle + pipeline families. Never-judged beats
    #    refreshing r4+r5-green fills a round early (those lead r8).
    "text_pii_redact", "text_gopher_quality", "text_bigram_topk",
    "sink_delta_rename_column", "sink_delta_clone", "scan_delta_skipping",
    "sink_delta_reorg", "sink_delta_evolve",
    "doc_chunk", "text_tfidf_topk", "corpus_mix", "seq_pack",
    # -- streaming last (budget-truncation buffer); the two never-judged
    #    stream ids lead so truncation hits the r5-green repeat first
    "stream_upsert_delta", "stream_delta_cdf_source",
    "stream_sliding_agg",
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
        udfs,
        windows,
    )

    collected: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        scans, relational, joins, aggregates, windows, functions_q,
        subqueries, udfs, dedup, similarity, text, pipeline, multimodal,
        streaming_q, sampling,
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
