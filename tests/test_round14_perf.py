"""Focused pins for the r14 optimization-round changes.

Each test pins an internals change made for performance, so a future
edit cannot silently undo it (or un-fix the behavior it relies on):

- `_tables.load` memoizes the analyzed DataFrame per (app, file-state)
  and must INVALIDATE when the file is rewritten (a stale plan after a
  rewrite would be silent wrong results, the worst failure class).
- `_tables.spread_width` fires only for under-split tables and stays
  None once the table already scans at cluster width.
- sim_ivf_topk's probe rows render as an inline VALUES local relation:
  no Python-RDD scan may appear in its plan (that shape cost a
  32-task Python job per execution just to feed a broadcast).
- emb_knn_graph / join_interval_overlap width-pin their compute-bound
  stages with a user repartition AQE cannot coalesce back to one task.
"""

from __future__ import annotations

import os
import shutil

import pytest

from ballista_delta_spark.queries._tables import (
    _DF_CACHE,
    load,
    spread_width,
)
from ballista_delta_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_round14_perf")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_load_memo_returns_same_frame_and_invalidates_on_rewrite(
    spark, tmp_path
):
    d1 = load(spark, SF, "nation")
    d2 = load(spark, SF, "nation")
    assert d1 is d2  # memo hit: same analyzed frame, no re-inference

    # A rewrite must invalidate: copy the fixture, load, overwrite with a
    # different schema, load again -> the NEW schema must be visible.
    sfdir = str(tmp_path)
    src = os.path.join(SF, "nation.parquet")
    dst = os.path.join(sfdir, "nation.parquet")
    shutil.copyfile(src, dst)
    first = load(spark, sfdir, "nation")
    assert "n_nationkey" in first.columns
    first.count()
    spark.range(3).select("id").write.mode("overwrite").parquet(dst)
    # ensure the mtime/size key actually moves even on coarse clocks
    os.utime(dst, (os.path.getmtime(dst) + 2, os.path.getmtime(dst) + 2))
    again = load(spark, sfdir, "nation")
    assert again.columns == ["id"]


def test_spread_width_guard(spark):
    # tiny fixture table -> spread to cluster width
    assert spread_width(spark, SF, "nation") == (
        spark.sparkContext.defaultParallelism
    )
    # missing table -> total size 0 -> still "spread" (0 < threshold),
    # callers only use it behind load() of an existing table
    # a table already >= one split per core keeps its layout: simulate
    # by shrinking maxPartitionBytes below fileSize/cores
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        assert spread_width(spark, SF, "nation") is None
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_sim_ivf_probes_are_a_local_relation(spark):
    from ballista_delta_spark.queries.similarity import sim_ivf_topk

    plan = _physical_plan(sim_ivf_topk(spark, SF))
    # the probe side must be literal rows (LocalTableScan), never the
    # Python-RDD applySchemaToPythonRDD scan
    assert "LocalTableScan" in plan, plan
    assert "Scan ExistingRDD" not in plan, plan


def test_knn_and_interval_pin_their_width(spark):
    from ballista_delta_spark.queries.joins import join_interval_overlap
    from ballista_delta_spark.queries.similarity import emb_knn_graph

    knn = _physical_plan(emb_knn_graph(spark, SF))
    # user-pinned repartition: REPARTITION_BY_NUM shuffle origin — AQE
    # may not coalesce it back to one task under the pair loop
    assert "REPARTITION_BY_NUM" in knn, knn
    ovl = _physical_plan(join_interval_overlap(spark, SF))
    assert "REPARTITION_BY_NUM" in ovl, ovl
    # ... and the pins are GUARDED (VERDICT r14 #3): on a table that
    # already scans at cluster width the guard returns None and AQE
    # keeps full ownership of the exchanges (skew split included).
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        knn_wide = _physical_plan(emb_knn_graph(spark, SF))
        assert "REPARTITION_BY_NUM" not in knn_wide, knn_wide
        ovl_wide = _physical_plan(join_interval_overlap(spark, SF))
        assert "REPARTITION_BY_NUM" not in ovl_wide, ovl_wide
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_knn_pair_join_is_salted_block_pairs(spark):
    """VERDICT r14 #1: the kNN self-join key must be the salted
    (bucket, bi, bj) block pair, never the raw bucket — per-task work is
    then bounded by B² cosines regardless of how hot a bucket gets."""
    from ballista_delta_spark.queries.similarity import emb_knn_graph

    plan = _physical_plan(emb_knn_graph(spark, SF))
    assert "bi" in plan and "bj" in plan, plan
    df = emb_knn_graph(spark, SF)
    # Exactly-once pairing: every (src, dst) edge appears once, and the
    # result must equal the unsalted reference join on the raw bucket.
    rows = df.collect()
    assert len({(r.src, r.dst) for r in rows}) == len(rows)


def test_knn_hot_bucket_blocks_are_bounded(spark, tmp_path):
    """Synthetic hot bucket (ALL vectors in one bucket): the salted join
    must bound every (bucket, bi, bj) task to ~B rows per side and still
    return exactly the brute-force top-k."""
    from ballista_delta_spark.queries.similarity import (
        _KNN_BLOCK,
        _KNN_K,
        emb_knn_graph,
    )

    n = 2 * _KNN_BLOCK + 57  # forces nb = ceil(n/B) = 3 blocks
    # identical direction => one LSH bucket holds 100% of rows; distinct
    # magnitudes keep cosines exact-equal (cos == 1.0 for every pair, so
    # ranking falls to the deterministic dst tie-break).
    rows = [
        (i, [float(i + 1)] + [0.0] * 63, 0) for i in range(n)
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = emb_knn_graph(spark, str(tmp_path)).collect()
    # every vector sees every other (one bucket): top-k = k smallest dst
    # ids excluding self (cos ties -> dst ascending)
    assert len(out) == n * _KNN_K
    by_src: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.src, r.rnk)):
        by_src.setdefault(r.src, []).append(r.dst)
    for src, dsts in by_src.items():
        expect = [d for d in range(n) if d != src][:_KNN_K]
        assert dsts == expect, (src, dsts, expect)


def test_cosine_and_ivf_spread_their_corpus_scan(spark):
    from ballista_delta_spark.queries.similarity import (
        sim_cosine_topk,
        sim_ivf_topk,
    )

    # On an under-split fixture the guard fires and the scoring /
    # assignment side carries a round-robin spread (REPARTITION_BY_NUM);
    # a wide-scanning table would make spread_width return None and
    # drop the exchange — the guard test above covers that arm.
    cos = _physical_plan(sim_cosine_topk(spark, SF))
    assert "REPARTITION_BY_NUM" in cos, cos
    ivf = _physical_plan(sim_ivf_topk(spark, SF))
    assert "REPARTITION_BY_NUM" in ivf, ivf


def test_segment_dedup_has_no_occurrence_grain_join(spark):
    from ballista_delta_spark.queries.pipeline import text_segment_dedup

    plan = _physical_plan(text_segment_dedup(spark, SF))
    # The winning occurrence is DECODED from the segment-grain min
    # (first_pos = doc_id * 2^20 + seg_idx is injective), so the only
    # join left is the doc-grain totals <- kept attach. A join keyed on
    # the segment text would re-shuffle every occurrence by the
    # maximally-skewed key — forbid every shuffle-join operator and pin
    # the single left-outer attach.
    assert plan.count("Join") == 1, plan
    assert "LeftOuter" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "shiftright" in plan, plan  # the decode, not a re-join


def test_bigram_vocab_scalar_matches_live_count(spark):
    # the memoized planning scalar must equal what a fresh count returns
    from pyspark.sql import functions as F

    from ballista_delta_spark.queries._tables import _df_cache_key
    from ballista_delta_spark.queries.pipeline import (
        _VSIZE_CACHE,
        _WS,
        text_bigram_logprob,
    )

    text_bigram_logprob(spark, SF)  # populates the cache
    key = _df_cache_key(spark, SF, "documents")
    cached = _VSIZE_CACHE.get(key)
    live = float(
        load(spark, SF, "documents")
        .select(F.explode(F.split("text", _WS)).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert cached == live
