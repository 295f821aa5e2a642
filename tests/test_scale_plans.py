"""Scale-shape assertions: these tests pin the PLAN, not the rows.

A correct result computed through an all-pairs nested-loop join is still
wrong at 100 TB — the round-1 verdict flagged exactly that in
dedup_embedding_cosine. These tests fail if the scale-killers come back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_delta_spark.queries.dedup import dedup_embedding_cosine
from ballista_delta_spark.queries.similarity import lsh_bucket_expr, lsh_bucketize


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_embedding_dedup_has_no_nested_loop_join(spark, sf_dir):
    """The blocked form must join on the bucket key — a
    BroadcastNestedLoopJoin over the corpus means the O(n^2) theta join
    is back."""
    plan = _physical_plan(dedup_embedding_cosine(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lsh_bucket_count_grows_with_planes(spark, sf_dir):
    """2^n_planes is the parallelism ceiling of the bucket join; the plane
    count must actually widen the bucket space when raised (the round-1
    constant 16-bucket config capped any cluster at 16-way)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    counts = {
        n: lsh_bucketize(e, n).select("bucket").distinct().count()
        for n in (2, 4, 8)
    }
    assert counts[2] <= 4
    assert counts[2] < counts[4] < counts[8]
    # And distinct plane configs must produce distinct expressions.
    assert lsh_bucket_expr(4) != lsh_bucket_expr(8)


def test_lsh_bucket_spark_duck_dialects_agree(spark, sf_dir):
    """The generated Spark and DuckDB bucket expressions must compute the
    same bucket for every vector (term order included — a sign flip near 0
    from a different fold order would silently desync the oracle)."""
    import duckdb

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    got = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucketize(e, 4).select("vec_id", "bucket").collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"""
            SELECT vec_id, {lsh_bucket_expr(4, dialect="duckdb")} AS bucket
            FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
                  FROM read_parquet('{sf_dir}/embeddings.parquet'))
            """
        ).fetchall()
    )
    assert got == want
