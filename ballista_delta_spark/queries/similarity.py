"""Approximate-nearest-neighbor similarity search over the ``embeddings``
table (``embedding: array<float>``, 64-dim) — training-data pipeline
extensions beyond the reference surface (SURVEY.md §7 phase E).

Two tiers, as a 100 TB pipeline would deploy them:

- ``sim_cosine_topk``: brute-force cosine top-k — the exact baseline. The
  query set is tiny (5 vectors) and explicitly ``F.broadcast``-joined, so
  the plan is a single map-side pass over the corpus (no shuffle for the
  join; one shuffle for the per-query top-k window). Brute force over N
  corpus rows is the right plan when |queries| is small: it reads the
  corpus once, which is the floor for exact search.
- ``sim_lsh_bucketed``: the approximate scale path — random-hyperplane
  sign-LSH. Every vector gets a bucket id from the sign pattern of 4
  deterministic hyperplanes; candidates are corpus vectors sharing the
  query's bucket (a hash-partitioned equi-join on ``bucket``, no cross
  join anywhere); exact cosine re-ranks within the bucket. At 100 TB you
  raise the plane count so buckets stay bounded, and the join stays
  shuffle-on-bucket — cost is |bucket| per query, not N.

Engine parity: the hyperplanes are pseudo-random integer literals
``w(k, d) = ((37k + 61d) mod 7) - 3`` generated once in Python and pasted
into BOTH the Spark expression and the DuckDB oracle, dot products fold
left-to-right in double precision, and cosine is rounded to 6 decimals
before ranking, with ``vec_id`` as the deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)

_DIM = 64
_N_QUERIES = 5  # query set = vec_id < 5
_TOPK = 10
# Default plane count for the REGISTERED query (pinned so the DuckDB oracle
# computes identical buckets). The library entry point `lsh_bucket_expr`
# takes n_planes as a parameter: at production scale size it to the corpus
# (≈ log2(N / target_bucket_rows)), because 2^n_planes is both the join-key
# cardinality (parallelism ceiling) and the expected bucket-count divisor.
_N_PLANES = 4


def _planes(n_planes: int = _N_PLANES) -> list[list[int]]:
    return [
        [((37 * k + 61 * d) % 7) - 3 for d in range(_DIM)]
        for k in range(n_planes)
    ]


def lsh_bucket_expr(n_planes: int = _N_PLANES, *, dialect: str = "spark") -> str:
    """Sign-LSH bucket id over an `emb: array<double>` column, as a flat
    generated expression: bucket = sum_k (plane_k . emb > 0) << k.

    Generated UNROLLED (64 multiply-adds per plane, zero-weight terms
    skipped) instead of folding over a literal plane matrix: both engines
    then evaluate a plain left-to-right double chain — identical IEEE
    result, and ~10x faster than re-materializing a 4x64 array literal per
    row (measured 8.4s -> <1s on the DuckDB side at sf0.01).

    The same Python loop emits both dialects, so the Spark query and the
    DuckDB oracle agree term-for-term (fold order included).
    """
    terms = []
    for k, row in enumerate(_planes(n_planes)):
        if dialect == "spark":
            dot = " + ".join(f"emb[{d}] * ({w}.0D)" for d, w in enumerate(row) if w)
            terms.append(
                f"(CASE WHEN ({dot}) > 0D THEN CAST({1 << k} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
            )
        else:  # duckdb (1-based array indexing)
            dot = " + ".join(f"emb[{d + 1}] * ({w}.0)" for d, w in enumerate(row) if w)
            terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << k} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# Normalized corpus with per-row norm, shared by both queries.
# NO higher-order functions anywhere: transform()/aggregate() are
# CodegenFallback expressions, and ONE of them in a projection knocks the
# whole downstream stage (including the pair join's cosine loop) out of
# whole-stage codegen — measured 0 codegen spans and ~10x slowdown. The
# array cast and the unrolled dot are plain codegen expressions with the
# same values and fold order.
def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return e.withColumn("nrm", F.sqrt(F.expr(dot_expr("emb", "emb"))))


_CORPUS_ORACLE = """
    e AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS emb,
             sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
                            FOR i IN range(1, len(embedding) + 1)])) AS nrm
      FROM embeddings)
"""

_COS_ORACLE = """
    round(list_sum([q.emb[i] * c.emb[i] FOR i IN range(1, len(q.emb) + 1)])
          / (q.nrm * c.nrm), 6)
"""


def dot_expr(left: str, right: str, dim: int = _DIM) -> str:
    """Unrolled left-to-right dot product over two array<double> columns.

    Same IEEE fold order as both the previous zip_with/aggregate form and
    the oracle's list_sum comprehension — but fully inside whole-stage
    codegen (GetArrayItem chains), where the higher-order-function form is
    interpreted expression evaluation. Per-pair cosine is the hot loop of
    every similarity join: measured ~10x on the blocked embedding dedup."""
    return " + ".join(f"{left}[{i}] * {right}[{i}]" for i in range(dim))


def _cos_spark() -> F.Column:
    return F.round(
        F.expr(dot_expr("q.emb", "c.emb")) / (F.col("q.nrm") * F.col("c.nrm")),
        6,
    )


# ------------------------------------------------------- sim_cosine_topk
@_q(
    "sim_cosine_topk",
    f"""
    WITH {_CORPUS_ORACLE},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_COS_ORACLE} AS cos_sim
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= {_TOPK}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _corpus(spark, sf_dir)
    q = F.broadcast(e.filter(F.col("vec_id") < _N_QUERIES)).alias("q")
    c = e.alias("c")
    scored = q.join(c, F.col("c.vec_id") != F.col("q.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("vec_id"),
        _cos_spark().alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
    )


# ------------------------------------------------------ sim_lsh_bucketed
# bucket = sum_k (plane_k . emb > 0) << k ; candidates share the bucket.
_BUCKET_SPARK = lsh_bucket_expr(_N_PLANES, dialect="spark")
_BUCKET_DUCK = lsh_bucket_expr(_N_PLANES, dialect="duckdb")


def lsh_bucketize(df: DataFrame, n_planes: int = _N_PLANES) -> DataFrame:
    """Library entry point: add a sign-LSH `bucket` column to a DataFrame
    with an `emb: array<double>` column. Bucket count scales as 2^n_planes —
    size n_planes to the corpus so buckets stay bounded (tests assert the
    growth)."""
    return df.withColumn("bucket", F.expr(lsh_bucket_expr(n_planes)))


@_q(
    "sim_lsh_bucketed",
    f"""
    WITH {_CORPUS_ORACLE},
    eb AS (SELECT vec_id, emb, nrm, {_BUCKET_DUCK} AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_COS_ORACLE} AS cos_sim
      FROM eb q JOIN eb c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= {_TOPK}
    """,
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    eb = _corpus(spark, sf_dir).withColumn("bucket", F.expr(_BUCKET_SPARK))
    q = F.broadcast(eb.filter(F.col("vec_id") < _N_QUERIES)).alias("q")
    c = eb.alias("c")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("vec_id"),
            _cos_spark().alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
    )
