"""Deterministic sampling operators over the ``documents`` corpus —
training-data pipeline extensions (no reference analogue; the round brief's
"operations a large-scale training-data pipeline would need").

Real pipelines sample by HASH, not by RNG: the same document must land in
the same split on every run, on every executor, regardless of partitioning
— reproducibility and join-stability (features computed for train docs
must join back to the same train docs). Both operators here key on
``md5(doc_id)`` exactly like the dedup family, so the DuckDB oracle is an
exact integer comparison, and both are single narrow scans: a codegen'd
hash-filter with NO shuffle before the final aggregate (sampling 100 TB
costs one read of the hashed column set, not a sort or exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)

# Percent-scale hash bucket shared by both engines: first 8 hex chars of
# md5(doc_id) as an integer, mod 100. Uniform, engine-portable, stable.
_HASH_SPARK = "conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) % 100"
_HASH_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

# Per-stratum keep-rates (percent): downsample the over-represented head
# language, keep the tail — the canonical language-balancing move.
_RATES = {"en": 25, "zh": 80, "es": 80, "de": 80, "fr": 80}
_DEFAULT_RATE = 50


def _rate_case() -> str:
    # Identical SQL in both dialects (plain CASE).
    whens = " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in _RATES.items())
    return f"CASE lang {whens} ELSE {_DEFAULT_RATE} END"


# ----------------------------------------------------- sample_stratified
@_q(
    "sample_stratified",
    f"""
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE {_HASH_DUCK} < {_rate_case()}
    GROUP BY lang ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep-rate sampling as one hash-filtered scan."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.expr(f"{_HASH_SPARK} < {_rate_case()}"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars_sampled"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------ sample_train_test_split
@_q(
    "sample_train_test_split",
    f"""
    SELECT CASE WHEN {_HASH_DUCK} < 90 THEN 'train' ELSE 'test' END AS split,
           lang, count(*) AS n,
           CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars
    FROM documents
    GROUP BY split, lang ORDER BY split, lang
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 split; per-(split, lang) profile proves the
    split is stable and language-balanced. The split column is derived,
    never stored — any job re-derives the identical membership."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "split",
            F.expr(f"CASE WHEN {_HASH_SPARK} < 90 THEN 'train' ELSE 'test' END"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 2).cast("double").alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


# -------------------------------------------------------- sample_weighted
# Length-proportional sampling: keep probability ∝ document length, capped
# at 1 — the "sample by tokens, not by docs" correction every mixture
# recipe needs (uniform doc sampling over-represents short docs in the
# token budget). Membership stays hash-derived (md5 bucket vs a per-row
# threshold computed from n_chars), so the draw is deterministic,
# partitioning-independent, and exactly reproducible by the oracle — and
# the whole operator is still ONE codegen'd hash-filtered scan, no
# shuffle before the final profile aggregate.
_W_SCALE = 2000  # chars at (or above) which the keep probability is 1.0


@_q(
    "sample_weighted",
    f"""
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_sampled,
           CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars
    FROM documents
    WHERE {_HASH_DUCK} < least(n_chars, {_W_SCALE}) * 100 // {_W_SCALE}
    GROUP BY lang ORDER BY lang
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    thresh = f"least(n_chars, {_W_SCALE}) * 100 DIV {_W_SCALE}"
    return (
        d.filter(F.expr(f"{_HASH_SPARK} < {thresh}"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars_sampled"),
            F.round(F.avg("n_chars"), 2).cast("double").alias("avg_chars"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------ sample_reservoir
# Fixed-size per-stratum sample: exactly k documents per language (not a
# rate — a COUNT), the draw every eval-set builder needs ("give me 10
# docs per language, same ten every run"). Deterministic "reservoir":
# rank docs inside each stratum by md5(doc_id) — a uniform, engine-
# portable permutation — and keep the first k. One shuffle (the window's
# partitionBy lang), no joins; at 100 TB the rank-then-cut can also run
# as a per-partition top-k + merge (TakeOrderedAndProject shape), but
# the window form stays exact for any k and keeps the plan declarative.
# Ties cannot happen (md5 of distinct ids), doc_id breaks them anyway.
_RESERVOIR_K = 10


@_q(
    "sample_reservoir",
    f"""
    SELECT lang, doc_id, rnk
    FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id
               ) AS rnk
        FROM documents
    ) ranked
    WHERE rnk <= {_RESERVOIR_K}
    ORDER BY lang, rnk
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= _RESERVOIR_K)
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------- sample_temperature
# Temperature resampling (the multilingual balancing in XLM-R / mT5 /
# UNIMAX): language l with share p_l is sampled proportional to p_l^ALPHA
# (ALPHA < 1 flattens the distribution toward the tail). Unlike
# sample_stratified's FIXED rates, the rates here are computed FROM the
# corpus — the closed form keep_rate_l = (n_min / n_l)^(1 - ALPHA)
# (p_l^(ALPHA-1) normalized so the rarest language keeps 100%; corpus
# size N cancels). Membership stays md5-hash-derived against a
# basis-point threshold, so the draw is deterministic and
# partitioning-independent.
#
# Scale shape — the canonical two-phase "measure, then sample":
# phase 1 aggregates per-language counts (the scan reads ONLY the lang
# column — column pruning makes the measuring pass ~free — and map-side
# partials collapse to K rows before the exchange); phase 2 re-scans
# with the K-row rate table BROADCAST onto the corpus (no corpus
# shuffle to meet the rates) and folds the keep test into the profile
# aggregate. The rate math runs in the plan, not the driver — no
# collect(), so the operator composes into a single lazy DAG.
_TEMP_ALPHA = 0.3
_T_HASH_SPARK = "conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) % 10000"
_T_HASH_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000"


@_q(
    "sample_temperature",
    f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    rates AS (
      SELECT lang, n_docs,
             CAST(floor(pow((SELECT min(n_docs) FROM counts)::DOUBLE / n_docs,
                            1 - {_TEMP_ALPHA}) * 10000) AS BIGINT) AS keep_bp
      FROM counts)
    SELECT d.lang, r.n_docs, r.keep_bp,
           count(CASE WHEN {_T_HASH_DUCK} < r.keep_bp THEN 1 END) AS n_sampled
    FROM documents d JOIN rates r ON d.lang = r.lang
    GROUP BY 1, 2, 3 ORDER BY d.lang
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    # Global min as an unpartitioned window over the K-row aggregate: one
    # single-partition pass over K rows, instead of a scalar-subquery agg
    # that would duplicate the whole counts subtree (and its corpus scan)
    # in the plan.
    n_min = F.min("n_docs").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    rates = counts.select(
        "lang",
        "n_docs",
        F.floor(
            F.pow(n_min.cast("double") / F.col("n_docs"), 1 - _TEMP_ALPHA)
            * 10000
        )
        .cast("bigint")
        .alias("keep_bp"),
    )
    return (
        d.select("lang", F.expr(_T_HASH_SPARK).alias("h"))
        .join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "keep_bp")
        .agg(
            F.count(F.when(F.col("h") < F.col("keep_bp"), 1)).alias(
                "n_sampled"
            )
        )
        .orderBy("lang")
    )


# ----------------------------------------------------------- sample_dsir
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023): score
# every document by how much more likely its hashed n-gram bag is under a
# TARGET (in-domain) distribution than under the RAW corpus distribution,
# then keep the target-like docs. Unlike text_quality_classifier's fixed
# stand-in weights, the model here is LEARNED from the corpus itself: the
# target is the English slice (the usual "looks like my eval domain"
# proxy), features are md5-hashed unigram buckets (B=64), and the
# per-bucket weight is the add-one-smoothed log ratio
# ln(p_target / p_raw), quantized to integer milli-nats so the per-doc
# fold accumulates EXACTLY in int64 (same lesson as the classifier: keep
# floats out of the accumulation).
#
# Scale shape — measure, then score, like sample_temperature but with the
# measured state inlined instead of joined:
#   phase 1 (measure): explode tokens -> two-phase count per bucket. The
#     map-side partials collapse every partition to <= B rows before the
#     single exchange, so the measuring job's shuffle is B rows per task
#     regardless of corpus size.
#   phase 2 (score): the B-entry weight table is ANN-planning-sized state
#     (64 ints — same class as the IVF centroid collect), so it is
#     collected once and inlined as a literal array; scoring is then ONE
#     narrow codegen'd pass (split -> aggregate fold), zero joins, zero
#     exchanges, per-doc output (pinned in tests/test_scale_plans.py).
# The driver-side ln() is Python libm; the oracle's is DuckDB's — both
# glibc on any linux build, and the milli-nat floor makes a 1-ulp
# divergence flip the integer only within ~2^-40 of a boundary.
_DSIR_B = 64
_DSIR_TARGET_LANG = "en"

# Phase-1 measure rows per corpus file state (see sample_dsir).
_DSIR_MEASURE_CACHE: dict = {}


@_q(
    "sample_dsir",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
      FROM documents),
    b AS (
      SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT % {_DSIR_B} AS bk,
             count(*) AS r_c,
             count(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 END) AS t_c
      FROM tok GROUP BY 1),
    tot AS (SELECT sum(r_c) AS r_tot, sum(t_c) AS t_tot FROM b),
    w AS (
      SELECT bk,
             CAST(floor(ln((t_c + 1)::DOUBLE / (t_tot + {_DSIR_B})
                           * (r_tot + {_DSIR_B})::DOUBLE / (r_c + 1))
                        * 1000) AS BIGINT) AS wt
      FROM b, tot)
    SELECT s.doc_id, s.lang, s.n_tokens, s.score, s.score > 0 AS keep
    FROM (
      SELECT tok.doc_id, tok.lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w.wt) AS BIGINT) AS score
      FROM tok
      JOIN w ON ('0x' || substr(md5(tok.t), 1, 8))::BIGINT % {_DSIR_B} = w.bk
      GROUP BY 1, 2) s
    """,
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    d = load(spark, sf_dir, "documents")
    bucket = f"CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {_DSIR_B}"
    # Phase-1 measure (B bucket rows) — memoized per input-file state
    # like the IVF centroid cache: the tokenize+groupBy job otherwise
    # re-runs on every frame build of this id.
    from ._tables import _df_cache_key

    ck = _df_cache_key(spark, sf_dir, "documents")
    counts = _DSIR_MEASURE_CACHE.get(ck) if ck is not None else None
    if counts is None:
        counts = (
            d.select(
                "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
            )
            .groupBy(F.expr(bucket).alias("bk"))
            .agg(
                F.count(F.lit(1)).alias("r_c"),
                F.count(
                    F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
                ).alias("t_c"),
            )
            .collect()
        )
        if ck is not None:
            _DSIR_MEASURE_CACHE[ck] = counts
    r_tot = sum(r["r_c"] for r in counts)
    t_tot = sum(r["t_c"] for r in counts)
    by_bk = {r["bk"]: (r["r_c"], r["t_c"]) for r in counts}
    wt = [
        math.floor(
            math.log(
                (by_bk.get(b, (0, 0))[1] + 1)
                / (t_tot + _DSIR_B)
                * (r_tot + _DSIR_B)
                / (by_bk.get(b, (0, 0))[0] + 1)
            )
            * 1000
        )
        for b in range(_DSIR_B)
    ]
    w_lit = "array(" + ", ".join(f"{v}L" for v in wt) + ")"
    lookup = f"element_at({w_lit}, CAST({bucket} AS INT) + 1)"
    return (
        d.select("doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("ws"))
        .filter(F.size("ws") >= 1)
        .select(
            "doc_id",
            "lang",
            F.size("ws").cast("bigint").alias("n_tokens"),
            F.expr(f"aggregate(ws, 0L, (acc, t) -> acc + {lookup})").alias(
                "score"
            ),
        )
        .withColumn("keep", F.col("score") > 0)
    )


# ----------------------------------------------------- sample_bootstrap_ci
# Poisson bootstrap (the distributed-bootstrap standard — Chamandy et
# al. 2012): B=8 resample replicates of the corpus, each weighting
# every document Poisson(1) times, DERIVED from md5(doc_id, replicate)
# through the inverse-CDF thresholds inlined as integer-permille
# literals — no RNG state, no resample materialization, restart-stable
# like every hash-derived sample here. Per replicate: effective corpus
# size and the replicate mean doc length; the spread across replicates
# IS the bootstrap CI of the mean (the driver reads min/max directly).
#
# Scale shape: replicates ride ONE narrow pass (explode over B per
# row — B-fold map fan-out, no shuffle before the B-row aggregate);
# weights are exact small ints, sums exact BIGINT — bit-identical CIs.
_BOOT_B = 8
# cumulative Poisson(1) CDF x 10^4, k = 0..5 (tail folded into k=6)
_BOOT_CDF = (3679, 7358, 9197, 9810, 9963, 9994)


def _boot_weight(dialect: str) -> str:
    """Poisson(1) weight from a per-(doc, replicate) md5 bucket."""
    if dialect == "spark":
        h = ("conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
             "CAST(r AS STRING))), 1, 8), 16, 10) % 10000")
    else:
        h = ("('0x' || substr(md5(doc_id::VARCHAR || ':' || r::VARCHAR), "
             "1, 8))::BIGINT % 10000")
    whens = " ".join(
        f"WHEN {h} < {c} THEN {k}" for k, c in enumerate(_BOOT_CDF)
    )
    return f"CASE {whens} ELSE 6 END"


@_q(
    "sample_bootstrap_ci",
    f"""
    WITH reps AS (
      SELECT doc_id, n_chars, unnest(range(0, {_BOOT_B})) AS r
      FROM documents),
    weighted AS (
      SELECT r, n_chars, {_boot_weight("duckdb")} AS w FROM reps)
    SELECT CAST(r AS INTEGER) AS replicate,
           CAST(sum(w) AS BIGINT) AS n_effective,
           round(CAST(sum(w * n_chars) AS DOUBLE) / sum(w), 4)
               AS mean_chars
    FROM weighted GROUP BY r
    """,
)
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    reps = d.select(
        "doc_id", "n_chars",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("r"),
    )
    weighted = reps.selectExpr(
        "r", "n_chars", f'{_boot_weight("spark")} AS w'
    )
    return weighted.groupBy(F.col("r").cast("int").alias("replicate")).agg(
        F.sum("w").cast("bigint").alias("n_effective"),
        F.round(
            F.sum(F.col("w") * F.col("n_chars")).cast("double")
            / F.sum("w"),
            4,
        ).alias("mean_chars"),
    )


# --------------------------------------------------- sample_hash_uniformity
# The meta-gate under every hash-derived operator in this repo
# (stratified/weighted/reservoir sampling, train/test splits, A/B
# variants, shard assignment, epoch shuffles): a chi-square uniformity
# audit of the md5 bucket scheme itself. Each key family (doc ids, the
# bigram feature space, user ids) is bucketed B=64 ways exactly as the
# operators do it — over DISTINCT keys (hashing a key family with
# repeats would measure key multiplicity, not hash quality: the
# sf0.001 fixture's 15 users re-hashed per event read chi2 ~ 2575
# before this distinct; the buckets were fine, the keys just repeat) —
# and the chi-square statistic vs the uniform expectation is reported
# with the pass verdict at the df=63, alpha=0.001 critical value
# (103.4). If this gate ever fails, every
# derived split upstream is suspect — it runs with the monitors, not
# the samplers. Scale shape: one narrow hash pass per family, ONE
# 64-row aggregate each; the chi-square folds exact integer counts
# against an exact expectation — engine-identical.
_HU_B = 64
_HU_CRIT = 103.4  # chi-square df=63, p=0.001


@_q(
    "sample_hash_uniformity",
    f"""
    WITH keys AS (
      SELECT 'doc_id' AS family, doc_id AS k FROM documents
      UNION ALL
      SELECT DISTINCT 'user_id', user_id FROM events
      UNION ALL
      SELECT 'event_id', event_id FROM events),
    fams AS (
      SELECT family,
             ('0x' || substr(md5(k::VARCHAR), 1, 8))::BIGINT
               % {_HU_B} AS b
      FROM keys),
    cells AS (
      SELECT family, b, count(*) AS c FROM fams GROUP BY family, b),
    tots AS (SELECT family, sum(c) AS n, count(*) AS k FROM cells
             GROUP BY family)
    SELECT cells.family,
           CAST(t.n AS BIGINT) AS n_keys,
           CAST(t.k AS INTEGER) AS n_buckets_hit,
           round(sum((c - CAST(t.n AS DOUBLE) / {_HU_B})
                     * (c - CAST(t.n AS DOUBLE) / {_HU_B}))
                 / (CAST(t.n AS DOUBLE) / {_HU_B}), 4) AS chi_square,
           round(sum((c - CAST(t.n AS DOUBLE) / {_HU_B})
                     * (c - CAST(t.n AS DOUBLE) / {_HU_B}))
                 / (CAST(t.n AS DOUBLE) / {_HU_B}), 4) < {_HU_CRIT}
             AS uniform_ok
    FROM cells JOIN tots t ON cells.family = t.family
    GROUP BY cells.family, t.n, t.k
    """,
)
def sample_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "events")

    def fam(df: DataFrame, col: str, name: str, distinct: bool = False) -> DataFrame:
        keys = df.select(F.col(col).alias("k"))
        if distinct:
            keys = keys.distinct()
        return keys.selectExpr(
            f"'{name}' AS family",
            f"conv(substring(md5(CAST(k AS STRING)), 1, 8), 16, 10)"
            f" % {_HU_B} AS b",
        )

    fams = (
        fam(d, "doc_id", "doc_id")
        .unionAll(fam(e, "user_id", "user_id", distinct=True))
        .unionAll(fam(e, "event_id", "event_id"))
    )
    cells = fams.groupBy("family", "b").agg(F.count(F.lit(1)).alias("c"))
    tots = cells.groupBy("family").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    exp = F.col("n").cast("double") / _HU_B
    chi = F.round(
        F.sum((F.col("c") - exp) * (F.col("c") - exp)) / exp, 4
    )
    return (
        cells.join(F.broadcast(tots), "family")
        .groupBy("family", "n", "k")
        .agg(
            F.round(
                F.sum(
                    (F.col("c") - F.col("n").cast("double") / _HU_B)
                    * (F.col("c") - F.col("n").cast("double") / _HU_B)
                )
                / (F.col("n").cast("double") / _HU_B),
                4,
            ).alias("chi_square")
        )
        .select(
            "family",
            F.col("n").cast("bigint").alias("n_keys"),
            F.col("k").cast("int").alias("n_buckets_hit"),
            "chi_square",
            (F.col("chi_square") < _HU_CRIT).alias("uniform_ok"),
        )
    )
