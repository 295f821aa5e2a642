"""Text-analysis operators over the ``documents`` table — training-data
pipeline extensions beyond the reference surface (SURVEY.md §7 phase E).

The reference has no text operators (it is a scan/SQL showcase,
reference README.md:18-21); these are the operations a 100 TB corpus
pipeline needs: token counting, quality scoring, language ID, and document
fingerprinting. All four are pure built-in ``pyspark.sql.functions``
expressions — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with the scan: one narrow pass over ``documents``, no shuffle
at all (verify: ``.explain`` shows a single WholeStageCodegen over the
parquet scan with ReadSchema pruned to doc_id/text).

Oracle parity: every expression is mirrored in ANSI/DuckDB SQL with the
same constants, so the driver hash-compare is exact (integer arithmetic) or
rounded (ratios rounded to 4 decimals in BOTH engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)

# Whitespace tokenizer used by every operator here (and by the oracles).
# _WS_SQL is the form embedded in SQL string literals: Spark SQL processes
# backslash escapes inside '...' (so it needs \\s), DuckDB does not (so the
# oracle uses \s) — same final regex either way.
_WS = r"\s+"
_WS_SQL = r"\\s+"
# BPE-ish pre-tokenizer: letter runs | digit runs | single other symbol.
_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language function-word profiles for the lang-ID heuristic.
_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein"),
    "fr": ("le", "la", "les", "de", "et", "est", "une"),
}


def _sql_in(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _hits(lang: str):
    """Spark column: # tokens in the language's function-word profile."""
    return F.expr(
        f"size(filter(split(text, '{_WS_SQL}'), t -> t IN {_sql_in(_PROFILES[lang])}))"
    )


# --- text_token_count: whitespace + BPE-ish regex token counts.
@_q(
    "text_token_count",
    f"""
    SELECT doc_id,
           len(regexp_split_to_array(text, '{_WS}')) AS ws_tokens,
           len(regexp_extract_all(text, '{_BPE}')) AS bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", _WS)).alias("ws_tokens"),
        F.regexp_count("text", F.lit(_BPE)).alias("bpe_tokens"),
    )


# --- text_quality: length / punctuation / stopword-ratio scoring.
# Ratios rounded to 4 decimals in BOTH engines so the value-hash is stable.
@_q(
    "text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           len(regexp_split_to_array(text, '{_WS}')) AS n_tokens,
           round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                 / length(text), 4) AS punct_ratio,
           round(len(list_filter(regexp_split_to_array(text, '{_WS}'),
                                 t -> t IN {_sql_in(_PROFILES["en"])})) * 1.0
                 / len(regexp_split_to_array(text, '{_WS}')), 4) AS stopword_ratio,
           CASE WHEN length(text) < 50 THEN 'short'
                WHEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                     / length(text) > 0.1 THEN 'noisy'
                ELSE 'clean' END AS quality
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", _WS)
    punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.round(punct * 1.0 / F.length("text"), 4).alias("punct_ratio"),
        F.round(_hits("en") * 1.0 / F.size(toks), 4).alias("stopword_ratio"),
        F.when(F.length("text") < 50, "short")
        .when(punct * 1.0 / F.length("text") > 0.1, "noisy")
        .otherwise("clean")
        .alias("quality"),
    )


# --- text_lang_id: function-word-profile argmax (n-gram-style heuristic).
# Deterministic tie-break: highest count wins, earlier profile wins ties,
# 'und' (undetermined) when no profile hits at all. NOTE: the synthetic
# corpus uses one shared vocabulary, so this scores honestly rather than
# recovering the fixture's `lang` column — the operator, not the label, is
# what a real pipeline reuses.
_LANG_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t IN {_sql_in(_PROFILES["en"])})) AS h_en,
             len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t IN {_sql_in(_PROFILES["es"])})) AS h_es,
             len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t IN {_sql_in(_PROFILES["de"])})) AS h_de,
             len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t IN {_sql_in(_PROFILES["fr"])})) AS h_fr
      FROM documents)
    SELECT doc_id,
           CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
                WHEN h_de >= h_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
"""


@_q("text_lang_id", _LANG_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = {lang: _hits(lang) for lang in _PROFILES}
    best = F.greatest(*h.values())
    return d.select(
        "doc_id",
        F.when(best == 0, "und")
        .when((h["en"] >= h["es"]) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]), "en")
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]), "es")
        .when(h["de"] >= h["fr"], "de")
        .otherwise("fr")
        .alias("lang_pred"),
    )


# --- text_fingerprint: position-weighted polynomial rolling hash over
# tokens. Token hash = first 8 hex chars of md5 as an int (engine-portable,
# unlike Spark's xxhash64 / DuckDB's hash()); position weight cycles 1..64;
# fingerprint = weighted sum mod 2^31-1. Pure integer arithmetic → exact
# hash match. Stays vectorized (higher-order functions, no explode shuffle).
_FP_ORACLE = f"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(text, '{_WS}') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(list_sum([('0x' || substr(md5(toks[i]), 1, 8))::BIGINT
                          * ((i - 1) % 64 + 1)
                          FOR i IN range(1, len(toks) + 1)])
                % 2147483647 AS BIGINT) AS fingerprint
    FROM t
"""


@_q("text_fingerprint", _FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fp = F.expr(
        f"""
        aggregate(
          zip_with(split(text, '{_WS_SQL}'),
                   sequence(1, size(split(text, '{_WS_SQL}'))),
                   (tok, i) -> CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)
                               * CAST((i - 1) % 64 + 1 AS BIGINT)),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)
        % 2147483647
        """
    )
    return d.select("doc_id", fp.alias("fingerprint"))


# --- text_pii_redact: regex PII masking (emails / phones / IPv4).
# The synthetic corpus carries no PII, so the query first APPENDS a
# deterministic, doc_id-derived contact line — the redaction regexes are
# then genuinely exercised on every row (a zero-match pass would prove
# nothing). Counts come from the pre-redaction text; the redacted text is
# md5'd so the compare stays row-sized. Regexes are written in the common
# Java-regex/RE2 subset (no lookarounds, no backrefs) so Spark and DuckDB
# match identically; DuckDB needs the 'g' flag (its regexp_replace is
# first-match-only by default — Spark's replaces all).
#
# 100 TB shape: one codegen'd narrow pass over the scan, zero shuffle —
# same cost envelope as text_token_count.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_PII_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(t, '{_IP_RE}')) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
    FROM aug
"""


@_q("text_pii_redact", _PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(_PHONE_RE), F.lit("<PHONE>"),
        ),
        F.lit(_IP_RE), F.lit("<IP>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count(aug, F.lit(_IP_RE)).alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --- text_gopher_quality: Gopher-style (Rae et al. 2021, published rule
# set) document-quality gates: word-count bounds, mean-word-length
# bounds, and minimum stopword evidence. Mean word length is total
# non-whitespace chars / word count (exact integer inputs, rounded to 4
# decimals in BOTH engines). One codegen'd pass, no shuffle.
_GOPHER_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '{_WS}')) AS n_words,
             length(regexp_replace(text, '{_WS}', '', 'g')) AS n_chars_nws,
             len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t IN {_sql_in(_PROFILES["en"])})) AS stop_hits
      FROM documents)
    SELECT doc_id, n_words,
           round(n_chars_nws * 1.0 / n_words, 4) AS mean_word_len,
           stop_hits,
           (n_words BETWEEN 50 AND 100000
            AND n_chars_nws * 1.0 / n_words BETWEEN 3 AND 10
            AND stop_hits >= 2) AS keep
    FROM s
"""


@_q("text_gopher_quality", _GOPHER_ORACLE)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", _WS))
    n_chars_nws = F.length(F.regexp_replace("text", _WS, ""))
    mean_wl = n_chars_nws * 1.0 / n_words
    stop_hits = _hits("en")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        (
            n_words.between(50, 100000)
            & mean_wl.between(3, 10)
            & (stop_hits >= 2)
        ).alias("keep"),
    )


# --- text_bigram_topk: corpus-level top-25 token bigrams. The one text
# operator here that SHOULD shuffle: explode to (bigram) then a two-phase
# hash aggregate. 100 TB shape: the map side pre-aggregates per partition
# (partial_count), so the exchange carries one row per DISTINCT bigram per
# partition — vocabulary-sized, not token-count-sized; the final top-25 is
# a TakeOrderedAndProject (no global sort materialization). Deterministic
# tie-break on the bigram text keeps the driver hash stable.
_BIGRAM_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '{_WS}') AS t
      FROM documents),
    grams AS (
      SELECT t[i] || ' ' || t[i + 1] AS bigram
      FROM toks, range(1, 10000) r(i)
      WHERE i < len(t))
    SELECT bigram, count(*) AS cnt
    FROM grams
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 25
"""


@_q("text_bigram_topk", _BIGRAM_ORACLE)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        F.explode(
            F.expr(
                f"""
                zip_with(slice(split(text, '{_WS_SQL}'), 1,
                               size(split(text, '{_WS_SQL}')) - 1),
                         slice(split(text, '{_WS_SQL}'), 2,
                               size(split(text, '{_WS_SQL}')) - 1),
                         (a, b) -> concat(a, ' ', b))
                """
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(25)
    )


# --- text_repetition: Gopher-style repetition gates — the third leg of
# the quality family (text_quality = shape ratios, text_gopher_quality =
# bounds, this = repetition). Three per-doc signals: distinct-token
# fraction, top-token fraction, top-BIGRAM fraction (the strongest
# boilerplate detector), and a keep flag on thresholds evaluated against
# the ROUNDED fractions so float noise can't flip the gate across
# engines. Scale shape: two explode -> two-phase agg branches whose
# exchanges carry per-doc distinct token/bigram counts (vocabulary-sized
# per doc, not corpus-sized), joined on doc_id. Single-token docs have no
# bigrams and drop identically in both engines (inner join after an
# empty unnest).
@_q(
    "text_repetition",
    f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(text, '{_WS}') AS toks
        FROM documents
    ),
    tc AS (
        SELECT doc_id, t, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS t FROM toks)
        GROUP BY doc_id, t
    ),
    ts AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct, max(c) AS top_tok
        FROM tc GROUP BY doc_id
    ),
    bc AS (
        SELECT doc_id, b, count(*) AS c
        FROM (
            SELECT doc_id,
                   unnest([toks[i] || ' ' || toks[i + 1]
                           FOR i IN range(1, len(toks))]) AS b
            FROM toks
        )
        GROUP BY doc_id, b
    ),
    bs AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               max(c) AS top_big
        FROM bc GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           distinct_frac, top_token_frac, top_bigram_frac,
           (distinct_frac >= 0.25 AND top_bigram_frac <= 0.2) AS keep
    FROM (
        SELECT ts.doc_id AS doc_id, ts.n_tokens AS n_tokens,
               round(ts.n_distinct * 1.0 / ts.n_tokens, 4) AS distinct_frac,
               round(ts.top_tok * 1.0 / ts.n_tokens, 4) AS top_token_frac,
               round(bs.top_big * 1.0 / bs.n_bigrams, 4) AS top_bigram_frac
        FROM ts JOIN bs ON ts.doc_id = bs.doc_id
    )
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", _WS).alias("toks"))
    # Token/bigram identity is internal-only here (the output is per-doc
    # fractions), so both distinct-count exchanges key on 8-byte
    # xxhash64 fingerprints instead of the raw strings (r15, guide
    # §2.3); the bigram never materializes as a concat string at all —
    # the pair hashes directly (tokens are whitespace-split, so the
    # (t, next) pair is exactly the old 't next' concat's identity).
    ts = (
        toks.select("doc_id", F.explode("toks").alias("t"))
        .select("doc_id", F.xxhash64("t").alias("th"))
        .groupBy("doc_id", "th")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    bs = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(t, i) -> xxhash64(t, toks[i + 1]))"
                )
            ).alias("bh"),
        )
        .groupBy("doc_id", "bh")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_big"))
    )
    scored = ts.join(bs, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct") * 1.0 / F.col("n_tokens"), 4).alias(
            "distinct_frac"
        ),
        F.round(F.col("top_tok") * 1.0 / F.col("n_tokens"), 4).alias(
            "top_token_frac"
        ),
        F.round(F.col("top_big") * 1.0 / F.col("n_bigrams"), 4).alias(
            "top_bigram_frac"
        ),
    )
    return scored.withColumn(
        "keep",
        (F.col("distinct_frac") >= 0.25) & (F.col("top_bigram_frac") <= 0.2),
    )


# ---------------------------------------------- text_quality_classifier
# Model-based quality scoring (the fastText-classifier filter of
# CCNet/LLaMA/DCLM, distinct from text_gopher_quality's hand rules): a
# linear model over HASHED token-bigram features — score(doc) = mean
# over bigrams of w[h(bigram) mod B] — with the B=64 weight vector
# inlined as a literal array (a trained model would be broadcast or
# inlined exactly the same way; these weights are a deterministic
# pseudo-random stand-in so the oracle can recompute them).
#
# Scale shape: ONE narrow codegen'd pass — pair the tokens, hash each
# pair to its bucket, fold the weight lookups left-to-right with
# aggregate(); no explode, no shuffle, no Python. The md5-based bucket
# is the same engine-portable hash the sampling/dedup families use, so
# the DuckDB oracle replays the model bit-for-bit (both engines fold
# doubles in bigram order).
_QC_B = 64
# INTEGER weights in [-6, 6] (pseudo-random, zero-mean-ish): the bigram
# fold then accumulates EXACTLY in int64 and the only float op is one
# final int/int division — the same double bit-for-bit in both engines,
# with no representable round-at-6dp ties (a float weight vector hit one:
# sum/n landed on exactly -13/128 and the engines' half-rounding split).
_QC_W = [(37 * b + 17) % 13 - 6 for b in range(_QC_B)]


@_q(
    "text_quality_classifier",
    f"""
    WITH t AS (
      SELECT doc_id,
             [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))] AS prs
      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '{_WS}') AS ws
            FROM documents)
      WHERE len(ws) >= 2),
    s AS (
      SELECT doc_id, len(prs) AS n_pairs,
             round(list_sum([
                 {_QC_W}[CAST(('0x' || substr(md5(pr), 1, 8))::BIGINT % {_QC_B}
                              AS BIGINT) + 1]
                 FOR pr IN prs]) / len(prs), 6) AS score
      FROM t)
    SELECT doc_id, n_pairs, score,
           CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
    FROM s
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w_lit = "array(" + ", ".join(str(w) for w in _QC_W) + ")"
    pairs = (
        f"zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
        f"(w1, w2) -> concat(w1, ' ', w2))"
    )
    lookup = (
        f"CAST(element_at({w_lit}, CAST(CAST(conv(substring(md5(pr), 1, 8), "
        f"16, 10) AS BIGINT) % {_QC_B} AS INT) + 1) AS BIGINT)"
    )
    return (
        d.select(
            "doc_id", F.split(F.lower("text"), _WS).alias("ws")
        )
        .filter(F.expr("size(ws) >= 2"))
        .select("doc_id", F.expr(pairs).alias("prs"))
        .select(
            "doc_id",
            F.expr("size(prs)").cast("bigint").alias("n_pairs"),
            F.round(
                F.expr(
                    f"aggregate(prs, 0L, (acc, pr) -> acc + {lookup})"
                )
                / F.expr("size(prs)"),
                6,
            ).alias("score"),
        )
        .withColumn(
            "label",
            F.when(F.col("score") >= 0, "keep").otherwise("drop"),
        )
    )


# ------------------------------------------------- text_vocab_coverage
# Vocabulary coverage curve — the tokenizer-training precursor: the top-V
# word vocabulary by corpus frequency plus, at each rank, the cumulative
# fraction of all corpus tokens the vocabulary up to that rank covers
# (the curve that answers "how big must the vocab be for ≥99% coverage /
# what OOV rate does V=32k buy"). Deterministic ordering: count desc,
# then word — ties can't reorder between engines.
#
# Scale shape: the corpus collapses to the distinct-word table via a
# two-phase hash aggregate (map-side partials absorb hot stopwords before
# the one corpus-side exchange); the top-V cut is a distributed
# TakeOrderedAndProject (per-partition top-V + merge — the global VOCAB
# SORT never happens); the corpus-total branch reuses the same word
# aggregate; the cumulative window then runs over exactly V rows in one
# trivial task. Nothing after the word agg touches corpus-sized data.
_VOCAB_V = 100


@_q(
    "text_vocab_coverage",
    f"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
      FROM documents),
    counts AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    tot AS (SELECT sum(n) AS t FROM counts),
    top AS (
      SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rank
      FROM counts QUALIFY rank <= {_VOCAB_V})
    SELECT rank, w AS word, CAST(n AS BIGINT) AS n_occ,
           round(sum(n) OVER (ORDER BY rank
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) * 1.0 / t, 6) AS cum_share
    FROM top CROSS JOIN tot
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), _WS)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "w").limit(_VOCAB_V)
    tot = counts.agg(F.sum("n").alias("t"))
    wspec = (
        Window.orderBy(F.col("n").desc(), "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "w"))
            .cast("bigint")
            .alias("rank"),
            F.col("w").alias("word"),
            F.col("n").cast("bigint").alias("n_occ"),
            F.round(F.sum("n").over(wspec) / F.col("t"), 6).alias("cum_share"),
        )
    )


# ------------------------------------------------------ text_code_detect
# Code-vs-prose detection — the router every pretraining corpus runs to
# split source code from natural language (different tokenizers,
# different mixture weights, different dedup settings): per doc, count
# the structural signals (statement-terminated lines, indented lines,
# programming keywords, symbol density) and flag docs where they stack.
# All signals are exact integers or floored ppm, so the oracle matches
# bit-for-bit; the verdict is a flag, not a filter (the
# curation_verdict auditability contract).
#
# Scale shape: ONE narrow codegen'd pass — line splitting and keyword
# counts are array/regex expressions inside whole-stage codegen, no
# explode (the per-line predicates run INSIDE filter()/size() on the
# split array), no shuffle, no Python; scan pruned to doc_id/text.
_CODE_KW = (
    r"\b(def|class|import|return|void|int|function|var|const|"
    r"public|static|struct|elif|lambda)\b"
)
_CODE_SYMS = r"[{}();=<>\[\]]"
_CODE_MIN_SYM_PPM = 40_000   # >= 4% symbol chars, or
_CODE_MIN_KW = 3             # >= 3 keywords + >= 2 indented lines
_CODE_MIN_INDENT = 2


@_q(
    "text_code_detect",
    f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(text, chr(10)),
                                  x -> x LIKE '%;' OR x LIKE '%{{'
                                       OR x LIKE '%}}')) AS BIGINT)
               AS stmt_lines,
             CAST(len(list_filter(string_split(text, chr(10)),
                                  x -> x LIKE '    %'
                                       OR x LIKE chr(9) || '%')) AS BIGINT)
               AS indent_lines,
             CAST(len(regexp_extract_all(text, '{_CODE_KW}')) AS BIGINT)
               AS kw_hits,
             CAST(floor(1000000.0
                        * len(regexp_extract_all(text, '{_CODE_SYMS}'))
                        / length(text)) AS BIGINT) AS sym_ppm
      FROM documents WHERE length(text) > 0)
    SELECT doc_id, n_lines, stmt_lines, indent_lines, kw_hits, sym_ppm,
           (sym_ppm >= {_CODE_MIN_SYM_PPM}
            OR (kw_hits >= {_CODE_MIN_KW}
                AND indent_lines >= {_CODE_MIN_INDENT})) AS is_code
    FROM s
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lines = F.split("text", "\n")
    s = d.filter(F.length("text") > 0).select(
        "doc_id",
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda x: x.endswith(";") | x.endswith("{") | x.endswith("}"),
            )
        )
        .cast("bigint")
        .alias("stmt_lines"),
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("    ") | x.startswith("\t"),
            )
        )
        .cast("bigint")
        .alias("indent_lines"),
        # idx=0 (whole match): the keyword pattern HAS a group, and the
        # symbol class has none — Spark's default idx=1 would throw on
        # the first symbol match.
        F.size(F.regexp_extract_all("text", F.lit(_CODE_KW), F.lit(0)))
        .cast("bigint")
        .alias("kw_hits"),
        F.floor(
            1000000.0
            * F.size(F.regexp_extract_all("text", F.lit(_CODE_SYMS), F.lit(0)))
            / F.length("text")
        )
        .cast("bigint")
        .alias("sym_ppm"),
    )
    return s.withColumn(
        "is_code",
        (F.col("sym_ppm") >= _CODE_MIN_SYM_PPM)
        | (
            (F.col("kw_hits") >= _CODE_MIN_KW)
            & (F.col("indent_lines") >= _CODE_MIN_INDENT)
        ),
    )


# --- text_entropy: character-distribution Shannon entropy (bits/char) over
# the letter alphabet — the classic gibberish / keyboard-mash / repeated-
# char filter (low entropy = degenerate text, near-uniform entropy =
# random noise; prose sits in a stable band). Per-letter counts come from
# 26 length(replace(...)) codegen'd passes — linear in doc length, ZERO
# Python, and the whole operator is one narrow projection over the scan
# (no shuffle anywhere; pinned). Engine parity: the SAME Python loop emits
# the identical expression text for Spark and DuckDB (counts are exact
# integers, the -p*ln(p) chain folds a..z left-to-right in double, ln(2)
# is a shared literal), and the score is rounded to 4dp BEFORE the keep
# gate compares it, so flag and score agree across engines by
# construction.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_LN2 = "0.6931471805599453"


def _entropy_sql() -> tuple[str, str, str, str]:
    """(count projections, total, distinct, entropy) — dialect-common."""
    cnts = ", ".join(
        f"length(text) - length(replace(text, '{c}', '')) AS c_{c}"
        for c in _ALPHA
    )
    tot = " + ".join(f"c_{c}" for c in _ALPHA)
    distinct = " + ".join(
        f"(CASE WHEN c_{c} > 0 THEN 1 ELSE 0 END)" for c in _ALPHA
    )
    terms = " + ".join(
        f"(CASE WHEN c_{c} > 0 THEN -(c_{c} * 1.0 / n_letters)"
        f" * ln(c_{c} * 1.0 / n_letters) ELSE 0.0 END)"
        for c in _ALPHA
    )
    entropy = f"round(({terms}) / {_LN2}, 4)"
    return cnts, tot, distinct, entropy


@_q(
    "text_entropy",
    """
    WITH cnts AS (SELECT doc_id, {cnts} FROM documents),
    tot AS (SELECT *, {tot} AS n_letters FROM cnts)
    SELECT doc_id, n_letters,
           {distinct} AS distinct_chars,
           {entropy} AS entropy_bits,
           {entropy} >= 4.0 AS keep
    FROM tot
    """.format(
        cnts=_entropy_sql()[0],
        tot=_entropy_sql()[1],
        distinct=_entropy_sql()[2],
        entropy=_entropy_sql()[3],
    ),
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, tot, distinct, entropy = _entropy_sql()
    d = load(spark, sf_dir, "documents")
    return (
        d.selectExpr("doc_id", *[
            f"length(text) - length(replace(text, '{c}', '')) AS c_{c}"
            for c in _ALPHA
        ])
        .selectExpr("*", f"{tot} AS n_letters")
        .selectExpr(
            "doc_id",
            "n_letters",
            f"{distinct} AS distinct_chars",
            f"{entropy} AS entropy_bits",
            f"{entropy} >= 4.0 AS keep",
        )
    )


# --- text_pmi_topk: top collocations by pointwise mutual information —
# PMI(w1,w2) = ln(c12 * N / (c1 * c2)) over adjacent-pair and unigram
# counts, with a min-count floor so rare accidental pairs can't dominate
# (the classic collocation/phrase-mining measure; raw bigram counts —
# text_bigram_topk — only surface FREQUENT pairs, PMI surfaces BOUND
# ones). Scale shape: two corpus passes by construction (pair counts and
# word counts are different grains of the token stream; N derives from
# the unigram relation, no third pass), each a map-side-partial hash agg
# whose exchange is vocabulary-sized; the unigram relation joins back
# twice BROADCAST (w1, w2); the final cut is a TakeOrderedAndProject on
# the ROUNDED score (round-before-sort keeps rank order engine-identical)
# with the pair text as tie-break. Counts are exact ints; the PMI
# expression has identical shape both engines.
_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@_q(
    "text_pmi_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '{_WS}') AS t
      FROM documents),
    uni AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(t) AS w FROM toks) GROUP BY w),
    n AS (SELECT sum(c) AS n_tok FROM uni),
    pairs AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c12
      FROM toks, range(1, 10000) r(i)
      WHERE i < len(t)
      GROUP BY 1, 2
      HAVING count(*) >= {_PMI_MIN_COUNT})
    SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
           round(ln(p.c12 * 1.0 * n.n_tok / (u1.c * 1.0 * u2.c)), 6)
               AS pmi
    FROM pairs p
    JOIN uni u1 ON u1.w = p.w1
    JOIN uni u2 ON u2.w = p.w2
    CROSS JOIN n
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT {_PMI_TOPK}
    """,
)
def text_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", _WS)
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        # feeds three branches (both join probes + the N total):
        # vocabulary-sized, materialize once
        .localCheckpoint(eager=False)
    )
    n = uni.agg(F.sum("c").alias("n_tok"))
    pairs = (
        d.select(
            F.explode(
                F.expr(
                    f"""
                    zip_with(slice(split(text, '{_WS_SQL}'), 1,
                                   size(split(text, '{_WS_SQL}')) - 1),
                             slice(split(text, '{_WS_SQL}'), 2,
                                   size(split(text, '{_WS_SQL}')) - 1),
                             (a, b) -> struct(a AS w1, b AS w2))
                    """
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= _PMI_MIN_COUNT)
    )
    u1 = uni.alias("u1")
    u2 = uni.alias("u2")
    return (
        pairs.join(F.broadcast(u1), F.col("w1") == F.col("u1.w"))
        .join(F.broadcast(u2), F.col("w2") == F.col("u2.w"))
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.round(
                F.log(
                    F.col("c12") * 1.0 * F.col("n_tok")
                    / (F.col("u1.c") * 1.0 * F.col("u2.c"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# -------------------------------------------------------- text_zipf_fit
# Zipf's-law fit per language: OLS slope/intercept/R^2 of ln(freq) vs
# ln(rank) over each language's top-ranked vocabulary. Natural corpora
# sit near slope -1; token salad, boilerplate floods, and synthetic
# spam bend the curve — this is the distributional twin of the
# per-document entropy gate (a corpus-level drift monitor, run per
# ingest batch).
#
# Scale shape: ONE vocabulary-sized exchange (map-side partial counts),
# then the per-lang rank cut rides a WindowGroupLimit (each task keeps
# its local top-200 BEFORE the shuffle — the full per-lang vocabulary is
# never sorted); everything after is <= 200 rows per language. Engine
# parity: ranks and counts are exact integers, so ln() doubles are
# bit-identical; every OLS moment is a DECIMAL sum of round(term, 9)
# (partitioning-order-proof); the closed-form slope then evaluates the
# SAME double expression in both engines and rounds to 6dp.
_ZIPF_R = 200
_ZIPF_MOMS = (
    ("sx", "lx"), ("sy", "ly"),
    ("sxy", "lx * ly"), ("sxx", "lx * lx"), ("syy", "ly * ly"),
)
_ZIPF_SUMS = ", ".join(
    f"CAST(sum(CAST(round({expr}, 9) AS DECIMAL(20,9))) AS DOUBLE) AS {nm}"
    for nm, expr in _ZIPF_MOMS
)
_ZIPF_SLOPE = "(k * sxy - sx * sy) / (k * sxx - sx * sx)"
_ZIPF_R2 = (
    "((k * sxy - sx * sy) * (k * sxy - sx * sy))"
    " / ((k * sxx - sx * sx) * (k * syy - sy * sy))"
)


@_q(
    "text_zipf_fit",
    f"""
    WITH tok AS (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '{_WS}')) AS w
      FROM documents),
    counts AS (SELECT lang, w, count(*) AS n FROM tok GROUP BY lang, w),
    ranked AS (
      SELECT lang, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) AS r
      FROM counts QUALIFY r <= {_ZIPF_R}),
    pts AS (SELECT lang, ln(r) AS lx, ln(n) AS ly FROM ranked),
    moms AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS k, {_ZIPF_SUMS}
      FROM pts GROUP BY lang)
    SELECT lang, CAST(k AS BIGINT) AS n_ranks,
           round({_ZIPF_SLOPE}, 6) AS zipf_slope,
           round((sy - ({_ZIPF_SLOPE}) * sx) / k, 6) AS zipf_intercept,
           round({_ZIPF_R2}, 6) AS fit_r2
    FROM moms
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split(F.lower("text"), _WS)).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "w")
    ranked = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _ZIPF_R)
        .selectExpr("lang", "ln(r) AS lx", "ln(n) AS ly")
    )
    moms = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        *[
            F.expr(
                f"CAST(sum(CAST(round({expr}, 9) AS DECIMAL(20,9)))"
                f" AS DOUBLE)"
            ).alias(nm)
            for nm, expr in _ZIPF_MOMS
        ],
    )
    return moms.selectExpr(
        "lang",
        "CAST(k AS BIGINT) AS n_ranks",
        f"round({_ZIPF_SLOPE}, 6) AS zipf_slope",
        f"round((sy - ({_ZIPF_SLOPE}) * sx) / k, 6) AS zipf_intercept",
        f"round({_ZIPF_R2}, 6) AS fit_r2",
    )


# ----------------------------------------------- text_boilerplate_prefix
# Boilerplate detection by shared document PREFIX: the top repeated
# 5-token openings per source with their document share — the
# header/nav/cookie-banner detector every web-corpus pipeline runs
# before quality scoring (boilerplate-led docs depress every downstream
# LM metric and near-dup score; the fix is stripping the prefix, and
# the first step is measuring it). Suffix boilerplate is the same query
# with slice from the end.
#
# Scale shape: the prefix is a narrow codegen'd projection (slice of
# the split array — no explode); ONE (source, prefix) exchange with
# map-side partials; the per-source top-3 rides a WindowGroupLimit over
# that aggregate. Counts exact; share = int/int rounded 6dp.
_BP_K = 5
_BP_TOP = 3
_BP_MIN = 2


@_q(
    "text_boilerplate_prefix",
    f"""
    WITH pre AS (
      SELECT source,
             array_to_string((regexp_split_to_array(lower(text),
                              '{_WS}'))[1:{_BP_K}], ' ') AS prefix
      FROM documents
      WHERE len(regexp_split_to_array(text, '{_WS}')) >= {_BP_K}),
    tot AS (SELECT source, count(*) AS nd FROM pre GROUP BY source),
    cnt AS (
      SELECT source, prefix, count(*) AS n_docs
      FROM pre GROUP BY source, prefix
      HAVING count(*) >= {_BP_MIN}),
    ranked AS (
      SELECT source, prefix, n_docs,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_docs DESC, prefix) AS rnk
      FROM cnt)
    SELECT r.source, r.prefix, CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(r.rnk AS INTEGER) AS rnk,
           round(CAST(r.n_docs AS DOUBLE) / t.nd, 6) AS doc_share
    FROM ranked r JOIN tot t ON r.source = t.source
    WHERE r.rnk <= {_BP_TOP}
    """,
)
def text_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    pre = (
        d.select(
            "source", F.split(F.lower("text"), _WS).alias("toks")
        )
        .filter(F.size("toks") >= _BP_K)
        .select(
            "source",
            F.array_join(F.slice("toks", 1, _BP_K), " ").alias("prefix"),
        )
        .localCheckpoint(eager=False)
    )
    tot = pre.groupBy("source").agg(F.count(F.lit(1)).alias("nd"))
    cnt = (
        pre.groupBy("source", "prefix")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _BP_MIN)
    )
    w = Window.partitionBy("source").orderBy(F.col("n_docs").desc(), "prefix")
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BP_TOP)
        .join(F.broadcast(tot), "source")
        .select(
            "source", "prefix",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("rnk").cast("int").alias("rnk"),
            F.round(F.col("n_docs").cast("double") / F.col("nd"), 6).alias(
                "doc_share"
            ),
        )
    )


# -------------------------------------------- text_tokenizer_fertility
# Tokenizer fertility per language: subword tokens produced per
# whitespace word (Σ BPE-ish tokens / Σ words) plus the per-doc p90 —
# THE multilingual tokenizer-equity metric (XLM-R/NLLB report it;
# fertility >> 1 means a language pays more sequence length per word,
# skewing compute budgets and truncation rates — feeds directly into
# sample_temperature / corpus_token_budget decisions). Scale shape: one
# narrow pass computes both counts per doc (regex counts inside
# codegen, no explode), ONE lang-grain exchange folds exact integer
# sums; the p90 is an exact interpolated percentile over the per-doc
# ratio (agg_exact_percentile contract). Ratios are int/int divisions
# of identical doubles, rounded 4dp.
@_q(
    "text_tokenizer_fertility",
    f"""
    WITH per_doc AS (
      SELECT lang,
             len(regexp_split_to_array(text, '{_WS}')) AS ws,
             len(regexp_extract_all(text, '{_BPE}')) AS bpe
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS n_words,
           CAST(sum(bpe) AS BIGINT) AS n_subwords,
           round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 4) AS fertility,
           round(quantile_cont(CAST(bpe AS DOUBLE) / ws, 0.9), 4)
               AS p90_doc_fertility
    FROM per_doc GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", _WS)).alias("ws"),
        F.regexp_count("text", F.lit(_BPE)).alias("bpe"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("n_words"),
        F.sum("bpe").cast("bigint").alias("n_subwords"),
        F.round(
            F.sum("bpe").cast("double") / F.sum("ws"), 4
        ).alias("fertility"),
        F.round(
            F.expr("percentile(CAST(bpe AS DOUBLE) / ws, 0.9)"), 4
        ).alias("p90_doc_fertility"),
    )


# ------------------------------------------- text_quality_threshold_sweep
# Classifier-threshold sweep: the keep-rate and kept-character share at
# five candidate score cutoffs, per language — the calibration curve a
# team reads before committing a quality threshold ("−1.0 keeps 92% of
# German but 61% of English"; thresholds move per language or the mix
# shifts silently). Reuses text_quality_classifier's hashed-bigram
# score expression verbatim, so the sweep measures the REGISTERED
# filter, not a lookalike.
#
# Scale shape: one narrow scoring pass (the classifier's pinned
# zero-shuffle shape) + one lang-grain fold where all five thresholds
# are CASE sums inside the same aggregate — sweeping costs one scan,
# not five. Exact int counts; shares int/int rounded 6dp.
_SWEEP_TS = (-2.0, -1.0, 0.0, 1.0, 2.0)


@_q(
    "text_quality_threshold_sweep",
    f"""
    WITH t AS (
      SELECT lang, n_chars,
             [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))] AS prs
      FROM (SELECT lang, n_chars,
                   regexp_split_to_array(lower(text), '{_WS}') AS ws
            FROM documents)
      WHERE len(ws) >= 2),
    s AS (
      SELECT lang, n_chars,
             round(list_sum([
                 {_QC_W}[CAST(('0x' || substr(md5(pr), 1, 8))::BIGINT % {_QC_B}
                              AS BIGINT) + 1]
                 FOR pr IN prs]) / len(prs), 6) AS score
      FROM t)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           {", ".join(
               f"round(CAST(sum(CASE WHEN score >= {t} THEN 1 ELSE 0 END)"
               f" AS DOUBLE) / count(*), 6) AS keep_at_{i}"
               for i, t in enumerate(_SWEEP_TS))},
           {", ".join(
               f"round(CAST(sum(CASE WHEN score >= {t} THEN n_chars"
               f" ELSE 0 END) AS DOUBLE) / sum(n_chars), 6)"
               f" AS chars_at_{i}"
               for i, t in enumerate(_SWEEP_TS))}
    FROM s GROUP BY lang
    """,
)
def text_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w_lit = "array(" + ", ".join(str(w) for w in _QC_W) + ")"
    pairs = (
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
        "(w1, w2) -> concat(w1, ' ', w2))"
    )
    lookup = (
        f"CAST(element_at({w_lit}, CAST(CAST(conv(substring(md5(pr), 1, 8), "
        f"16, 10) AS BIGINT) % {_QC_B} AS INT) + 1) AS BIGINT)"
    )
    s = (
        d.select(
            "lang", "n_chars", F.split(F.lower("text"), _WS).alias("ws")
        )
        .filter(F.expr("size(ws) >= 2"))
        .select(
            "lang",
            "n_chars",
            F.round(
                F.expr(
                    f"aggregate({pairs}, 0L, (acc, pr) -> acc + {lookup})"
                )
                / F.expr("size(ws) - 1"),
                6,
            ).alias("score"),
        )
    )
    keeps = [
        F.round(
            F.sum(F.when(F.col("score") >= t, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias(f"keep_at_{i}")
        for i, t in enumerate(_SWEEP_TS)
    ]
    chars = [
        F.round(
            F.sum(
                F.when(F.col("score") >= t, F.col("n_chars")).otherwise(0)
            ).cast("double")
            / F.sum("n_chars"),
            6,
        ).alias(f"chars_at_{i}")
        for i, t in enumerate(_SWEEP_TS)
    ]
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"), *keeps, *chars
    )


# ----------------------------------------------------- text_readability
# Flesch reading-ease scoring: 206.835 − 1.015·(words/sentences) −
# 84.6·(syllables/words), with syllables approximated by vowel-group
# counts (the standard regex proxy) and sentences by terminal
# punctuation runs — the readability gate that routes text to
# grade-level buckets (curriculum ordering, audience filters, and the
# classic "too-hard/too-trivial" tails cut). Bucketing follows the
# published FRE bands. All three counts are exact regex integers, so
# the score is one identical double expression in both engines, rounded
# 4dp BEFORE the band CASE (round-before-gate).
#
# Scale shape: ONE narrow codegen'd pass (three regexp counts + one
# CASE — no explode, no shuffle before the lang-grain fold).
_FRE_SENT = "[.!?]+"
_FRE_SYL = "[aeiouyAEIOUY]+"


@_q(
    "text_readability",
    f"""
    WITH c AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(text, '{_WS}')) AS w,
             greatest(len(regexp_extract_all(text, '{_FRE_SENT}')), 1)
               AS s,
             greatest(len(regexp_extract_all(text, '{_FRE_SYL}')), 1)
               AS y
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
             round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                   - 84.6 * (CAST(y AS DOUBLE) / w), 4) AS fre
      FROM c WHERE w > 0)
    SELECT lang,
           CASE WHEN fre >= 70 THEN 'easy'
                WHEN fre >= 50 THEN 'standard'
                WHEN fre >= 30 THEN 'difficult'
                ELSE 'very_difficult' END AS band,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(round(fre, 4) AS DECIMAL(18,4)))
                      AS DOUBLE) / count(*), 4) AS mean_fre
    FROM scored GROUP BY lang, band
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", _WS)).alias("w"),
        F.greatest(
            F.regexp_count("text", F.lit(_FRE_SENT)), F.lit(1)
        ).alias("s"),
        F.greatest(
            F.regexp_count("text", F.lit(_FRE_SYL)), F.lit(1)
        ).alias("y"),
    )
    scored = c.filter(F.col("w") > 0).select(
        "lang",
        F.round(
            206.835
            - 1.015 * (F.col("w").cast("double") / F.col("s"))
            - 84.6 * (F.col("y").cast("double") / F.col("w")),
            4,
        ).alias("fre"),
    )
    band = (
        F.when(F.col("fre") >= 70, "easy")
        .when(F.col("fre") >= 50, "standard")
        .when(F.col("fre") >= 30, "difficult")
        .otherwise("very_difficult")
    )
    return scored.groupBy("lang", band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.expr(
                "CAST(sum(CAST(round(fre, 4) AS DECIMAL(18,4))) AS DOUBLE)"
            )
            / F.count(F.lit(1)),
            4,
        ).alias("mean_fre"),
    )


# ---------------------------------------------------- text_blocklist_filter
# Wordlist gate — the brand-safety / NSFW first pass every web corpus
# runs before model-based toxicity scoring (wordlists are crude but
# cheap, transparent, and auditable; the hit COUNT feeds the threshold,
# never a binary substring match, so "Scunthorpe" class false positives
# are bounded by the whole-token match). The list here is a neutral
# deterministic stand-in (a real list broadcasts or inlines the same
# way — the classifier-weight contract). Per doc: whole-token hits +
# distinct blocked terms + the keep verdict; per-lang rollup keeps the
# output audit-sized.
#
# Scale shape: ONE narrow pass — the hit count is a list_filter over
# the already-split token array (no explode, no join; the blocklist is
# an inlined literal set exactly like the stopword profiles); rollup is
# a two-phase lang fold.
_BLOCK_TERMS = ("vortex", "quark", "zephyr", "umbra")
_BLOCK_MAX_HITS = 2


@_q(
    "text_blocklist_filter",
    f"""
    WITH s AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(lower(text), '{_WS}'),
                             t -> t IN {_sql_in(_BLOCK_TERMS)})) AS hits,
             len(list_distinct(
                 list_filter(regexp_split_to_array(lower(text), '{_WS}'),
                             t -> t IN {_sql_in(_BLOCK_TERMS)}))) AS terms
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(hits) AS BIGINT) AS total_hits,
           CAST(max(terms) AS INTEGER) AS max_distinct_terms,
           CAST(sum(CASE WHEN hits <= {_BLOCK_MAX_HITS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM s GROUP BY lang
    """,
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    terms_lit = ", ".join(f"'{t}'" for t in _BLOCK_TERMS)
    hits_expr = (
        f"size(filter(split(lower(text), '{_WS}'),"
        f" t -> t IN ({terms_lit})))"
    )
    terms_expr = (
        f"size(array_distinct(filter(split(lower(text), '{_WS}'),"
        f" t -> t IN ({terms_lit}))))"
    )
    s = d.selectExpr(
        "lang", f"{hits_expr} AS hits", f"{terms_expr} AS terms"
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("hits").cast("bigint").alias("total_hits"),
        F.max("terms").cast("int").alias("max_distinct_terms"),
        F.sum(
            F.when(F.col("hits") <= _BLOCK_MAX_HITS, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_kept"),
    )


# ------------------------------------------------- text_bpe_merge_step
# One distributed BPE merge iteration — the tokenizer-training primitive
# (Sennrich et al. 2016): count adjacent symbol-pair frequencies over
# the corpus, choose the most frequent pair (ties: lexicographically
# first), apply the merge, and return the top-20 pair counts of the NEW
# symbol state plus the chosen merge. Fits the established
# iterate-with-driver-feedback contract of emb_kmeans_step /
# emb_power_iteration: the driver reads `merged_pair`, appends it to its
# merge list, and re-derives the next state; this id runs iteration 1
# from scratch so the oracle is self-contained.
#
# Scale design (the classic BPE-trainer optimization): pair counting
# runs at VOCAB grain, not corpus grain — words collapse to (word, freq)
# first, so the segmentation/explode cost is O(|vocab|) and the corpus
# contributes only a word-count shuffle whose map-side partials are
# near-total (Zipf). A segmentation is a space-joined symbol string;
# applying a merge is one codegen'd `replace` (left-to-right,
# non-overlapping — exactly BPE's scan order). The vocab-grain frame is
# localCheckpointed once: it is read twice (pair counting + re-segment)
# and is tiny (distinct words), so re-deriving it from the corpus scan
# would double the only expensive pass.
_BPE_PAIRS = (
    "CASE WHEN size(sy) >= 2 THEN transform(sequence(0, size(sy) - 2),"
    " i -> concat(sy[i], ' ', sy[i+1])) ELSE array() END"
)


@_q(
    "text_bpe_merge_step",
    r"""
    WITH words AS (
      SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
    ), vocab AS (
      SELECT word, count(*) AS freq FROM words WHERE word <> '' GROUP BY 1
    ), seg AS (
      SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS s, freq
      FROM vocab
    ), p1 AS (
      SELECT unnest(list_transform(range(1, len(sy)),
                 i -> sy[i] || ' ' || sy[i+1])) AS pair, freq
      FROM (SELECT string_split(s, ' ') AS sy, freq FROM seg)
    ), pc1 AS (
      SELECT pair, sum(freq) AS cnt FROM p1 GROUP BY 1
    ), best AS (
      SELECT pair AS bp FROM pc1 ORDER BY cnt DESC, pair ASC LIMIT 1
    ), seg2 AS (
      SELECT replace(s, (SELECT bp FROM best),
                     replace((SELECT bp FROM best), ' ', '')) AS s, freq
      FROM seg
    ), p2 AS (
      SELECT unnest(list_transform(range(1, len(sy)),
                 i -> sy[i] || ' ' || sy[i+1])) AS pair, freq
      FROM (SELECT string_split(s, ' ') AS sy, freq FROM seg2)
    ), pc2 AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p2 GROUP BY 1
    )
    SELECT (SELECT bp FROM best) AS merged_pair, pair, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT)
               AS rnk
    FROM pc2 QUALIFY rnk <= 20
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", _WS)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # vocab-grain segmentation, read twice below (plan-pinned small)
    seg = vocab.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("s"), "freq"
    ).localCheckpoint()

    def _pair_counts(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("sy", F.split("s", " "))
            .select(F.explode(F.expr(_BPE_PAIRS)).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )

    # driver-feedback scalar (the emb_kmeans_step literal-centroid
    # pattern): the winning pair is ONE metadata-sized row — inlining it
    # as a literal keeps the merge pass join-free (a broadcast crossJoin
    # would plan a BroadcastNestedLoopJoin for the same effect)
    top = (
        _pair_counts(seg)
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(1)
        .collect()
    )
    if not top:
        # No word has >= 2 symbols (or the corpus is empty): the oracle's
        # scalar subquery yields NULL, its replace() NULLs the
        # segmentation, and the downstream unnest emits no rows — mirror
        # that with an empty frame of the same schema (ADVICE r14:
        # collect()[0] raised IndexError here; bpe_train already guards).
        return spark.createDataFrame(
            [], "merged_pair string, pair string, cnt bigint, rnk bigint"
        )
    best = top[0]["pair"]
    # Column-API replace, not SQL-string splicing: a winning pair
    # containing a backslash (or any future metachar) is passed as a
    # bound literal instead of being re-lexed by Spark's SQL parser
    # (ADVICE r14: the spliced form double-escaped quotes but not
    # backslashes).
    seg2 = seg.select(
        F.lit(best).alias("merged_pair"),
        F.replace(
            F.col("s"), F.lit(best), F.lit(best.replace(" ", ""))
        ).alias("s"),
        "freq",
    )
    pc2 = (
        seg2.withColumn("sy", F.split("s", " "))
        .select("merged_pair", F.explode(F.expr(_BPE_PAIRS)).alias("pair"),
                "freq")
        .groupBy("merged_pair", "pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return (
        pc2.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> list[tuple[str, str]]:
    """Full distributed BPE training: iterate ``text_bpe_merge_step``'s
    core with the driver feeding each chosen merge back (the
    ``label_propagate_min`` / ``emb_kmeans_step`` iterate-with-driver-
    feedback contract). Returns the ordered merge list — the artifact a
    tokenizer ships.

    Scale shape per iteration: ONE vocab-grain pair aggregate (the
    corpus was collapsed to (word, freq) once, up front) + a 1-row
    driver collect + one codegen'd ``replace`` over the segmentation
    strings. The segmentation frame is re-localCheckpointed each
    iteration so lineage stays O(1) instead of accumulating ``n_merges``
    chained projections (the label-propagation lesson). Ties break
    lexicographically, so the merge sequence is deterministic and
    engine-independent — pinned against a pure-Python reference trainer
    in tests/test_round13_fixes.py.
    """
    d = load(spark, sf_dir, "documents")
    seg = (
        d.select(F.explode(F.split("text", _WS)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("s"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            seg.withColumn("sy", F.split("s", " "))
            .select(F.explode(F.expr(_BPE_PAIRS)).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol: nothing left to merge
        pair = top[0]["pair"]
        left, right = pair.split(" ", 1)
        merges.append((left, right))
        # Boundary-anchored replacement: after merge 1 symbols are
        # multi-char, and a plain substring replace could match across a
        # symbol boundary ('tx ab' contains 'x ab' — merging it would
        # corrupt the 'tx' symbol). Anchoring both ends to
        # start/space/end keeps matches on symbol boundaries; the regex
        # engine's left-to-right non-overlapping scan IS BPE's merge
        # order. (The registered single-step op needs no anchors: at
        # step 1 every symbol is one char, so a 'x y' pattern can only
        # match at even offsets = boundaries.)
        import re as _re

        pat = "(?<=^| )" + _re.escape(pair) + "(?=$| )"
        repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        seg = seg.select(
            F.regexp_replace("s", pat, repl).alias("s"), "freq"
        ).localCheckpoint()
    return merges
