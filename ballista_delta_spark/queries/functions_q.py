"""Scalar function families — SURVEY.md §2.8 ids F1-F11 + §2.9 T1.

Reference parity: DataFusion 50 registers ~300 scalar functions via reference
src/lib.rs:36 (``datafusion-functions``, Cargo.lock:2124; nested, 2187). Spark's
built-in function set is a superset; every query here stays JVM-side (no UDFs),
inside whole-stage codegen. Name mapping (DataFusion → Spark) follows the
SURVEY §2.8 table, e.g. strpos→instr, array_to_string→array_join,
generate_series→sequence.

Oracle notes: DuckDB 1.0 lacks initcap/overlay/regexp_count/find_in_set —
the oracle SQL emulates those so the *Spark* surface is still exercised.
Array/struct/map outputs are flattened (joined/sorted) so the value hash is
deterministic and representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)


# --- F1 fn_string: the big string-function sweep over part names.
@_q(
    "fn_string",
    """
    SELECT p_partkey,
           upper(p_name) AS name_uc,
           lower(p_brand) AS brand_lc,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_pre,
           trim(concat('  ', p_name, '  ')) AS name_trim,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_us,
           reverse(p_brand) AS brand_rev,
           repeat(left(p_brand, 2), 2) AS brand_rep,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           rpad(left(p_name, 3), 6, '.') AS name_rpad,
           strpos(p_name, 'a') AS first_a,
           CAST(starts_with(p_type, 'STANDARD') AS INTEGER) AS is_std,
           CAST(ends_with(p_brand, '3') AS INTEGER) AS ends3,
           ascii(left(p_name, 1)) AS first_ascii,
           chr(65 + (p_size % 26)) AS size_chr,
           translate(p_brand, '#', '-') AS brand_tr,
           split_part(p_type, ' ', 1) AS type_head,
           -- initcap emulation (no initcap in DuckDB 1.0)
           array_to_string(
             list_transform(string_split(lower(p_type), ' '),
                            w -> concat(upper(w[1]), w[2:])), ' ') AS type_title
    FROM part WHERE p_partkey <= 500
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.left("p_brand", F.lit(2)), 2).alias("brand_rep"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad(F.left("p_name", F.lit(3)), 6, ".").alias("name_rpad"),
        F.instr("p_name", "a").alias("first_a"),
        F.startswith("p_type", F.lit("STANDARD")).cast("int").alias("is_std"),
        F.endswith("p_brand", F.lit("3")).cast("int").alias("ends3"),
        F.ascii(F.left("p_name", F.lit(1))).alias("first_ascii"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("size_chr"),
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.initcap(F.lower("p_type")).alias("type_title"),
    )


# --- F2 fn_regex
@_q(
    "fn_regex",
    """
    SELECT p_partkey,
           CAST(regexp_matches(p_name, '^[a-m]') AS INTEGER) AS starts_early,
           regexp_extract(p_name, '([aeiou]+)', 1) AS first_vowels,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           -- regexp_count emulation (absent in DuckDB 1.0)
           len(string_split_regex(p_name, '[aeiou]')) - 1 AS n_vowels
    FROM part WHERE p_partkey <= 500
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[a-m]").cast("int").alias("starts_early"),
        F.regexp_extract("p_name", "([aeiou]+)", 1).alias("first_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
    )


# --- F3 fn_math
@_q(
    "fn_math",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000) AS dev_1000,
           CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sign_dev,
           round(sqrt(p_retailprice), 6) AS sqrt_price,
           round(cbrt(p_retailprice), 6) AS cbrt_price,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_floor,
           round(exp(p_size / 25.0), 6) AS exp_size,
           round(ln(p_retailprice), 6) AS ln_price,
           round(log10(p_retailprice), 6) AS log10_price,
           round(log2(p_size), 6) AS log2_size,
           p_size % 7 AS size_mod,
           round(power(p_size, 2), 1) AS size_sq,
           CAST(factorial(p_size % 10) AS BIGINT) AS fact_mod,
           round(sin(p_size) + cos(p_size) + atan(p_size), 6) AS trig_mix,
           round(degrees(p_size / 50.0), 6) AS deg,
           round(radians(p_size), 6) AS rad,
           CAST(isnan(CASE WHEN p_size % 5 = 0 THEN 'NaN'::DOUBLE
                           ELSE p_retailprice END) AS INTEGER) AS is_nan,
           CASE WHEN isnan(CASE WHEN p_size % 5 = 0 THEN 'NaN'::DOUBLE
                                ELSE p_retailprice END)
                THEN -1.0 ELSE p_retailprice END AS nanvl_price,
           CAST(trunc(p_retailprice) AS BIGINT) AS price_trunc
    FROM part WHERE p_partkey <= 500 AND p_size > 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter((F.col("p_partkey") <= 500) & (F.col("p_size") > 0))
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("dev_1000"),
        F.signum(F.col("p_retailprice") - 1000).alias("sign_dev"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.cbrt("p_retailprice"), 6).alias("cbrt_price"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_ceil"),
        F.floor(F.col("p_retailprice") / 100).alias("price_floor"),
        F.round(F.exp(F.col("p_size") / 25.0), 6).alias("exp_size"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.log2("p_size"), 6).alias("log2_size"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.factorial(F.col("p_size") % 10).alias("fact_mod"),
        F.round(F.sin("p_size") + F.cos("p_size") + F.atan("p_size"), 6).alias("trig_mix"),
        F.round(F.degrees(F.col("p_size") / 50.0), 6).alias("deg"),
        F.round(F.radians("p_size"), 6).alias("rad"),
        F.isnan(
            F.when(F.col("p_size") % 5 == 0, F.lit(float("nan"))).otherwise(
                F.col("p_retailprice")
            )
        )
        .cast("int")
        .alias("is_nan"),
        F.nanvl(
            F.when(F.col("p_size") % 5 == 0, F.lit(float("nan"))).otherwise(
                F.col("p_retailprice")
            ),
            F.lit(-1.0),
        ).alias("nanvl_price"),
        # Spark's trunc() is date-only; floor works here because the value is
        # non-negative (DataFusion's numeric trunc → floor for positives).
        F.floor("p_retailprice").alias("price_trunc"),
    )


# --- F4 fn_datetime: extraction, truncation, formatting, diffs, binning.
@_q(
    "fn_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           hour(o_orderdate) AS h,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           strftime(o_orderdate, '%Y-%m-%d') AS ymd,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           make_date(year(o_orderdate), 1, 1) AS year_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           quarter(o_orderdate) AS q,
           dayofmonth(o_orderdate) AS dom,
           -- deterministic 6-hour binning via epoch arithmetic (date_bin analogue)
           CAST(to_timestamp(floor(epoch(o_orderdate) / 21600) * 21600) AS TIMESTAMP) AS bin6h
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).alias("year_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("o_orderdate") / 21600) * 21600
        ).alias("bin6h"),
    )


# --- F5 fn_interval: interval literals and timestamp arithmetic.
@_q(
    "fn_interval",
    """
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL 1 DAY AS plus_day,
           CAST(ts AS TIMESTAMP) - INTERVAL 90 MINUTE AS minus_90m,
           CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR + INTERVAL 30 SECOND AS plus_mix,
           CAST(CAST(ts AS TIMESTAMP) + INTERVAL 1 MONTH AS DATE) AS next_month
    FROM events WHERE event_id <= 1000
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") <= 1000)
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("plus_day"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTE")).alias("minus_90m"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR") + F.expr("INTERVAL 30 SECOND")).alias(
            "plus_mix"
        ),
        (F.col("ts") + F.expr("INTERVAL 1 MONTH")).cast("date").alias("next_month"),
    )


# --- F6 fn_conditional: coalesce / nullif / ifnull / nvl2 / greatest / least.
@_q(
    "fn_conditional",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           ifnull(nullif(c_acctbal, 0.0), -1.0) AS bal_or_neg,
           CASE WHEN nullif(c_acctbal, 0.0) IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_bal,
           greatest(c_acctbal, 5000.0) AS bal_floor5k,
           least(c_acctbal, 5000.0) AS bal_cap5k
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bal_nn = F.nullif(F.col("c_acctbal"), F.lit(0.0))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.ifnull(bal_nn, F.lit(-1.0)).alias("bal_or_neg"),
        F.nvl2(bal_nn, F.lit("has"), F.lit("none")).alias("nvl2_bal"),
        F.greatest("c_acctbal", F.lit(5000.0)).alias("bal_floor5k"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
    )


# --- F7 fn_hash_enc: md5 / sha2 / hex / base64 round-trip.
@_q(
    "fn_hash_enc",
    """
    SELECT n_nationkey,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256,
           lower(to_hex(n_nationkey)) AS key_hex,
           to_base64(CAST(n_name AS BLOB)) AS name_b64,
           CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR) AS roundtrip
    FROM nation
    """,
)
def fn_hash_enc(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2("n_name", 256).alias("name_sha256"),
        F.lower(F.hex("n_nationkey")).alias("key_hex"),
        F.base64(F.col("n_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary"))).cast("string").alias("roundtrip"),
    )


# --- F8 fn_array: construction, access, slicing, set ops, flatten, sequence.
@_q(
    "fn_array",
    """
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS word1,
           array_to_string(string_split(p_name, ' ')[1:2], '+') AS first_two,
           CAST(list_contains(string_split(p_type, ' '), 'BRUSHED') AS INTEGER) AS has_brushed,
           list_position(string_split(p_type, ' '), 'STEEL') AS steel_at,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq_sorted,
           -- DuckDB's list_sort(empty) is NULL; Spark's array_join(empty) is ''
           coalesce(array_to_string(list_sort(list_intersect(string_split(p_name, ' '),
                                              string_split(p_type, ' '))), ','), '') AS common_words,
           array_to_string(flatten([string_split(p_brand, '#'), ['x']]), '/') AS flat,
           len(range(1, p_size + 1)) AS seq_len,
           array_to_string(list_transform(range(1, 4), x -> CAST(x * p_size AS VARCHAR)), ',') AS size_multiples
    FROM part WHERE p_partkey <= 300 AND p_size > 0
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter((F.col("p_partkey") <= 300) & (F.col("p_size") > 0))
    words = F.split(F.col("p_name"), " ")
    type_words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("word1"),
        F.array_join(F.slice(words, 1, 2), "+").alias("first_two"),
        F.array_contains(type_words, "BRUSHED").cast("int").alias("has_brushed"),
        F.array_position(type_words, "STEEL").alias("steel_at"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("uniq_sorted"),
        F.array_join(F.array_sort(F.array_intersect(words, type_words)), ",").alias(
            "common_words"
        ),
        F.array_join(
            F.flatten(F.array(F.split(F.col("p_brand"), "#"), F.array(F.lit("x")))), "/"
        ).alias("flat"),
        F.size(F.sequence(F.lit(1), F.col("p_size"))).alias("seq_len"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda x: (x * F.col("p_size")).cast("string"),
            ),
            ",",
        ).alias("size_multiples"),
    )


# --- F9 fn_unnest: UNNEST/explode lateral expansion + re-aggregation.
@_q(
    "fn_unnest",
    """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word
          FROM part WHERE p_partkey <= 1000) t
    GROUP BY word
    HAVING count(*) >= 5
    """,
)
def fn_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    return (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


# --- F10 fn_struct_map: struct/map construction + field access, flattened out.
@_q(
    "fn_struct_map",
    """
    SELECT n_nationkey,
           struct_pack(key := n_nationkey, name := n_name).name AS s_name,
           struct_pack(key := n_nationkey, name := n_name).key * 2 AS s_key2,
           array_to_string(list_sort(map_keys(map(['nation','region'],
                 [CAST(n_nationkey AS VARCHAR), CAST(n_regionkey AS VARCHAR)]))), ',') AS mkeys,
           map(['nation','region'],
               [CAST(n_nationkey AS VARCHAR), CAST(n_regionkey AS VARCHAR)])['region'][1] AS region_val
    FROM nation
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    st = F.struct(F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"))
    mp = F.map_from_arrays(
        F.array(F.lit("nation"), F.lit("region")),
        F.array(F.col("n_nationkey").cast("string"), F.col("n_regionkey").cast("string")),
    )
    return n.select(
        "n_nationkey",
        st.getField("name").alias("s_name"),
        (st.getField("key") * 2).alias("s_key2"),
        F.array_join(F.array_sort(F.map_keys(mp)), ",").alias("mkeys"),
        F.element_at(mp, "region").alias("region_val"),
    )


# --- F11 fn_union_misc: version/typeof introspection — smoke only (engine-
# specific output; no oracle by design, SURVEY §2.8).
@_q("fn_union_misc", None)
def fn_union_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.typeof(F.col("n_name")).alias("name_type"),
        F.lit(spark.version).alias("engine_version"),
    )


# --- fn_bitwise: bitwise operators (DataFusion supports &,|,^,<<,>>,~ as
# binary exprs; both engines agree on two's-complement BIGINT semantics).
@_q(
    "fn_bitwise",
    """
    SELECT p_partkey,
           CAST(p_partkey & 255 AS BIGINT) AS low_byte,
           CAST(p_partkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(p_partkey, 170) AS BIGINT) AS xored,
           CAST(p_partkey << 3 AS BIGINT) AS shl,
           CAST(p_partkey >> 2 AS BIGINT) AS shr,
           CAST(~p_partkey AS BIGINT) AS inv,
           CAST(bit_count(p_partkey::BIGINT) AS INTEGER) AS popcnt
    FROM part WHERE p_partkey <= 500
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    k = F.col("p_partkey").cast("bigint")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(170)).alias("xored"),
        F.shiftleft(k, 3).cast("bigint").alias("shl"),
        F.shiftright(k, 2).cast("bigint").alias("shr"),
        F.expr("CAST(~CAST(p_partkey AS BIGINT) AS BIGINT)").alias("inv"),
        F.bit_count(k).cast("int").alias("popcnt"),
    )


# --- fn_string_agg: ordered string aggregation (LISTAGG ... WITHIN GROUP /
# DuckDB string_agg ORDER BY). The ORDER BY key is the unique p_partkey so
# the concatenation is deterministic — an unordered listagg would
# hash-mismatch between engines run to run.
@_q(
    "fn_string_agg",
    """
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(substr(p_name, 1, 6), '|' ORDER BY p_partkey) AS names
    FROM part WHERE p_partkey <= 200
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def fn_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "listagg(substring(p_name, 1, 6), '|') "
                "WITHIN GROUP (ORDER BY p_partkey)"
            ).alias("names"),
        )
        .orderBy("p_brand")
    )


# --- T1 tf_generate_series: table-function row generation
# (DataFusion generate_series/range, Cargo.lock:2209 → spark.range).
@_q(
    "tf_generate_series",
    """
    SELECT i, i * i AS sq, i % 5 AS m
    FROM range(1, 101) t(i)
    """,
)
def tf_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1, 101).select(
        F.col("id").alias("i"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 5).alias("m"),
    )


# --- fn_json (EXTENSION): JSON scalar functions over events.props.
# DataFusion 50 core has none (SURVEY.md §2.8 — no datafusion-functions-json
# in the reference's Cargo.lock); Spark's get_json_object / from_json are a
# free superset, and a real event pipeline parses JSON payloads constantly.
# Both extraction styles (path extract and schema-on-read struct) are
# exercised and must agree.
@_q(
    "fn_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
    FROM events WHERE event_id < 1000
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_struct"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("k_missing"),
    )


# --- F16 fn_variant: the VARIANT type (Spark 4 open variant encoding —
# parse_json -> binary variant, typed path extraction via variant_get,
# try_ variant semantics on missing paths). The engine side stores and
# navigates the BINARY variant form (the same encoding the Delta
# variantType feature persists — see sources/delta.py and
# tests/test_variant.py for the table half); the oracle navigates the
# equivalent JSON with DuckDB's path operators — identical scalars out.
# A synthesized nested document (object + array) exercises object keys,
# array indexing, and type casting, not just flat lookup.
@_q(
    "fn_variant",
    """
    SELECT event_id,
           CAST(j->>'$.k' AS BIGINT) AS k_typed,
           CAST(j->>'$.arr[1]' AS INTEGER) AS arr_1,
           j->>'$.tag.name' AS tag_name,
           CAST(j->>'$.missing' AS BIGINT) AS k_missing
    FROM (
        SELECT event_id,
               json(concat('{"k": ',
                           COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0),
                           ', "arr": [3, ', event_id % 10,
                           '], "tag": {"name": "u', user_id, '"}}')) AS j
        FROM events WHERE event_id < 1000
    )
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    # COALESCE the extracted key: Spark's concat is NULL-absorbing while
    # DuckDB's skips NULLs, so an event row lacking $.k would otherwise
    # silently diverge (all-NULL extracts here, malformed JSON there).
    doc = F.concat(
        F.lit('{"k": '),
        F.coalesce(F.get_json_object("props", "$.k").cast("bigint"),
                   F.lit(0)).cast("string"),
        F.lit(', "arr": [3, '),
        (F.col("event_id") % 10).cast("string"),
        F.lit('], "tag": {"name": "u'),
        F.col("user_id").cast("string"),
        F.lit('"}}'),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.arr[1]", "int").alias("arr_1"),
        F.try_variant_get(v, "$.tag.name", "string").alias("tag_name"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
    )


# --- fn_higher_order: the lambda-function surface (transform / filter /
# aggregate-fold / exists-style predicates / zip_with) in ONE narrow pass —
# the array-programming idioms DataFusion exposes as array_* functions.
# Engine parity: existence/universality are spelled as list_filter counts
# (DuckDB has no exists/forall), the fold is an integer left fold
# (order-fixed, exact), and zip_with pairs each token with its 1-based
# position — all pure integer/string ops, no rounding anywhere.
@_q(
    "fn_higher_order",
    """
    WITH t AS (
      SELECT p_partkey,
             string_split(lower(p_type), ' ') AS toks
      FROM part WHERE p_partkey <= 500)
    SELECT p_partkey,
           len(list_filter(toks, x -> length(x) > 5)) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x)))
                AS BIGINT) AS total_len,
           len(list_filter(toks, x -> x = 'brushed')) > 0 AS has_brushed,
           len(list_filter(toks, x -> length(x) < 3)) = 0 AS all_min3,
           array_to_string(
             [CAST(i AS VARCHAR) || ':' || toks[i]
              FOR i IN range(1, len(toks) + 1)], ',') AS indexed
    FROM t
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    toks = F.split(F.lower("p_type"), " ")
    return p.select(
        "p_partkey",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        )
        .cast("bigint")
        .alias("total_len"),
        F.exists(toks, lambda x: x == "brushed").alias("has_brushed"),
        F.forall(toks, lambda x: F.length(x) >= 3).alias("all_min3"),
        F.array_join(
            F.zip_with(
                F.sequence(F.lit(1), F.size(toks)),
                toks,
                lambda i, t: F.concat(i.cast("string"), F.lit(":"), t),
            ),
            ",",
        ).alias("indexed"),
    )


# ------------------------------------------------------------ fn_try_safe
# F14: the ANSI-mode error-safe function family — try_cast, try_divide,
# try_add, try_element_at. Under ANSI SQL semantics (Spark 4 default)
# a bad cast / zero divide / integer overflow FAILS the query; the try_
# variants return NULL instead, which is what production ELT uses for
# dirty columns (parse what parses, quarantine the rest). The oracle
# mirrors each case with DuckDB's TRY_CAST or the equivalent NULL-guard
# CASE, so the semantics (not just the happy path) are checked: a
# non-numeric string, a divide-by-zero bucket, an int64 overflow, and
# an out-of-range array index each produce NULL, counted per type.
# Scale: one narrow codegen'd pass + the usual two-phase count fold.
@_q(
    "fn_try_safe",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN TRY_CAST(event_type AS INTEGER) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_cast,
           CAST(sum(CASE WHEN (CASE WHEN CAST(floor(value / 100) AS INTEGER) = 0
                                    THEN NULL
                                    ELSE 100.0 / CAST(floor(value / 100) AS INTEGER)
                               END) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_div_zero,
           CAST(sum(CASE WHEN (CASE WHEN event_id > 0 THEN NULL
                                    ELSE 9223372036854775807 + event_id
                               END) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
           CAST(sum(CASE WHEN string_split(event_type, '')[99] IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_oob_index
    FROM events GROUP BY event_type
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "CAST(sum(CASE WHEN try_cast(event_type AS INT) IS NULL"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_bad_cast"),
        F.expr(
            "CAST(sum(CASE WHEN try_divide(100.0,"
            " CAST(floor(value / 100) AS INT)) IS NULL"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_div_zero"),
        F.expr(
            "CAST(sum(CASE WHEN try_add(9223372036854775807L, event_id)"
            " IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_overflow"),
        F.expr(
            "CAST(sum(CASE WHEN try_element_at(split(event_type, ''), 99)"
            " IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_oob_index"),
    )


# --- F12 fn_url_parse: the parse_url / try_parse_url extraction family
# (PROTOCOL, HOST, PATH, QUERY, REF, FILE, and single query-param pulls),
# completing the URL surface dedup_url_canonical opened. URLs are
# synthesized deterministically from documents with a malformed arm
# (doc_id % 11 = 0) so try_parse_url's NULL-on-unparseable semantics are
# exercised, not just the happy path. DuckDB 1.0 has no parse_url, so
# the oracle emulates each part with the regexes java.net.URI implies on
# this synth domain (no percent-escapes, no ports, no userinfo); the
# malformed arm NULLs every part on both sides. Scale: one narrow
# codegen'd projection — zero exchanges, no UDFs (reference parity:
# DataFusion exposes no URL family; this is Spark-native surface).
@_q(
    "fn_url_parse",
    r"""
    WITH urls AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN 'not a url ' || CAST(doc_id AS VARCHAR)
                  ELSE 'HTTPS://'
                    || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                    || CASE WHEN doc_id % 6 = 0 THEN 'Img.' ELSE '' END
                    || source
                    || CASE WHEN doc_id % 7 < 2 THEN '.CO.UK' ELSE '.COM' END
                    || '/Path/' || CAST(doc_id % 40 AS VARCHAR)
                    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
                    || CASE WHEN doc_id % 4 = 0 THEN
                           '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR) || '&b=2'
                         WHEN doc_id % 4 = 1 THEN '?b=2&a=1&gclid=xyz'
                         ELSE '' END
                    || CASE WHEN doc_id % 5 = 0 THEN '#Sec' ELSE '' END
             END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url, doc_id % 11 = 0 AS bad,
             nullif(regexp_extract(url, '\?([^#]*)', 1), '') AS q
      FROM urls
    )
    SELECT doc_id, url,
           CASE WHEN bad THEN NULL
                ELSE regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)
           END AS proto,
           CASE WHEN bad THEN NULL
                ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)
           END AS host,
           CASE WHEN bad THEN NULL
                ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
           END AS path,
           CASE WHEN bad THEN NULL ELSE q END AS query,
           CASE WHEN bad THEN NULL
                ELSE nullif(regexp_extract(url, '#(.*)$', 1), '')
           END AS ref,
           CASE WHEN bad THEN NULL
                ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
           END AS file,
           CASE WHEN bad OR q IS NULL
                     OR NOT regexp_matches(q, '(^|&)a=') THEN NULL
                ELSE regexp_extract(q, '(^|&)a=([^&]*)', 2)
           END AS q_a,
           CASE WHEN bad OR q IS NULL
                     OR NOT regexp_matches(q, '(^|&)ref=') THEN NULL
                ELSE regexp_extract(q, '(^|&)ref=([^&]*)', 2)
           END AS q_ref
    FROM parts
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _URL_SYNTH_SQL

    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 11 = 0"
        " THEN 'not a url ' || CAST(doc_id AS STRING)"
        f" ELSE {_URL_SYNTH_SQL} END AS url",
    )
    return d.selectExpr(
        "doc_id",
        "url",
        "try_parse_url(url, 'PROTOCOL') AS proto",
        "try_parse_url(url, 'HOST') AS host",
        "try_parse_url(url, 'PATH') AS path",
        "try_parse_url(url, 'QUERY') AS query",
        "try_parse_url(url, 'REF') AS ref",
        "try_parse_url(url, 'FILE') AS file",
        "try_parse_url(url, 'QUERY', 'a') AS q_a",
        "try_parse_url(url, 'QUERY', 'ref') AS q_ref",
    )
