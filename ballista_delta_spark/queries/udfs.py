"""UDF / UDAF surface — SURVEY.md §2.11 (ids X1, X2, + applyInPandas).

The reference registers no UDFs itself; extensibility is the sibling
showcase "DataFusion Ballista Python UDF Support" (reference README.md:12),
and ``FunctionRegistry`` appears only as a codec parameter (reference
src/lib.rs:117). Spark-side the surface is native: ``pandas_udf`` (scalar
and grouped-agg) and ``applyInPandas``.

Scale notes: all three use Arrow-batched pandas UDFs — the ~10-100× faster
path vs row-at-a-time ``F.udf`` (data crosses the JVM/Python boundary as
Arrow record batches, vectorized in pandas). The scalar UDF is a narrow map
(no shuffle); the grouped forms shuffle once on the group key, same as a
built-in aggregate. These exist to prove the extension path — anything
expressible with built-ins should use built-ins (see text.py, which keeps
equivalent logic JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)


# NOTE: ``pandas_udf`` is applied lazily inside each query fn — decorating
# at import time parses the DDL return type, which needs a live session.


# --- X1 udf_python: scalar pandas UDF (Arrow-vectorized map).
def _tok_count(text: pd.Series) -> pd.Series:
    return text.str.split().map(len).astype("int32")


@_q(
    "udf_python",
    r"""
    SELECT doc_id,
           len(regexp_split_to_array(text, '\s+')) AS udf_tokens
    FROM documents
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok_count = pandas_udf(_tok_count, "int")
    return d.select("doc_id", tok_count("text").alias("udf_tokens"))


# --- X2 pandas_udf_grouped_agg: grouped-aggregate pandas UDF.
# Rounded to 6 decimals in BOTH engines (pandas .mean() and DuckDB avg()
# may differ in the last float ulp from summation order).
def _mean_value(v: pd.Series) -> float:
    return float(v.mean())


def _count_value(v: pd.Series) -> int:
    return len(v)


@_q(
    "pandas_udf_grouped_agg",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 6) AS mean_value
    FROM events
    GROUP BY event_type
    """,
)
def pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    mean_value = pandas_udf(_mean_value, "double")
    # A grouped-agg pandas UDF can't share .agg() with built-in aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas UDF too.
    count_value = pandas_udf(_count_value, "long")
    return e.groupBy("event_type").agg(
        count_value("value").alias("n"),
        F.round(mean_value("value"), 6).alias("mean_value"),
    )


# --- udf_apply_in_pandas: full-group pandas transform (one pandas frame
# per group). Outputs use exact double min/max so the hash-compare is exact.
def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(pdf)],
            "value_min": [pdf["value"].min()],
            "value_max": [pdf["value"].max()],
            "value_range": [pdf["value"].max() - pdf["value"].min()],
        }
    )


@_q(
    "udf_apply_in_pandas",
    """
    SELECT event_type,
           count(*) AS n,
           min(value) AS value_min,
           max(value) AS value_max,
           max(value) - min(value) AS value_range
    FROM events
    GROUP BY event_type
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select("event_type", "value").groupBy("event_type").applyInPandas(
        _group_stats,
        "event_type string, n long, value_min double, value_max double, value_range double",
    )


# --- X4 udf_map_in_arrow: mapInArrow — the zero-copy Arrow-batch map
# (pyspark 3.3+), the lowest-overhead Python extension point: batches
# arrive as pyarrow.RecordBatch (no pandas conversion at all), so
# compute can run directly against Arrow buffers (or hand off to any
# Arrow-native library — polars, numpy via zero-copy, a C extension).
# The example computes per-doc character and whitespace-token counts in
# pyarrow.compute — vectorized C++ kernels, never per-row Python.
# Scale shape: a narrow map (no shuffle); each input partition streams
# through as a sequence of record batches, so memory is batch-bounded.
def _arrow_stats(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        n_chars = pc.utf8_length(text)
        # whitespace tokenization: count splits of the trimmed string
        toks = pc.list_value_length(
            pc.split_pattern_regex(text, r"\s+")
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), n_chars, pc.cast(toks, pa.int64())],
            names=["doc_id", "arrow_chars", "arrow_tokens"],
        )


@_q(
    "udf_map_in_arrow",
    r"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS arrow_chars,
           CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
               AS arrow_tokens
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_stats,
        "doc_id bigint, arrow_chars int, arrow_tokens bigint",
    )
