"""Table registration + URL scheme routing.

Reference parity: ``register_table`` / ``register_parquet``
(reference README.md:56, examples/s3_standalone.rs:35) and the custom
``ObjectStoreRegistry`` (reference src/object_store.rs:13-107) that resolves
``file:`` / ``http(s):`` / ``s3:`` / mangled ``delta-rs:`` URLs. In Spark,
object-store access is Hadoop FileSystem configuration, not code — this module
maps each reference scheme to the Spark-side path/conf and registers temp
views so ``spark.sql`` sees the same catalog the reference builds.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from .delta import read_delta


def resolve_url(url: str) -> str:
    """Map the reference's URL schemes (src/object_store.rs:31-98) to the
    path Spark should scan.

    file:/empty -> local path; s3:// -> s3a:// (needs `configure_s3`);
    delta-rs://file-... mangled URLs -> reconstructed local path (the
    reference gets these "a bit messed up" from plan serialization,
    src/object_store.rs:72-94 — we keep the decoder for drop-in parity);
    http(s) -> passed through (Hadoop http FS if configured).
    """
    parsed = urlparse(url)
    scheme = parsed.scheme
    if scheme in ("", "file"):
        return parsed.path or url
    if scheme in ("http", "https"):
        return url
    if scheme == "s3":
        return "s3a://" + url[len("s3://"):]
    if scheme == "s3a":
        return url
    if scheme == "delta-rs":
        # delta-rs mangles `file:///a/b/c` into `delta-rs://file-...-a-b-c`
        # style host tokens; the reference re-derives the prefix store from
        # the tail segments (src/object_store.rs:48-94). We reconstruct the
        # original path from the url-encoded tail.
        host = parsed.netloc
        if host.startswith("file-"):
            tail = host[len("file-"):]
            return "/" + tail.replace("-", "/")
        if host.startswith("s3-"):
            return "s3a://" + host[len("s3-"):].replace("-", "/")
    raise ValueError(f"unsupported object-store URL: {url}")


def configure_s3(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
) -> None:
    """S3/MinIO wiring (reference src/object_store.rs:42-47 builds an
    env-credentialed AmazonS3 store; examples/s3_standalone.rs:15-18 points it
    at MinIO). Spark equivalent is pure Hadoop conf. Credentials fall back to
    env vars AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY like the reference."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", "true" if path_style else "false")


def register_delta(spark: SparkSession, name: str, url: str, version: int | None = None) -> DataFrame:
    """``deltalake::open_table(url)`` + ``ctx.register_table(name, table)``
    (reference examples/local_standalone.rs:30-32)."""
    df = read_delta(spark, resolve_url(url), version=version)
    df.createOrReplaceTempView(name)
    return df


def register_parquet(spark: SparkSession, name: str, url: str) -> DataFrame:
    """``ctx.register_parquet`` (reference examples/s3_standalone.rs:35-39)."""
    df = spark.read.parquet(resolve_url(url))
    df.createOrReplaceTempView(name)
    return df


def register_csv(spark: SparkSession, name: str, url: str, schema=None, **options) -> DataFrame:
    """CSV source (reference links datafusion-datasource-csv, Cargo.lock:1980).

    Pass an explicit ``schema`` whenever one is known: ``inferSchema`` is a
    second full pass over the data — fine at test scale, a disaster at 100 TB.
    """
    opts = {"header": "true", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(resolve_url(url))
    df.createOrReplaceTempView(name)
    return df


def register_json(spark: SparkSession, name: str, url: str, schema=None) -> DataFrame:
    """NDJSON source (reference links datafusion-datasource-json, Cargo.lock:2005)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(resolve_url(url))
    df.createOrReplaceTempView(name)
    return df
