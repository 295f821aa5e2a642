from __future__ import annotations

import pytest

from ballista_delta_spark.sources.registry import register_parquet, resolve_url


def test_resolve_file_schemes():
    assert resolve_url("/a/b") == "/a/b"
    assert resolve_url("file:///a/b") == "/a/b"
    assert resolve_url("s3://bucket/key") == "s3a://bucket/key"
    assert resolve_url("http://h/p") == "http://h/p"


def test_resolve_mangled_delta_rs_url():
    """Reference src/object_store.rs:72-94 decodes delta-rs's mangled URLs."""
    assert resolve_url("delta-rs://file-root-data-tbl") == "/root/data/tbl"
    assert resolve_url("delta-rs://s3-bucket-prefix") == "s3a://bucket/prefix"


def test_resolve_unknown_scheme_errors():
    with pytest.raises(ValueError):
        resolve_url("gopher://nope")


def test_mangled_s3_probing_decode_recovers_hyphenated_bucket_and_key():
    """The '-' mangling is lossy for hyphenated buckets/keys; with a store
    probe (prefix-listing semantics) the decoder recovers the real layout,
    mirroring the file- candidate walk (reference src/object_store.rs:48-70
    only does the naive replace)."""
    # Real layout: bucket 'my-bucket', table at 'raw-data/tbl' w/ _delta_log.
    real = {"my-bucket/raw-data/tbl", "my-bucket/raw-data/tbl/_delta_log"}

    def probe(prefix: str) -> bool:
        return any(r.startswith(prefix) for r in real)

    assert (
        resolve_url("delta-rs://s3-my-bucket-raw-data-tbl", s3_probe=probe)
        == "s3a://my-bucket/raw-data/tbl"
    )
    # No probe -> reference-parity naive decode.
    assert (
        resolve_url("delta-rs://s3-my-bucket-raw-data-tbl")
        == "s3a://my/bucket/raw/data/tbl"
    )


def _serve(directory: str):
    import functools
    import http.server
    import threading

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=directory
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def test_register_http_parquet_multi_file_and_guards(spark, sf_dir, tmp_path):
    """Multi-file HTTP tables work under the caps; above the size or
    file-count guard the fetch refuses with an actionable error instead of
    silently funneling terabytes through the driver."""
    import os
    import shutil

    from ballista_delta_spark.sources.registry import register_http_parquet

    d = tmp_path / "srv"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "region.parquet"), d / "r1.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), d / "r2.parquet")
    httpd, port = _serve(str(d))
    try:
        base = f"http://127.0.0.1:{port}"
        df = register_http_parquet(
            spark, "region_http2", [f"{base}/r1.parquet", f"{base}/r2.parquet"]
        )
        assert df.count() == 10  # 5 regions x 2 files

        with pytest.raises(ValueError, match="max 1"):
            register_http_parquet(
                spark, "x", [f"{base}/r1.parquet", f"{base}/r2.parquet"],
                max_files=1,
            )
        with pytest.raises(ValueError, match="bytes"):
            register_http_parquet(
                spark, "x", f"{base}/r1.parquet", max_bytes=100
            )
    finally:
        httpd.shutdown()


def test_register_parquet(spark, sf_dir):
    register_parquet(spark, "nation_v", f"{sf_dir}/nation.parquet")
    assert spark.sql("SELECT count(*) AS n FROM nation_v").collect()[0].n == 25


def test_build_spark_master_and_conf_override():
    """Remote-cluster entry point (reference examples/local_read_client.rs:31
    uses remote_with_state('df://...'); our analogue is the master= knob).
    getOrCreate reuses a live session, so assert on the BUILDER options."""
    from ballista_delta_spark.session import build_spark

    b = build_spark("x", master="spark://host:7077", conf={"spark.executor.memory": "2g"})
    opts = b._options
    assert opts["spark.master"] == "spark://host:7077"
    assert opts["spark.executor.memory"] == "2g"
    # Defaults still present, conf overrides win over defaults.
    assert opts["spark.sql.adaptive.enabled"] == "true"
    b2 = build_spark("x", conf={"spark.sql.shuffle.partitions": "7"})
    assert b2._options["spark.sql.shuffle.partitions"] == "7"
