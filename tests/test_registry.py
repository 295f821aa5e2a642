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
