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


def test_register_http_parquet_multi_file_and_distributed_routing(
    spark, sf_dir, tmp_path
):
    """Multi-file HTTP tables work under the caps via driver localization;
    above the size or file-count budget the call now auto-routes to the
    executor-side mapInPandas fetch (round-6 upgrade of the r3 hard caps),
    so results are identical either way."""
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

        # Over the file cap: routed to the distributed path, same rows.
        df = register_http_parquet(
            spark, "region_httpd", [f"{base}/r1.parquet", f"{base}/r2.parquet"],
            max_files=1,
        )
        assert df.count() == 10
        # Over the byte budget: same routing.
        df = register_http_parquet(
            spark, "region_httpb", f"{base}/r1.parquet", max_bytes=100
        )
        assert df.count() == 5
    finally:
        httpd.shutdown()


def test_register_http_parquet_distributed_above_old_cap(spark, sf_dir, tmp_path):
    """20 files (> the 16-file driver cap) through the executor-side fetch:
    one task per file, rows and values intact, schema from one footer."""
    import os
    import shutil

    from ballista_delta_spark.sources.registry import (
        register_http_parquet_distributed,
    )

    d = tmp_path / "srv20"
    d.mkdir()
    for i in range(20):
        shutil.copy(os.path.join(sf_dir, "region.parquet"), d / f"r{i:02d}.parquet")
    httpd, port = _serve(str(d))
    try:
        base = f"http://127.0.0.1:{port}"
        urls = [f"{base}/r{i:02d}.parquet" for i in range(20)]
        df = register_http_parquet_distributed(spark, "region_http20", urls)
        assert df.count() == 100  # 5 regions x 20 files
        assert df.schema["r_regionkey"].dataType.simpleString() == "int"
        got = spark.sql(
            "SELECT r_name, count(*) AS n FROM region_http20 "
            "GROUP BY r_name ORDER BY r_name"
        ).collect()
        assert len(got) == 5 and all(r.n == 20 for r in got)
    finally:
        httpd.shutdown()


def _serve_ranged(directory: str):
    """HTTP server that honors Range requests and counts body bytes served
    — the instrument for asserting the ranged scan's transfer savings."""
    import http.server
    import os
    import re
    import threading

    served = [0]

    class _RangeHandler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=directory, **kw)

        def log_message(self, *a):
            pass

        def do_HEAD(self):
            path = self.translate_path(self.path)
            self.send_response(200)
            self.send_header("Content-Length", str(os.path.getsize(path)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            path = self.translate_path(self.path)
            with open(path, "rb") as fh:
                data = fh.read()
            rng = self.headers.get("Range")
            if rng:
                m = re.fullmatch(r"bytes=(\d+)-(\d*)", rng)
                start = int(m.group(1))
                end = int(m.group(2)) if m.group(2) else len(data) - 1
                end = min(end, len(data) - 1)
                chunk = data[start:end + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}"
                )
            else:
                chunk = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(chunk)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(chunk)
            served[0] += len(chunk)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1], served


def test_http_distributed_ranged_scan_prunes_columns_on_the_wire(
    spark, tmp_path
):
    """Against a Range-capable server, a narrow projection must transfer a
    small fraction of the file: footer + the projected column's chunks,
    never the wide column's bytes (VERDICT r7 #4 — parity with the
    reference's DataFusion-over-HTTP scan shape)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ballista_delta_spark.sources.registry import (
        register_http_parquet_distributed,
    )

    d = tmp_path / "wide"
    d.mkdir()
    # ~2 MB file: a few-KB int column next to a fat payload column.
    tbl = pa.table({
        "id": pa.array(range(2000), pa.int64()),
        "payload": pa.array([f"{i:06d}" * 170 for i in range(2000)]),
    })
    fp = str(d / "wide.parquet")
    pq.write_table(tbl, fp, compression="none", use_dictionary=False)
    file_size = os.path.getsize(fp)
    assert file_size > 1_500_000

    httpd, port, served = _serve_ranged(str(d))
    try:
        url = f"http://127.0.0.1:{port}/wide.parquet"
        df = register_http_parquet_distributed(
            spark, "wide_http", url, columns=["id"]
        )
        assert df.columns == ["id"]
        assert df.count() == 2000
        assert df.agg({"id": "max"}).collect()[0][0] == 1999
        # Transfer must be footer + id chunks only — well under 20% of
        # the file (the payload column alone is >95% of it).
        assert served[0] < file_size * 0.2, (served[0], file_size)
    finally:
        httpd.shutdown()


def test_http_distributed_full_schema_falls_back_without_ranges(
    spark, sf_dir, tmp_path
):
    """A server with no Range support (stdlib SimpleHTTPRequestHandler)
    still works — one full GET per file, columns pruned at parse time."""
    import os
    import shutil

    from ballista_delta_spark.sources.registry import (
        register_http_parquet_distributed,
    )

    d = tmp_path / "plain"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "region.parquet"), d / "r.parquet")
    httpd, port = _serve(str(d))
    try:
        df = register_http_parquet_distributed(
            spark, "region_http_norange",
            f"http://127.0.0.1:{port}/r.parquet",
            columns=["r_name"],
        )
        assert df.columns == ["r_name"]
        assert df.count() == 5
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


def _serve_delta(directory: str):
    """Range-capable server that 404s missing paths — the shape a real
    object-store HTTP gateway gives: the Delta log mirror terminates its
    commit walk on 404 and the data fetch does ranged GETs."""
    import http.server
    import os
    import re
    import threading

    class _Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=directory, **kw)

        def log_message(self, *a):
            pass

        def do_HEAD(self):
            path = self.translate_path(self.path)
            if not os.path.isfile(path):
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(os.path.getsize(path)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            path = self.translate_path(self.path)
            if not os.path.isfile(path):
                self.send_error(404)
                return
            with open(path, "rb") as fh:
                data = fh.read()
            rng = self.headers.get("Range")
            if rng:
                m = re.fullmatch(r"bytes=(\d+)-(\d*)", rng)
                start = int(m.group(1))
                end = int(m.group(2)) if m.group(2) else len(data) - 1
                end = min(end, len(data) - 1)
                chunk = data[start:end + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}"
                )
            else:
                chunk = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(chunk)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(chunk)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def test_register_delta_over_http(spark, tmp_path):
    """A Delta table behind plain HTTP: the log (JSON commits + classic
    checkpoint) mirrors driver-side, data files stream executor-side via
    ranged GETs, partition columns come back typed, time travel and
    stats-based file skipping work, and DV tables are refused."""
    import pytest as _pytest

    from ballista_delta_spark.sources.delta import (
        create_checkpoint,
        read_delta,
        write_delta,
    )
    from ballista_delta_spark.sources.delta_dml import delete_delta
    from ballista_delta_spark.sources.registry import register_delta

    src = str(tmp_path / "t")
    df0 = spark.range(20).selectExpr("id", "CAST(id % 3 AS INT) AS p")
    write_delta(df0, src, partition_by=["p"])                    # v0
    write_delta(
        spark.createDataFrame([(100, 7)], "id long, p int"), src,
        mode="append",
    )                                                            # v1
    create_checkpoint(src)
    write_delta(
        spark.createDataFrame([(200, 8)], "id long, p int"), src,
        mode="append",
    )                                                            # v2 (post-checkpoint)

    httpd, port = _serve_delta(str(tmp_path))
    try:
        base = f"http://127.0.0.1:{port}/t"
        got = register_delta(spark, "delta_http", base)
        assert got.schema == read_delta(spark, src).schema  # typed p
        assert sorted(r.id for r in got.collect()) == sorted(
            list(range(20)) + [100, 200]
        )
        assert spark.sql(
            "SELECT sum(p) AS s FROM delta_http"
        ).collect()[0].s == sum(i % 3 for i in range(20)) + 7 + 8

        # time travel through the mirrored log
        from ballista_delta_spark.sources.registry import register_delta_http

        v0 = register_delta_http(spark, "delta_http_v0", base, version=0)
        assert sorted(r.id for r in v0.collect()) == list(range(20))

        # stats skipping: the where prunes files driver-side AND filters
        w = register_delta_http(spark, "delta_http_w", base, where="id >= 100")
        assert sorted(r.id for r in w.collect()) == [100, 200]

        # DV tables are refused with a clear message
        dv_src = str(tmp_path / "dv")
        write_delta(spark.range(10).selectExpr("id"), dv_src)
        delete_delta(spark, dv_src, "id < 3", mode="dv")
        with _pytest.raises(ValueError, match="deletion vectors"):
            register_delta_http(
                spark, "delta_http_dv", f"http://127.0.0.1:{port}/dv"
            )
    finally:
        httpd.shutdown()


def test_register_delta_http_v2_checkpoint_classic_name(spark, tmp_path):
    """A v2-spec checkpoint MANIFEST under CLASSIC naming (spec-legal:
    v2 checkpoints may use the classic scheme so listing-less discovery
    keeps working): the HTTP mirror must also fetch the _sidecars/
    files named INSIDE the manifest — they hold the whole add set, and
    without them local replay dies on a table the transport can serve."""
    import glob as _glob
    import os

    from ballista_delta_spark.sources.delta import (
        alter_properties,
        create_checkpoint,
        write_delta,
    )
    from ballista_delta_spark.sources.registry import register_delta_http

    src = str(tmp_path / "v2t")
    write_delta(
        spark.range(30).selectExpr("id", "CAST(id % 3 AS INT) AS p"),
        src, partition_by=["p"],
    )
    alter_properties(spark, src, {"delta.checkpointPolicy": "v2"})
    v = create_checkpoint(src)
    log = os.path.join(src, "_delta_log")
    [uuid_ck] = _glob.glob(
        os.path.join(log, f"{v:020d}.checkpoint.*-*.parquet")
    )
    os.rename(
        uuid_ck, os.path.join(log, f"{v:020d}.checkpoint.parquet")
    )

    httpd, port = _serve_delta(str(tmp_path))
    try:
        df = register_delta_http(
            spark, "delta_http_v2ck", f"http://127.0.0.1:{port}/v2t"
        )
        assert sorted(r.id for r in df.collect()) == list(range(30))
        assert {r.p for r in df.collect()} == {0, 1, 2}
    finally:
        httpd.shutdown()


def test_resolve_url_local_paths_with_uri_special_chars(tmp_path):
    """Plain local paths bypass urlparse: '#'/'?' in a filename must not
    truncate, and a ':' in a relative first segment must not parse as a
    scheme (review finding, r11)."""
    from ballista_delta_spark.sources.registry import resolve_url

    assert resolve_url("/data/run#1/file.parquet") == "/data/run#1/file.parquet"
    assert resolve_url("/data/a?b.parquet") == "/data/a?b.parquet"
    assert resolve_url("my:dir/x.parquet") == "my:dir/x.parquet"
    assert resolve_url("file:///x/y") == "/x/y"


def test_reregistration_clears_stale_dml_routing(spark, tmp_path):
    """Re-registering a name version-pinned (or as a parquet view) must
    drop the DML routing the live registration installed — stale routing
    would write the OLD table through the new name (review finding, r11)."""
    from ballista_delta_spark.session import _delta_views, sql
    from ballista_delta_spark.sources.delta import write_delta
    from ballista_delta_spark.sources.registry import (
        register_delta, register_parquet,
    )

    loc = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id long, s string"), loc)
    register_delta(spark, "rr_view", loc)
    assert _delta_views.get("rr_view") == loc
    # version-pinned re-registration: read-only, routing dropped
    register_delta(spark, "rr_view", loc, version=0)
    assert "rr_view" not in _delta_views
    # re-register live, then re-bind as a plain parquet view
    register_delta(spark, "rr_view", loc)
    assert "rr_view" in _delta_views
    pq = str(tmp_path / "plain")
    spark.createDataFrame([(9,)], "x long").write.parquet(pq)
    register_parquet(spark, "rr_view", pq)
    assert "rr_view" not in _delta_views
    spark.catalog.dropTempView("rr_view")


def test_variant_guard_not_fooled_by_field_names(spark, tmp_path):
    """The remote-scan variant refusal checks the TYPE tree, not a
    substring of simpleString() — a field NAMED 'my_variant' must not be
    refused (review finding, r11)."""
    from ballista_delta_spark.sources.registry import _has_variant
    from pyspark.sql import types as T

    ok = T.StructType([T.StructField(
        "s", T.StructType([T.StructField("my_variant", T.StringType())])
    )])
    assert not any(_has_variant(f.dataType) for f in ok.fields)
    vt = getattr(T, "VariantType", None)
    if vt is not None:
        bad = T.StructType([T.StructField("v", vt())])
        assert any(_has_variant(f.dataType) for f in bad.fields)
        nested = T.StructType([T.StructField("a", T.ArrayType(vt()))])
        assert any(_has_variant(f.dataType) for f in nested.fields)


def test_register_delta_http_schema_evolution_and_clone_refusal(
    spark, tmp_path
):
    """Files written before an ADD COLUMN null-fill over http (pyarrow's
    projection silently drops absent columns; tbl.column() then raised
    KeyError executor-side), and shallow clones (absolute add paths) are
    refused explicitly instead of fetching garbage URLs (review finding,
    r11)."""
    import pytest as _pytest

    from ballista_delta_spark.sources.delta import (
        alter_columns, clone_delta, write_delta,
    )
    from ballista_delta_spark.sources.registry import register_delta_http

    src = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1,)], "id long"), src)
    alter_columns(src, adds={"extra": "string"})
    write_delta(
        spark.createDataFrame([(2, "x")], "id long, extra string"), src,
        mode="append",
    )
    httpd, port = _serve_delta(str(tmp_path))
    try:
        base = f"http://127.0.0.1:{port}/t"
        df = register_delta_http(spark, "evolved_http", base)
        got = sorted((r.id, r.extra) for r in df.collect())
        assert got == [(1, None), (2, "x")]
        # shallow clone: absolute add paths -> loud refusal
        clone = str(tmp_path / "c")
        clone_delta(src, clone)
        with _pytest.raises(ValueError, match="absolute add-file paths"):
            register_delta_http(
                spark, "clone_http", f"http://127.0.0.1:{port}/c"
            )
    finally:
        httpd.shutdown()
    spark.catalog.dropTempView("evolved_http")


def test_case_variant_reregistration_unroutes_dml(spark, tmp_path):
    """Spark temp-view names are case-insensitive, so a case-variant
    re-registration replaces the SAME view and must displace its DML
    route — a case-sensitive routing map would keep the stale entry,
    sending DELETE to the old Delta table while SELECT reads the new
    source (review finding, r11)."""
    from ballista_delta_spark.session import _delta_views
    from ballista_delta_spark.sources.delta import write_delta
    from ballista_delta_spark.sources.registry import (
        register_delta, register_parquet,
    )

    loc = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id long, s string"), loc)
    register_delta(spark, "CaseView", loc)
    assert "caseview" in _delta_views and "CASEVIEW" in _delta_views
    pq = str(tmp_path / "plain")
    spark.createDataFrame([(9,)], "x long").write.parquet(pq)
    register_parquet(spark, "CASEVIEW", pq)
    assert "CaseView" not in _delta_views
    # and re-registering delta under yet another casing routes again
    register_delta(spark, "caseVIEW", loc)
    assert _delta_views.get("CaseView") == loc
    spark.catalog.dropTempView("caseview")
    from ballista_delta_spark.sources.registry import _unroute_dml
    _unroute_dml("CaseView")


def test_remote_guard_refuses_uri_absolute_add_paths():
    """Foreign shallow clones spell absolute add paths as full URIs
    (s3://..., file:///...); the remote-scan guard must refuse those at
    registration time, not fail with an opaque executor-side 404
    (review finding, r11)."""
    from types import SimpleNamespace

    from ballista_delta_spark.sources.registry import _remote_delta_guards

    def snap(files):
        return SimpleNamespace(
            files=files,
            column_mapping_mode="none",
            schema=SimpleNamespace(fields=[]),
        )

    with pytest.raises(ValueError, match="absolute add-file paths"):
        _remote_delta_guards(
            snap({"s3://src-bucket/part-0.parquet": {}}), "http"
        )
    with pytest.raises(ValueError, match="absolute add-file paths"):
        _remote_delta_guards(
            snap({"/abs/part-0.parquet": {}}), "s3"
        )
    # relative paths pass
    _remote_delta_guards(snap({"part-0.parquet": {}}), "http")


def test_ranged_read_raises_on_short_206_body(tmp_path):
    """r14 hardening: a proxy answering 206 with a SHORTER body than the
    asked range (and a self-consistent Content-Length) must fail loud —
    pyarrow would otherwise misparse the truncated buffer."""
    import http.server
    import threading

    import pytest as _pytest

    from ballista_delta_spark.sources.registry import _RangedHttpFile

    payload = b"x" * 1000

    class _ShortHandler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            # always send only half of any asked range
            chunk = payload[:100]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes 0-99/{len(payload)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(chunk)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ShortHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        f = _RangedHttpFile(
            f"http://127.0.0.1:{httpd.server_address[1]}/f", len(payload)
        )
        with _pytest.raises(OSError, match="short range read"):
            f.read(500)
    finally:
        httpd.shutdown()
