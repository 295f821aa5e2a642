"""Optimistic-concurrency commit: blind-append rebase vs logical conflicts.

delta-spark's ConflictChecker, collapsed to the WriteSerializable rules
that matter for this writer: append vs append never conflicts (the loser
re-commits the same staged files at the next version); anything that saw
a metaData/protocol change or a dataChange remove in the winning commits
fails with ConcurrentWriteException; non-append operations never rebase.

The race is simulated EXACTLY where it happens: ``os.link`` is wrapped so
the "winning" writer's commit file appears an instant before ours tries
to claim the same version — the loser then takes the retry path.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from ballista_delta_spark.sources.delta import (
    ConcurrentWriteException,
    read_delta,
    write_delta,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"), p
    )
    return p


def _inject_winner(monkeypatch, winner_actions: list[dict]):
    """Make the NEXT commit attempt lose the race: just before our
    os.link claims a _delta_log version, the winner's actions are written
    to that exact path."""
    real_link = os.link
    state = {"armed": True}

    def fake(src: str, dst: str):
        if (
            state["armed"]
            and "_delta_log" in dst
            and dst.endswith(".json")
        ):
            state["armed"] = False
            with open(dst, "w") as fh:
                for a in winner_actions:
                    fh.write(json.dumps(a) + "\n")
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", fake)


def _reuse_v0_add(tbl: str) -> dict:
    """An add action replaying a REAL v0 file (so post-rebase reads work)."""
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")) as fh:
        for line in fh:
            act = json.loads(line)
            if "add" in act:
                return {"add": act["add"]}
    raise AssertionError("no add in v0")


def test_blind_append_rebases_over_concurrent_append(
    spark, tbl, monkeypatch
):
    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        _reuse_v0_add(tbl),
    ])
    v = write_delta(
        spark.createDataFrame([(3, "c")], "id int, s string"), tbl,
        mode="append",
    )
    assert v == 2  # v1 went to the winner; we rebased onto v2
    got = read_delta(spark, tbl)
    assert got.filter("s = 'c'").count() == 1
    assert got.count() == 3


def test_blind_append_conflicts_with_concurrent_remove(
    spark, tbl, monkeypatch
):
    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "DELETE"}},
        {"remove": {"path": "nope.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
    ])
    n_before = sum(
        1 for _r, _d, fs in os.walk(tbl) for f in fs
        if f.endswith(".parquet")
    )
    with pytest.raises(ConcurrentWriteException, match="conflicts"):
        write_delta(
            spark.createDataFrame([(3, "c")], "id int, s string"), tbl,
            mode="append",
        )
    # the losing writer cleaned up its staged part-files
    n_after = sum(
        1 for _r, _d, fs in os.walk(tbl) for f in fs
        if f.endswith(".parquet")
    )
    assert n_after == n_before


def test_blind_append_conflicts_with_concurrent_metadata_change(
    spark, tbl, monkeypatch
):
    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "ADD COLUMNS"}},
        {"metaData": {"id": "x", "schemaString": "{}",
                      "partitionColumns": [], "configuration": {},
                      "format": {"provider": "parquet", "options": {}}}},
    ])
    with pytest.raises(ConcurrentWriteException):
        write_delta(
            spark.createDataFrame([(3, "c")], "id int, s string"), tbl,
            mode="append",
        )


def test_overwrite_never_rebases(spark, tbl, monkeypatch):
    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        _reuse_v0_add(tbl),
    ])
    with pytest.raises(ConcurrentWriteException, match="does not rebase"):
        write_delta(
            spark.createDataFrame([(9, "z")], "id int, s string"), tbl,
            mode="overwrite",
        )


def test_parallel_appends_both_succeed(spark, tmp_path):
    """Integration: two threads appending at once — whatever the
    interleaving, both commits land and every row is readable."""
    p = str(tmp_path / "par")
    write_delta(
        spark.createDataFrame([(0, "base")], "id int, s string"), p
    )
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def appender(tag: str):
        df = spark.createDataFrame(
            [(hash(tag) % 1000 + 10, tag)], "id int, s string"
        )
        barrier.wait()
        try:
            write_delta(df, p, mode="append")
        except Exception as exc:  # pragma: no cover - must not happen
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(t,)) for t in ("x", "y")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    got = read_delta(spark, p)
    assert got.count() == 3
    assert {r.s for r in got.collect()} == {"base", "x", "y"}


def test_cross_process_concurrent_blind_appends(tmp_path):
    """Three SEPARATE PROCESSES hammer the same table with blind appends —
    the O_EXCL hard-link commit protocol and the blind-append rebase must
    hold across real process boundaries (the in-process thread test above
    shares one GIL and one page cache; a scheduler+executor deployment,
    like the reference's, does not). Every commit must land exactly once,
    versions must be contiguous, and every row readable."""
    import subprocess
    import sys
    import textwrap

    tbl = str(tmp_path / "xproc")
    n_procs, n_commits = 3, 6

    worker = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, {repo!r})
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
        from ballista_delta_spark.session import get_spark
        from ballista_delta_spark.sources.delta import write_delta

        tag, tbl = int(sys.argv[1]), sys.argv[2]
        spark = get_spark(app_name=f"xproc-{{tag}}", cpus=2)
        for i in range({n_commits}):
            df = spark.createDataFrame(
                [(tag * 1000 + i, f"p{{tag}}")], "id long, src string"
            )
            write_delta(df, tbl, mode="append")
        print("DONE", tag)
        spark.stop()
        """
    ).format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             n_commits=n_commits)

    # seed the table so every worker starts from an existing log
    from ballista_delta_spark.sources.delta import (
        _load_snapshot,
        read_delta,
        write_delta,
    )
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    if spark is None:
        from ballista_delta_spark.session import get_spark

        spark = get_spark(cpus=4)
    write_delta(
        spark.createDataFrame([(-1, "seed")], "id long, src string"), tbl
    )

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(t), tbl],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for t in range(n_procs)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        assert "DONE" in out

    snap = _load_snapshot(tbl)
    assert snap.version == n_procs * n_commits  # contiguous, none lost
    got = read_delta(spark, tbl)
    assert got.count() == 1 + n_procs * n_commits
    ids = sorted(r.id for r in got.collect())
    want = sorted(
        [-1] + [t * 1000 + i for t in range(n_procs) for i in range(n_commits)]
    )
    assert ids == want


# -------------------------- staging-window races (review finding, r11)
def test_commit_detects_race_inside_staging_window(spark, tbl):
    """A commit that landed BETWEEN snapshot load and _try_commit entry
    must take the same conflict walk as one landing after entry —
    claiming _next_version outright skipped conflict detection for the
    whole Spark staging window (the interval where races actually
    happen)."""
    import time as _time

    from ballista_delta_spark.sources.delta import (
        _load_snapshot, _try_commit,
    )

    snap = _load_snapshot(tbl)  # reader anchored at v0
    # Interloper wins the next version while "we" are staging.
    write_delta(
        spark.createDataFrame([(7, "g")], "id int, s string"), tbl,
        mode="append",
    )
    # A non-append op (delete) carrying the stale snapshot must refuse.
    with pytest.raises(ConcurrentWriteException, match="does not rebase"):
        _try_commit(
            tbl,
            [
                {"commitInfo": {
                    "timestamp": int(_time.time() * 1000),
                    "operation": "DELETE", "operationParameters": {},
                }},
                {"remove": {"path": "gone.parquet", "deletionTimestamp": 0,
                            "dataChange": True}},
            ],
            [],
            op_kind="delete",
            snap=snap,
        )


def test_blind_append_rebases_over_staging_window_append(spark, tbl):
    import time as _time

    from ballista_delta_spark.sources.delta import (
        _load_snapshot, _try_commit,
    )

    snap = _load_snapshot(tbl)  # v0
    write_delta(
        spark.createDataFrame([(8, "h")], "id int, s string"), tbl,
        mode="append",
    )  # interloper commits v1 (conflict-free for appends)
    v = _try_commit(
        tbl,
        [
            {"commitInfo": {
                "timestamp": int(_time.time() * 1000),
                "operation": "WRITE", "operationParameters": {},
            }},
            _reuse_v0_add(tbl),
        ],
        [],
        op_kind="blind_append",
        snap=snap,
    )
    assert v == 2  # walked v1, found it append-safe, rebased


def test_concurrent_deletes_do_not_resurrect_rows(spark, tmp_path):
    """Two DELETEs racing on the same file: the loser must raise, not
    rewrite the file from its stale pre-image (which would resurrect the
    winner's deleted rows). Simulated by interleaving at the snapshot
    level: the loser's snapshot predates the winner's commit."""
    from ballista_delta_spark.sources.delta import DeltaTable
    from ballista_delta_spark.sources.delta_dml import delete_delta

    tbl2 = str(tmp_path / "t2")
    write_delta(
        spark.createDataFrame(
            [(i, "x") for i in range(10)], "id int, s string"
        ).coalesce(1),
        tbl2,
    )
    # Capture the loser's view, then let the winner delete id=1.
    import ballista_delta_spark.sources.delta_dml as dml

    real_dt = dml.DeltaTable
    stale = real_dt(tbl2)
    delete_delta(spark, tbl2, "id = 1")  # winner commits v1

    class _StaleOnce:
        calls = 0

        def __new__(cls, path=None, *a, **kw):
            if path is None:
                # _subset_df's DeltaTable.__new__(DeltaTable) shell
                return real_dt.__new__(real_dt)
            _StaleOnce.calls += 1
            if _StaleOnce.calls == 1 and path == tbl2:
                return stale
            return real_dt(path, *a, **kw)

    dml.DeltaTable = _StaleOnce
    try:
        with pytest.raises(ConcurrentWriteException):
            delete_delta(spark, tbl2, "id = 2")
    finally:
        dml.DeltaTable = real_dt
    # winner's delete intact, loser left no trace
    ids = sorted(r.id for r in read_delta(spark, tbl2).collect())
    assert ids == [0] + list(range(2, 10))


def test_rebased_append_allocates_fresh_row_ids(spark, tmp_path, monkeypatch):
    """Row-tracking rebase soundness (r14 review): a blind append that
    loses the race to ANOTHER row-tracked append must reassign its
    baseRowIds above the winner's high-water mark — re-committing the
    ids computed from the stale snapshot would hand two different files
    the same fresh row ids (the spec's one uniqueness invariant)."""
    from ballista_delta_spark.sources.delta import (
        _load_snapshot, alter_properties,
    )

    p = str(tmp_path / "t")
    write_delta(spark.range(10).selectExpr("id", "id * 2 AS v"), p)
    alter_properties(spark, p, {"delta.enableRowTracking": "true"})
    snap0 = _load_snapshot(p)
    hwm0 = json.loads(snap0.domain_metadata["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm0 == 9

    # the winner: a concurrent row-tracked append claiming ids 10..14
    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        {"add": {
            "path": "winner.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "stats": json.dumps({"numRecords": 5}),
            "baseRowId": hwm0 + 1, "defaultRowCommitVersion": 2,
        }},
        {"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": hwm0 + 5}),
            "removed": False,
        }},
    ])
    write_delta(
        spark.range(100, 107).selectExpr("id", "id * 2 AS v"), p,
        mode="append",
    )
    snap = _load_snapshot(p)
    spans = []
    for a in snap.files.values():
        n = json.loads(a.get("stats") or "{}").get("numRecords") or 1
        assert a.get("baseRowId") is not None
        spans.append((int(a["baseRowId"]), int(a["baseRowId"]) + int(n) - 1))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"row-id ranges overlap: {spans}"
    hwm = json.loads(snap.domain_metadata["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm == max(hi for _lo, hi in spans)
    assert hwm >= hwm0 + 5 + 7  # winner's 5 rows + our 7, no reuse


def test_metadata_ops_fail_closed_on_staging_window_race(
    spark, tbl, monkeypatch
):
    """r14 review: metadata ops (ALTER ... PROPERTIES / CONSTRAINTS)
    must anchor on the snapshot they READ — a commit landing in their
    staging window previously got silently clobbered (the re-emitted
    metaData is last-writer-wins), now it raises."""
    from ballista_delta_spark.sources.delta import (
        alter_constraints, alter_properties,
    )

    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        _reuse_v0_add(tbl),
    ])
    with pytest.raises(ConcurrentWriteException):
        alter_properties(spark, tbl, {"delta.appendOnly": "false"})

    _inject_winner(monkeypatch, [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        _reuse_v0_add(tbl),
    ])
    with pytest.raises(ConcurrentWriteException):
        alter_constraints(spark, tbl, add={"c_pos": "id > 0"})
