"""Structured-Streaming source for Delta tables (Spark 4 Python Data
Source API) — ``spark.readStream.format("delta_stream")`` tails the
transaction log and emits each commit's appended rows as a micro-batch,
the delta-spark streaming-source behavior re-expressed through
``pyspark.sql.datasource``.

Offsets are log versions: offset ``{"version": v}`` means "every commit
≤ v has been emitted", so recovery/replay is exact — ``readBetweenOffsets``
re-reads precisely the add-actions of the commits in range. Consumption is
append-only like delta-spark's default: a ``dataChange`` remove (DELETE/
UPDATE/overwrite) raises unless ``ignoreChanges`` is set, because silently
skipping it would desync every downstream aggregate.

Scale note: the per-batch work is reading the NEW files of each commit
(O(churn)); the Python-side Arrow read is the simple-reader trade
(prefetched single-partition batches). For the heavy batch path use
``read_delta`` — this source exists for the incremental tail.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql import types as T

from .delta import _load_snapshot, _log_dir, _strip_file_scheme, _version_file


def _pv_caster(dt: T.DataType):
    """String -> Python value for a partition column of the given type."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float
    if isinstance(dt, T.BooleanType):
        return lambda s: s.lower() == "true"
    if isinstance(dt, T.DateType):
        import datetime

        return datetime.date.fromisoformat
    return str


class DeltaStreamDataSource(DataSource):
    """``format("delta_stream").option("path", <table>)``.

    ``option("readChangeFeed", "true")`` switches the source to the
    CHANGE-FEED mode (delta-spark's streaming CDF): each micro-batch
    emits row-level changes — table columns plus ``_change_type``
    (insert / update_preimage / update_postimage / delete) and
    ``_commit_version`` — sourced from the commits' ``cdc`` actions
    (written under ``_change_data/`` by CDF-enabled DML) or, for
    append-only commits, derived from their add actions as inserts.
    """

    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def _cdf(self) -> bool:
        return str(
            self.options.get("readchangefeed", "false")
        ).lower() == "true"

    def schema(self):
        snap = _load_snapshot(_strip_file_scheme(self.options["path"]))
        if not self._cdf():
            return snap.schema
        return T.StructType(
            list(snap.schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def simpleStreamReader(self, schema: T.StructType):
        return _DeltaSimpleStreamReader(
            self.options["path"],
            schema,
            starting_version=int(self.options.get("startingversion", 0)),
            ignore_changes=str(
                self.options.get("ignorechanges", "false")
            ).lower() == "true",
            read_change_feed=self._cdf(),
            max_versions_per_trigger=self._max_versions(),
        )

    def _max_versions(self) -> int | None:
        raw = self.options.get("maxversionspertrigger")
        if raw is None:
            return None
        n = int(raw)
        if n <= 0:
            raise ValueError(
                f"maxVersionsPerTrigger must be positive, got {n}"
            )
        return n


class _DeltaSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: T.StructType,
        starting_version: int = 0,
        ignore_changes: bool = False,
        read_change_feed: bool = False,
        max_versions_per_trigger: int | None = None,
    ):
        self.path = _strip_file_scheme(path)
        self.schema = schema
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes
        self.read_change_feed = read_change_feed
        # Rate limiting (delta-spark's maxFilesPerTrigger analogue, in
        # commit units): each micro-batch advances the offset at most
        # this many versions, so a stream starting against a long backlog
        # drains it in bounded batches instead of one giant catch-up.
        # CAVEAT vs delta-spark: under trigger(availableNow=True) the
        # Simple reader API treats one read() as "all available", so a
        # rate-limited query takes ONE clamped batch per run — use a
        # continuous trigger to drain a backlog with a rate limit.
        if max_versions_per_trigger is not None and (
            max_versions_per_trigger <= 0
        ):
            raise ValueError(
                "maxVersionsPerTrigger must be positive, got "
                f"{max_versions_per_trigger}"
            )
        self.max_versions_per_trigger = max_versions_per_trigger
        # logical -> physical parquet name (identity unless the table
        # declares columnMapping); cdc partitionValues keys are PHYSICAL
        # per the spec, so keep the reverse map too.
        snap = _load_snapshot(self.path)
        self._phys = {
            f.name: snap.physical(f.name) for f in snap.schema.fields
        }
        self._logical = {v: k for k, v in self._phys.items()}

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def _latest_version(self) -> int:
        log = _log_dir(self.path)
        v = self.starting_version
        latest = self.starting_version - 1
        while os.path.exists(_version_file(log, v)):
            latest = v
            v += 1
        return latest

    def _commit_adds(self, v: int) -> list[dict[str, Any]]:
        adds = []
        with open(_version_file(_log_dir(self.path), v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "add" in act and act["add"].get("dataChange", True):
                    adds.append(act["add"])
                elif (
                    "remove" in act
                    and act["remove"].get("dataChange", True)
                    and not self.ignore_changes
                ):
                    raise ValueError(
                        f"commit {v} removes data "
                        f"({act['remove']['path']}): the table is not "
                        "append-only; set ignoreChanges=true to skip "
                        "removed rows (downstream must tolerate replays)"
                    )
        return adds

    def _rows_for(self, versions: range) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        names = [f.name for f in self.schema.fields]
        # partitionValues are SPEC-STRINGS in the log; cast to the schema's
        # declared types (same rule as the batch reader's Hive recovery).
        casters = {
            f.name: _pv_caster(f.dataType) for f in self.schema.fields
        }
        for v in versions:
            for add in self._commit_adds(v):
                fp = os.path.join(self.path, add["path"])
                tbl = pq.read_table(fp)
                pv = {
                    k: casters.get(k, str)(val) if val is not None else None
                    for k, val in (add.get("partitionValues") or {}).items()
                }
                file_cols = set(tbl.column_names)
                for row in tbl.to_pylist():
                    yield tuple(
                        row[n] if n in file_cols else pv.get(n)
                        for n in names
                    )

    def _commit_actions(self, v: int) -> list[dict[str, Any]]:
        acts = []
        with open(_version_file(_log_dir(self.path), v)) as fh:
            for line in fh:
                if line.strip():
                    acts.append(json.loads(line))
        return acts

    def _cdf_rows_for(self, versions: range) -> Iterator[tuple]:
        """Change rows for the commits in range, spec rule: a commit WITH
        ``cdc`` actions is described by them alone (they carry pre/post
        images and insert rows); a commit without them streams its
        dataChange adds as inserts — but only if it removes nothing (a
        remove without cdc means DML ran while CDF was off, which cannot
        be reconstructed row-level)."""
        import pyarrow.parquet as pq

        data_names = [
            f.name for f in self.schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]
        casters = {
            f.name: _pv_caster(f.dataType) for f in self.schema.fields
        }

        def emit(add_like: dict, v: int, fixed_type: str | None):
            root = self.path
            fp = os.path.join(root, add_like["path"])
            tbl = pq.read_table(fp)
            pv = {
                self._logical.get(k, k): (
                    casters.get(self._logical.get(k, k), str)(val)
                    if val is not None else None
                )
                for k, val in (add_like.get("partitionValues") or {}).items()
            }
            file_cols = set(tbl.column_names)
            for row in tbl.to_pylist():
                ct = fixed_type if fixed_type else row.get("_change_type")
                yield tuple(
                    [
                        row[self._phys.get(n, n)]
                        if self._phys.get(n, n) in file_cols
                        else pv.get(n)
                        for n in data_names
                    ]
                    + [ct, v]
                )

        for v in versions:
            acts = self._commit_actions(v)
            cdc = [a["cdc"] for a in acts if "cdc" in a]
            if cdc:
                for c in cdc:
                    yield from emit(c, v, None)
                continue
            adds = [
                a["add"] for a in acts
                if "add" in a and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"] for a in acts
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            if removes or any(a.get("deletionVector") for a in adds):
                raise ValueError(
                    f"commit {v} changes existing rows but carries no cdc "
                    "files — it predates delta.enableChangeDataFeed=true; "
                    "start the stream at a later startingVersion"
                )
            for add in adds:
                yield from emit(add, v, "insert")

    # Both entry points materialize the batch as a list: the runtime's
    # prefetch cache copy.copy()s the iterator (generators can't be
    # copied), and a micro-batch is churn-sized by construction.
    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        latest = self._latest_version()
        lo = int(start["version"]) + 1
        if self.max_versions_per_trigger is not None:
            latest = min(latest, lo + self.max_versions_per_trigger - 1)
        rows = (
            self._cdf_rows_for(range(lo, latest + 1))
            if self.read_change_feed
            else self._rows_for(range(lo, latest + 1))
        )
        return list(rows), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rng = range(int(start["version"]) + 1, int(end["version"]) + 1)
        return list(
            self._cdf_rows_for(rng)
            if self.read_change_feed
            else self._rows_for(rng)
        )

    def commit(self, end: dict) -> None:
        pass


def register_delta_stream_source(spark) -> None:
    """Idempotently register the delta_stream format on this session."""
    spark.dataSource.register(DeltaStreamDataSource)


def write_stream_to_delta(
    df, path: str, checkpoint_dir: str, available_now: bool = False
):
    """``writeStream`` into a Delta table — the sink half of the loop
    (source half: ``format("delta_stream")``).

    foreachBatch + an append commit: each micro-batch lands one Delta
    version through the same distributed writer as ``write_delta``.
    Spark's checkpoint gives at-least-once batch delivery; EXACTLY-once
    comes from the SetTransaction ledger — every batch commits with
    ``txn_app`` derived from the checkpoint location and ``txn_version =
    batch_id``, so a replayed batch (restart after a crash between the
    Delta commit and the Spark checkpoint write) is recognized in the
    table's own log and skipped. This is delta-spark's txnAppId/
    txnVersion idempotent-sink recipe. ``available_now=True`` drains the
    source and terminates (backfill/test mode). Returns the
    StreamingQuery.
    """
    import hashlib

    from .delta import write_delta

    app_id = "bds-stream-" + hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_delta(
            batch_df, path, mode="append",
            txn_app=app_id, txn_version=int(batch_id),
        )

    writer = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
