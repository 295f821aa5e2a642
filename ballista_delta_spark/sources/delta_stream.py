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
    """``format("delta_stream").option("path", <table>)``."""

    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def schema(self):
        snap = _load_snapshot(_strip_file_scheme(self.options["path"]))
        return snap.schema

    def simpleStreamReader(self, schema: T.StructType):
        return _DeltaSimpleStreamReader(
            self.options["path"],
            schema,
            starting_version=int(self.options.get("startingversion", 0)),
            ignore_changes=str(
                self.options.get("ignorechanges", "false")
            ).lower() == "true",
        )


class _DeltaSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: T.StructType,
        starting_version: int = 0,
        ignore_changes: bool = False,
    ):
        self.path = _strip_file_scheme(path)
        self.schema = schema
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes

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

    # Both entry points materialize the batch as a list: the runtime's
    # prefetch cache copy.copy()s the iterator (generators can't be
    # copied), and a micro-batch is churn-sized by construction.
    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        latest = self._latest_version()
        lo = int(start["version"]) + 1
        return list(self._rows_for(range(lo, latest + 1))), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._rows_for(
            range(int(start["version"]) + 1, int(end["version"]) + 1)
        ))

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
    version through the same distributed writer as ``write_delta``;
    Spark's checkpoint gives at-least-once batch delivery, and exactly-
    once lands when the job records (batch_id -> committed version) — the
    txn app-id pattern delta-spark uses. ``available_now=True`` drains the
    source and terminates (backfill/test mode). Returns the
    StreamingQuery.
    """
    from .delta import write_delta

    def _sink(batch_df, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_delta(batch_df, path, mode="append")

    writer = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
