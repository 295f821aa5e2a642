"""Structured-Streaming source for Delta tables (Spark 4 Python Data
Source API) — ``spark.readStream.format("delta_stream")`` tails the
transaction log and emits each commit's appended rows as a micro-batch,
the delta-spark streaming-source behavior re-expressed through
``pyspark.sql.datasource``.

Offsets are FILE positions in the log — ``{"version": v, "index": i}``
means "the first ``i`` files of commit ``v`` (and every commit before
it) have been emitted" — delta-spark's (reservoirVersion, index) offset
model, so a single bulk commit can span several rate-limited
micro-batches and recovery/replay is exact: ``partitions(start, end)``
re-plans precisely the file slice in range. The legacy whole-commit form
``{"version": v}`` is still accepted (reads as "commit v fully
consumed"). Consumption is append-only like delta-spark's default: a
``dataChange`` remove (DELETE/UPDATE/overwrite) raises unless
``ignoreChanges`` is set, because silently skipping it would desync
every downstream aggregate.

Stream START matches delta-spark's documented defaults: with no
``startingVersion``/``startingTimestamp`` the source serves the table's
CURRENT snapshot as the initial batch(es) — offset form ``{"version": V,
"index": i, "snapshot": true}``, ``i`` files of the version-``V``
snapshot's active set emitted, deletion vectors applied — then tails
commits ``> V``. This is delta-spark's isStartingVersion phase, and it
is what makes the default correct on a checkpointed + VACUUMed table
whose early JSON commits were reaped (replaying from version 0 there
would read dead history or fail). ``startingVersion="latest"`` skips
existing data entirely (changes from now on); a numeric
``startingVersion`` / ``startingTimestamp`` replays the log from that
commit, exactly as before.

Scale shape: this is the full ``DataSourceStreamReader`` — planning
(log scan, offset arithmetic, append-only validation) happens once on the
driver and is O(#actions in the commit range); each added file becomes
ONE input partition, so a multi-file commit (a bulk backfill replay, CDF
over a big MERGE) fans out across the cluster instead of funnelling
through a single Python iterator; and each task emits Arrow RecordBatches
straight from the parquet read — no per-row Python tuples anywhere. This
matches delta-spark's per-file task model (one FileSourceScan split per
add) rather than the prior ``SimpleDataSourceStreamReader`` shape, whose
single prefetched partition was the repo's last row-at-a-time surface.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql import types as T

from .delta import (
    _fs_join,
    _load_snapshot,
    _log_dir,
    _next_version,
    _strip_file_scheme,
    _version_file,
)


def _session_tz():
    """The active Spark session's ``spark.sql.session.timeZone`` as a
    tzinfo (UTC when no session is up or the zone is unknown) — the zone
    delta-spark resolves naive ``startingTimestamp`` strings in."""
    import datetime

    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            from zoneinfo import ZoneInfo

            return ZoneInfo(spark.conf.get("spark.sql.session.timeZone"))
    except Exception:
        pass
    return datetime.timezone.utc


def _earliest_surviving_version(path: str) -> int:
    """Earliest commit whose JSON still exists (0 until log cleanup)."""
    try:
        names = os.listdir(_log_dir(path))
    except OSError:
        return 0
    surviving = [
        int(n.split(".")[0]) for n in names
        if n.endswith(".json") and n.split(".")[0].isdigit()
        and len(n.split(".")[0]) == 20 and ".compacted." not in n
    ]
    return min(surviving) if surviving else 0


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
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        import datetime

        # Delta spells timestamp partitionValues zone-less with a space
        # ('2021-01-01 00:00:00[.ffffff]'); arrow's cast of the raw
        # string to a tz-aware type rejects it ('expected a zone
        # offset'), so parse to datetime here.
        return lambda s: datetime.datetime.fromisoformat(
            s.replace(" ", "T")
        )
    return str


@dataclass
class DeltaFilePartition(InputPartition):
    """One added (or cdc) file of one commit = one Spark task.

    ``fixed_change`` carries the CDF change type when it is implied by the
    action kind (``"insert"`` for plain adds) rather than stored in the
    file; ``None`` in CDF mode means the file is a ``cdc`` file whose
    ``_change_type`` column is authoritative.
    """

    version: int
    rel_path: str
    partition_values: dict[str, Any] = field(default_factory=dict)
    fixed_change: str | None = None
    # Deletion-vector descriptor (initial-snapshot files AND DV-carrying
    # tail adds under ignoreChanges): applied executor-side so the batch
    # serves live rows, not the raw parquet.
    dv: dict[str, Any] | None = None
    # File size from the add action — the maxBytesPerTrigger admission
    # currency (0 when the log omits it: such files cost nothing against
    # the byte budget but still count against maxFilesPerTrigger).
    size: int = 0


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

    def _snapshot(self):
        # schema() and streamReader() both run on the driver for the same
        # options; memoize so stream startup replays the log/checkpoint
        # ONCE, not once per hook (replay is the dominant open cost on a
        # large table).
        if getattr(self, "_snap_cache", None) is None:
            self._snap_cache = _load_snapshot(
                _strip_file_scheme(self.options["path"])
            )
        return self._snap_cache

    def schema(self):
        snap = self._snapshot()
        if not self._cdf():
            return snap.schema
        return T.StructType(
            list(snap.schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def streamReader(self, schema: T.StructType):
        def flag(key: str) -> bool:
            return str(self.options.get(key, "false")).lower() == "true"

        return DeltaStreamReader(
            self.options["path"],
            schema,
            starting_version=self._starting_version(),
            ignore_changes=flag("ignorechanges"),
            ignore_deletes=flag("ignoredeletes"),
            skip_change_commits=flag("skipchangecommits"),
            read_change_feed=self._cdf(),
            max_versions_per_trigger=self._limit("maxversionspertrigger"),
            max_files_per_trigger=self._limit("maxfilespertrigger"),
            max_bytes_per_trigger=self._bytes_limit("maxbytespertrigger"),
            snapshot=self._snapshot(),
        )

    def _starting_version(self) -> int | str | None:
        """``startingVersion`` or ``startingTimestamp`` (ISO-8601 or
        ``YYYY-MM-DD HH:MM:SS``), delta-spark's pair of stream-start
        options: a timestamp resolves to the first commit AT or AFTER it
        via the table's commit-time index (ICT-aware). ``None`` (neither
        option set) selects the delta-spark DEFAULT — initial snapshot,
        then tail; the string ``"latest"`` means changes-from-now-on."""
        sv = self.options.get("startingversion")
        st = self.options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "set either startingVersion or startingTimestamp, not both"
            )
        if sv is not None:
            return "latest" if str(sv).lower() == "latest" else int(sv)
        if st is None:
            return None
        import datetime

        from .delta import version_at_timestamp

        dt = datetime.datetime.fromisoformat(str(st).replace(" ", "T"))
        if dt.tzinfo is None:
            # delta-spark interprets a zone-less timestamp in the SPARK
            # SESSION timezone, not UTC — a naive "00:00:00" under
            # America/Los_Angeles means 07:00/08:00 UTC, and pinning UTC
            # here would replay hours of extra commits into the sink.
            dt = dt.replace(tzinfo=_session_tz())
        ts_ms = int(dt.timestamp() * 1000)
        path = _strip_file_scheme(self.options["path"])
        # delta-spark semantics: start at the first commit whose
        # timestamp is >= the requested one. version_at_timestamp gives
        # the LAST commit <= ts (time-travel semantics), so resolve
        # against ts-1: (last commit strictly before ts) + 1 is exactly
        # the first commit at-or-after ts.
        try:
            return version_at_timestamp(path, ts_ms - 1) + 1
        except ValueError:
            # Timestamp predates the earliest SURVIVING commit. Version 0
            # is only replayable while its JSON still exists; after log
            # retention cleanup the stream must anchor at the earliest
            # reconstructable commit or the first _plan() call crashes on
            # the reaped 00000000000000000000.json.
            return _earliest_surviving_version(path)

    def _limit(self, key: str) -> int | None:
        raw = self.options.get(key)
        if raw is None:
            return None
        n = int(raw)
        if n <= 0:
            raise ValueError(f"{key} must be positive, got {n}")
        return n

    def _bytes_limit(self, key: str) -> int | None:
        """Byte limits accept delta-spark's size-suffix forms: plain
        bytes, or ``10k`` / ``100m`` / ``1g``."""
        raw = self.options.get(key)
        if raw is None:
            return None
        s = str(raw).strip().lower().removesuffix("b")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(s[-1:], 1)
        if mult != 1:
            s = s[:-1]
        n = int(s) * mult
        if n <= 0:
            raise ValueError(f"{key} must be positive, got {raw!r}")
        return n


class DeltaStreamReader(DataSourceStreamReader):
    """Driver side: offset arithmetic + per-commit planning (cheap log
    reads). Executor side: ``read(partition)`` — parquet -> Arrow
    RecordBatches, partition values injected as constant columns."""

    def __init__(
        self,
        path: str,
        schema: T.StructType,
        starting_version: int | str | None = 0,
        ignore_changes: bool = False,
        ignore_deletes: bool = False,
        skip_change_commits: bool = False,
        read_change_feed: bool = False,
        max_versions_per_trigger: int | None = None,
        max_files_per_trigger: int | None = None,
        max_bytes_per_trigger: int | None = None,
        snapshot=None,
    ):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.path = _strip_file_scheme(path)
        self.schema = schema
        # Non-append tolerance ladder (delta-spark's three options):
        # ignoreDeletes tolerates DELETE-ONLY commits (skipped whole);
        # ignoreChanges also tolerates rewrites (their adds REPLAY);
        # skipChangeCommits skips any remove-carrying commit entirely.
        self.ignore_changes = ignore_changes
        self.ignore_deletes = ignore_deletes
        self.skip_change_commits = skip_change_commits
        self.read_change_feed = read_change_feed
        # Rate limiting: ``maxFilesPerTrigger`` bounds each micro-batch by
        # FILE count (delta-spark's option — with file-granular offsets a
        # 10k-file bulk commit drains in bounded batches instead of one
        # giant catch-up); ``maxVersionsPerTrigger`` bounds by commit
        # count. CAVEAT vs delta-spark: under trigger(availableNow=True)
        # Spark snapshots latestOffset() ONCE at query start, so a
        # rate-limited query takes ONE clamped batch per run — use a
        # continuous trigger to drain a backlog with a rate limit.
        # Positivity is checked at BOTH public entry points: the
        # DataSource's _limit/_bytes_limit (option strings, better error
        # text) and here (direct constructions) — each is pinned.
        for nm, val in (
            ("maxVersionsPerTrigger", max_versions_per_trigger),
            ("maxFilesPerTrigger", max_files_per_trigger),
            ("maxBytesPerTrigger", max_bytes_per_trigger),
        ):
            if val is not None and val <= 0:
                raise ValueError(f"{nm} must be positive, got {val}")
        self.max_versions_per_trigger = max_versions_per_trigger
        self.max_files_per_trigger = max_files_per_trigger
        # Soft cap, delta-spark admission semantics: files are admitted
        # while the running byte total is below the cap, so a batch may
        # overshoot by at most one file — and always takes at least one.
        self.max_bytes_per_trigger = max_bytes_per_trigger
        # logical -> physical parquet name (identity unless the table
        # declares columnMapping); cdc partitionValues keys are PHYSICAL
        # per the spec, so keep the reverse map too. The DataSource hands
        # its already-replayed snapshot down; direct constructions
        # (tests) load here.
        snap = snapshot if snapshot is not None else _load_snapshot(self.path)
        self._phys = {
            f.name: snap.physical(f.name) for f in snap.schema.fields
        }
        self._logical = {v: k for k, v in self._phys.items()}
        # Stream-start mode (resolved ONCE, at query start on the driver):
        #   None      -> delta-spark default: serve the CURRENT snapshot as
        #                batch 0, then tail commits > snapshot version;
        #   "latest"  -> changes-from-now-on (skip existing data);
        #   int       -> replay the log from that commit (legacy behavior).
        self._init_snap = snap
        self._snap_version: int | None = None
        self._snap_plans: dict[int, list[DeltaFilePartition]] = {}
        if starting_version is None:
            self._snap_version = snap.version
            self.starting_version = snap.version + 1
        elif starting_version == "latest":
            self.starting_version = snap.version + 1
        else:
            self.starting_version = int(starting_version)
        # Schema-stability fingerprint (r13 concurrency review): the
        # stream's column maps and Arrow cast shape are resolved ONCE at
        # query start, so a metaData action in a LATER commit that
        # changes the physical field set, a type, or the partition
        # columns would be silently absorbed — worst case the executor's
        # cast(..., safe=False) WRAPS values written after a mid-stream
        # type widening instead of failing. delta-spark stops the stream
        # on any such change ("Detected schema change", restart to pick
        # it up); _check_schema_stable mirrors that. Config-only
        # metaData updates (table properties) keep the sig and pass.
        self._start_sig = (
            self._schema_sig(snap.metadata_raw)
            if snap.metadata_raw else None
        )
        # The exact Arrow shape Spark expects back from read(); computed
        # once here (driver) and shipped pickled with the reader.
        self._arrow_schema = to_arrow_schema(schema)
        # Last position this reader PLANNED (latestOffset return); the
        # rate-limit clamps are relative to it. After a checkpoint restart
        # Spark never tells latestOffset() where it resumed, so the first
        # trigger may plan past the clamp — partitions() re-anchors from
        # its (checkpointed) start argument, so correctness is unaffected
        # either way.
        self._planned: tuple[int, int, bool] | None = None
        # Commits are immutable: per-version plans cache cleanly. Pruned
        # in commit() so a long-lived tail stays O(uncommitted window).
        self._plans: dict[int, list[DeltaFilePartition]] = {}

    # ------------------------------------------------------------ offsets
    def __getstate__(self):
        """Executor tasks pickle the whole reader (pyspark's
        data_source_read_func closes over it); read() needs only the
        path/schema/column maps and flags — shipping the driver-side
        planning state would serialize the initial snapshot's ENTIRE
        columnar add set (hundreds of MB on a million-add table) into
        every task command."""
        state = self.__dict__.copy()
        for k in ("_init_snap", "_plans", "_snap_plans"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        # Defensive: a deserialized copy can still PLAN (empty caches,
        # snapshot reloaded lazily by _snap_plan) even though only
        # read() is expected to run off-driver.
        self.__dict__.update(state)
        self.__dict__.setdefault("_plans", {})
        self.__dict__.setdefault("_snap_plans", {})
        self.__dict__.setdefault("_init_snap", None)
        self.__dict__.setdefault("_start_sig", None)

    @staticmethod
    def _pos(off: dict) -> tuple[int, int, bool]:
        """Offset dict -> (version, files_consumed_of_that_version,
        in_snapshot). Legacy ``{"version": v}`` = commit v fully consumed
        = ``(v+1, 0)`` — both forms denote the same log position. A
        snapshot-phase position's index counts files of the version-``v``
        SNAPSHOT (active set), not of commit ``v``; snapshot positions
        order before every tail position (tail commits are ``> v``), so
        plain tuple comparison stays a total order within one stream."""
        if "index" in off:
            return (
                int(off["version"]), int(off["index"]),
                bool(off.get("snapshot", False)),
            )
        return int(off["version"]) + 1, 0, False

    @staticmethod
    def _off(v: int, i: int, snap: bool) -> dict:
        off: dict[str, Any] = {"version": v, "index": i}
        if snap:
            off["snapshot"] = True
        return off

    def initialOffset(self) -> dict:
        if self._snap_version is not None:
            return self._off(self._snap_version, 0, True)
        return {"version": self.starting_version, "index": 0}

    def _latest_version(self) -> int:
        # One directory listing, not an exists() walk anchored at the
        # query-start version: metadata retention deletes old JSON
        # commits, and a walk from starting_version stalls forever at
        # the first gap — latestOffset would return the stale anchor on
        # every trigger and the stream would silently never serve
        # another commit. The listing is also O(log dir) per trigger,
        # independent of stream age. A stream whose NEXT version was
        # itself cleaned (stalled past retention) now fails loudly in
        # _commit_actions instead of hanging, matching delta-spark.
        latest = _next_version(_log_dir(self.path)) - 1
        return max(latest, self.starting_version - 1)

    def latestOffset(self) -> dict:
        self._trace(f"latestOffset planned={self._planned}")
        actual = self._latest_version()
        if self._planned is not None:
            v, i, insnap = self._planned
        elif self._snap_version is not None:
            # Cold anchor at the snapshot phase. On a checkpoint RESTART
            # this is a guess that may disagree with the stream's true
            # (tail) phase — which is safe because Spark re-executes the
            # last offset-log pair through partitions() BEFORE the first
            # latestOffset() on every restart (verified empirically via
            # BDS_STREAM_TRACE for both availableNow and processingTime
            # triggers; tests/test_delta_stream.py pins both e2e), so the
            # checkpointed offsets always re-anchor/adopt first and this
            # branch only ever plans for genuinely fresh streams.
            v, i, insnap = self._snap_version, 0, True
        else:
            v, i, insnap = self.starting_version, 0, False
        fbudget = self.max_files_per_trigger    # None = unbounded
        bbudget = self.max_bytes_per_trigger
        vbudget = self.max_versions_per_trigger
        rate_limited = fbudget is not None or bbudget is not None

        def has_budget() -> bool:
            return (fbudget is None or fbudget > 0) and (
                bbudget is None or bbudget > 0
            )

        def consume(plan: list[DeltaFilePartition], j: int) -> int:
            """Admit plan[j:] files while budgets allow (bytes are a soft
            cap: a file is admitted while the running total is under it,
            so the batch can overshoot by one file but never starves)."""
            nonlocal fbudget, bbudget
            while j < len(plan) and has_budget():
                if fbudget is not None:
                    fbudget -= 1
                if bbudget is not None:
                    bbudget -= plan[j].size or 0
                j += 1
            return j

        if insnap:
            # Initial-snapshot phase: drain the version-v snapshot's
            # active set under the file/byte budgets (the snapshot counts
            # as ONE version against maxVersionsPerTrigger), then fall
            # through to the log tail at v+1.
            plan = self._snap_plan(v)
            j = consume(plan, i) if rate_limited else len(plan)
            took = j - i
            i = j
            if took > 0 and vbudget is not None:
                vbudget -= 1
            if (
                i < len(plan)          # budget hit mid-snapshot
                or actual <= v         # no tail commits yet
                or not has_budget()
                or vbudget == 0
            ):
                self._planned = (v, i, True)
                return self._off(v, i, True)
            v, i, insnap = v + 1, 0, False
        if actual < v:  # no commits yet
            self._planned = (v, i, False)
            return self._off(v, i, False)
        # Normalize the anchor past fully-consumed commits FIRST, so the
        # version clamp below always counts unconsumed versions — without
        # this, an EMPTY commit (pure metadata) pins a
        # maxVersionsPerTrigger=1 stream forever (hypothesis-found).
        while v < actual and i >= len(self._plan(v)):
            v, i = v + 1, 0
        latest = actual
        if vbudget is not None:
            latest = min(latest, v + vbudget - 1)
        if not rate_limited:
            # Unbounded: consume through the end of the last commit.
            if latest >= v:
                v, i = latest, len(self._plan(latest))
        else:
            while v <= latest:
                plan = self._plan(v)
                i = consume(plan, i)
                if i < len(plan) or not has_budget():
                    break
                if v == latest:
                    break  # fully consumed; keep canonical (latest, n)
                v, i = v + 1, 0
        self._planned = (v, i, False)
        return self._off(v, i, False)

    # ----------------------------------------------------------- planning
    @staticmethod
    def _schema_sig(md: dict) -> tuple:
        """The parts of a metaData action whose change breaks in-flight
        reads: (physical name, type JSON) per top-level field, plus the
        partition columns (their values are injected from the log, keyed
        physically). A RENAME under column mapping keeps the physical
        name and type, so it keeps the sig — the stream keeps serving
        correct values under its start-time logical names, exactly the
        fixed-schema contract Spark streaming already imposes."""
        try:
            fields = (
                json.loads(md.get("schemaString") or "{}").get("fields")
                or []
            )
        except ValueError:
            return ("unparseable",)
        return (
            tuple(
                (
                    (f.get("metadata") or {}).get(
                        "delta.columnMapping.physicalName", f.get("name")
                    ),
                    json.dumps(f.get("type"), sort_keys=True),
                )
                for f in fields
            ),
            tuple(md.get("partitionColumns") or []),
        )

    def _check_schema_stable(
        self, acts: list[dict[str, Any]], v: int
    ) -> None:
        for a in acts:
            md = a.get("metaData")
            if not md or self._start_sig is None:
                continue
            if self._schema_sig(md) != self._start_sig:
                raise ValueError(
                    f"detected a schema change in commit {v} of "
                    f"{self.path}: the stream resolved its schema at "
                    "query start and cannot serve data written under a "
                    "different physical field set or type (a mid-stream "
                    "type widening would otherwise be CAST unsafely). "
                    "Restart the streaming query to adopt the new schema."
                )

    def _commit_actions(self, v: int) -> list[dict[str, Any]]:
        acts = []
        with open(_version_file(_log_dir(self.path), v)) as fh:
            for line in fh:
                if line.strip():
                    acts.append(json.loads(line))
        return acts

    def _snap_plan(self, v: int) -> list[DeltaFilePartition]:
        """Active file set of the table AS OF version ``v``, sorted by
        path (deterministic slicing under rate limits). Deletion-vector
        descriptors ride along so ``read()`` serves live rows; CDF mode
        stamps every row ``insert`` at the snapshot version, delta-spark's
        initial-snapshot CDF shape."""
        if v not in self._snap_plans:
            snap = (
                self._init_snap
                if self._init_snap is not None
                and v == self._init_snap.version
                else _load_snapshot(self.path, version=v)
            )
            self._snap_plans[v] = [
                DeltaFilePartition(
                    v, rel, add.get("partitionValues") or {},
                    "insert", add.get("deletionVector"),
                    int(add.get("size") or 0),
                )
                for rel, add in sorted(snap.files.items())
            ]
        return self._snap_plans[v]

    def _plan(self, v: int) -> list[DeltaFilePartition]:
        if v not in self._plans:
            self._plans[v] = (
                self._plan_cdf(v) if self.read_change_feed
                else self._plan_append(v)
            )
        return self._plans[v]

    def _plan_append(self, v: int) -> list[DeltaFilePartition]:
        acts = self._commit_actions(v)
        self._check_schema_stable(acts, v)
        adds = [
            a["add"] for a in acts
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"] for a in acts
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        if removes:
            if self.skip_change_commits:
                # delta-spark skipChangeCommits: any remove-carrying
                # commit is skipped WHOLE (its adds too — they are
                # rewrites of rows already served).
                return []
            if not self.ignore_changes:
                if not adds and self.ignore_deletes:
                    # delete-only commit (e.g. a partition drop):
                    # tolerated and skipped under ignoreDeletes.
                    return []
                raise ValueError(
                    f"commit {v} removes data "
                    f"({removes[0]['path']}): the table is not "
                    "append-only; set ignoreDeletes=true to skip "
                    "delete-only commits, ignoreChanges=true to also "
                    "replay rewrites, or skipChangeCommits=true to skip "
                    "changed commits entirely"
                )
        return [
            DeltaFilePartition(
                v, add["path"], add.get("partitionValues") or {},
                # A DV-mode DELETE/UPDATE re-adds the path WITH a
                # deletionVector (dataChange=true): replaying the add
                # without it would emit the rows the commit itself marks
                # deleted (readers MUST apply DVs, Delta PROTOCOL.md) —
                # ignoreChanges tolerates rewrites, not row resurrection.
                dv=add.get("deletionVector"),
                size=int(add.get("size") or 0),
            )
            for add in adds
        ]

    def _plan_cdf(self, v: int) -> list[DeltaFilePartition]:
        """Spec rule: a commit WITH ``cdc`` actions is described by them
        alone (they carry pre/post images and insert rows); a commit
        without them streams its dataChange adds as inserts — but only if
        it removes nothing (a remove without cdc means DML ran while CDF
        was off, which cannot be reconstructed row-level)."""
        acts = self._commit_actions(v)
        self._check_schema_stable(acts, v)
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        if cdc:
            return [
                DeltaFilePartition(v, c["path"],
                                   c.get("partitionValues") or {},
                                   size=int(c.get("size") or 0))
                for c in cdc
            ]
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
        return [
            DeltaFilePartition(v, a["path"],
                               a.get("partitionValues") or {}, "insert",
                               size=int(a.get("size") or 0))
            for a in adds
        ]

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[DeltaFilePartition]:
        sv, si, ssnap = self._pos(start)
        ev, ei, esnap = self._pos(end)
        self._trace(f"partitions {start} -> {end}")
        # The CHECKPOINTED offsets are ground truth for which phase the
        # stream is in — a restarted reader's own cold-start snapshot
        # resolution (possibly at a NEWER version) is just a guess:
        #  - snap start: adopt ITS snapshot version, whatever we resolved;
        #  - tail start: the snapshot phase (if any) finished before the
        #    checkpoint — drop a cold snap-mode anchor so it can never
        #    re-serve already-consumed snapshot files.
        if ssnap:
            self._snap_version = sv
        elif self._planned is not None and self._planned[2]:
            self._planned = None
        consistent = (
            (ssnap and esnap and sv == ev)        # mid-snapshot batch
            or (ssnap and not esnap and ev > sv)  # snapshot finish + tail
            or (not ssnap and not esnap)          # pure tail batch
        )
        if not consistent:
            # Inconsistent pair: a cold-start snapshot GUESS mixed with
            # checkpointed offsets. Spark replays the last offset-log
            # pair through partitions() BEFORE the first latestOffset()
            # on every restart (verified empirically via
            # BDS_STREAM_TRACE for availableNow and processingTime), so
            # a correctly-ordered restart can never produce this pair —
            # it only arises if latestOffset() answered from its cold
            # anchor first. Serving an empty batch here would let Spark
            # COMMIT the bogus end offset and silently skip every row
            # between the trusted start and the guess (data loss, not
            # self-healing), so fail loudly instead: the restart replays
            # the checkpointed pair and recovers cleanly.
            raise ValueError(
                f"inconsistent stream offset pair: start {start} and end "
                f"{end} mix snapshot/tail phases that no in-order "
                "restart produces; restarting the query recovers from "
                "the checkpoint"
            )
        parts: list[DeltaFilePartition] = []
        if ssnap:
            snap_plan = self._snap_plan(sv)
            parts.extend(snap_plan[si : ei if esnap else len(snap_plan)])
        if not esnap:
            tv, ti = (sv + 1, 0) if ssnap else (sv, si)
            for v in range(tv, ev + 1):
                if v == ev and ei == 0:
                    break  # nothing of ev consumed; don't touch its log
                plan = self._plan(v)
                lo = ti if v == tv else 0
                hi = ei if v == ev else len(plan)
                parts.extend(plan[lo:hi])
        # Re-anchor from BOTH offsets after a checkpoint restart. Spark
        # never tells latestOffset() where it resumed, so a fresh reader
        # anchors cold; the first partitions() call always carries the
        # checkpointed START, and without folding it in a restart whose
        # last batch committed would plan subsequent ranges BEHIND the
        # checkpoint and re-emit consumed files (duplicate rows
        # downstream — exactly-once violation).
        self._planned = max(
            [
                c for c in (
                    self._planned, (sv, si, ssnap), (ev, ei, esnap)
                )
                if c is not None
            ]
        )
        return parts

    # ------------------------------------------------- executor-side read
    def read(self, partition: DeltaFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(_fs_join(self.path, partition.rel_path))
        # Project the read to the physical columns the output schema
        # actually consumes — dropped/renamed columns left behind by
        # schema evolution and cdc extras are never decoded.
        in_file = set(pf.schema_arrow.names)
        needed = []
        for f in self.schema.fields:
            if self.read_change_feed and f.name == "_change_type":
                if partition.fixed_change is None:
                    needed.append("_change_type")
                continue
            if self.read_change_feed and f.name == "_commit_version":
                continue
            p = self._phys.get(f.name, f.name)
            if p in in_file:
                needed.append(p)
        if needed:
            tbl = pq.read_table(
                _fs_join(self.path, partition.rel_path), columns=needed
            )
            n = tbl.num_rows
        else:
            # Every output column is partition-derived or constant; only
            # the row count is needed (footer metadata, zero data I/O).
            tbl = None
            n = pf.metadata.num_rows
        if partition.dv:
            # Initial-snapshot file with a deletion vector: drop the
            # deleted row indexes so the batch serves LIVE rows.
            from .dv import read_deletion_vector

            deleted = read_deletion_vector(self.path, partition.dv)
            if tbl is not None:
                import numpy as np

                mask = np.ones(tbl.num_rows, dtype=bool)
                if deleted:
                    mask[np.asarray(deleted, dtype=np.int64)] = False
                tbl = tbl.filter(pa.array(mask))
                n = tbl.num_rows
            else:
                n -= len(deleted)
        file_cols = set(tbl.column_names) if tbl is not None else set()
        # partitionValues are SPEC-STRINGS in the log; cast to the
        # schema's declared types (same rule as the batch reader's Hive
        # recovery). cdc actions key them by PHYSICAL name.
        pv = {
            self._logical.get(k, k): v
            for k, v in partition.partition_values.items()
        }
        cols, names = [], []
        for f in self.schema.fields:
            names.append(f.name)
            if f.name == "_change_type" and self.read_change_feed:
                if partition.fixed_change is not None:
                    cols.append(pa.array([partition.fixed_change] * n))
                else:
                    cols.append(tbl.column("_change_type"))
            elif f.name == "_commit_version" and self.read_change_feed:
                cols.append(pa.array([partition.version] * n, pa.int64()))
            elif self._phys.get(f.name, f.name) in file_cols:
                cols.append(tbl.column(self._phys.get(f.name, f.name)))
            else:
                raw = pv.get(f.name)
                val = (
                    _pv_caster(f.dataType)(raw) if raw is not None else None
                )
                cols.append(pa.array([val] * n))
        out = pa.table(cols, names=names).cast(
            self._arrow_schema, safe=False
        )
        yield from out.to_batches()

    def _trace(self, msg: str) -> None:
        import os as _os
        t = _os.environ.get("BDS_STREAM_TRACE")
        if t:
            with open(t, "a") as fh:
                fh.write(msg + "\n")

    def commit(self, end: dict) -> None:
        self._trace(f"commit {end}")
        ev, _, esnap = self._pos(end)
        for v in [v for v in self._plans if v < ev]:
            del self._plans[v]
        if not esnap and self._snap_plans:
            # Past the snapshot phase: drop the O(table-files) snapshot
            # partition list(s) — a long-lived tail must not pin them in
            # driver memory for the stream's lifetime.
            self._snap_plans.clear()


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
