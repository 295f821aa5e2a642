"""SparkSession construction + SQL entry point with Delta DDL support.

Reference parity: ``custom_session_state`` (reference src/lib.rs:30-42) builds a
session with information_schema, a custom object-store registry, and DELTA /
DELTA_INSERT table factories. In Spark all of that is configuration plus a thin
DDL interceptor:

- information_schema      -> ``SHOW TABLES`` / ``spark.catalog`` (built in)
- object store registry   -> Hadoop FS URIs (``file://``) + the pyarrow
  native S3 path (``register_s3_parquet``/``register_delta_s3``; the JVM
  ``s3a://`` route needs a real cluster's hadoop-aws jars — SURVEY §2.1 S6)
- DELTA table factory     -> :func:`sql` intercepts
  ``CREATE EXTERNAL TABLE ... STORED AS DELTA LOCATION ...`` (the reference's
  DDL form, reference tests/local.rs:48) and registers a Delta-backed view.

Scale notes: the session is tuned for local[N] testing but every knob is the
one you would set on a 1000-executor cluster too — AQE (runtime replan, skew
join splitting, partition coalescing), shuffle partitions sized to cores, and
Arrow on the Python boundary.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_DELTA_DDL = re.compile(
    r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"(?:STORED\s+AS\s+DELTA|USING\s+DELTA)\s+"
    r"(?:PARTITIONED\s+BY\s*\(\s*(?P<pcols>[^)]*?)\s*\)\s+)?"
    r"LOCATION\s+'(?P<loc>[^']+)'"
    # CTAS: CREATE TABLE ... USING DELTA LOCATION '...' AS SELECT ...
    r"(?:\s+AS\s+(?P<body>(?:SELECT|WITH|VALUES|TABLE)\b.*?))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# COPY INTO <name> FROM '<path>' FILEFORMAT = PARQUET|CSV|JSON
#   [FORMAT_OPTIONS ('k' = 'v', ...)] [COPY_OPTIONS ('force' = 'true')]
# — delta-spark's idempotent file-loading SQL.
_DELTA_COPY_INTO = re.compile(
    r"^\s*COPY\s+INTO\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+FROM\s+'(?P<src>[^']+)'"
    r"\s+FILEFORMAT\s*=\s*(?P<fmt>PARQUET|CSV|JSON)"
    r"(?:\s+FORMAT_OPTIONS\s*\(\s*(?P<fopts>(?:'[^']*'|[^)'])*?)\s*\))?"
    r"(?:\s+COPY_OPTIONS\s*\(\s*(?P<copts>(?:'[^']*'|[^)'])*?)\s*\))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_sql_options(raw: str | None) -> dict[str, str]:
    """``'k' = 'v', 'k2' = 'v2'`` option lists (FORMAT_OPTIONS /
    COPY_OPTIONS bodies)."""
    out: dict[str, str] = {}
    for part in _split_top_level(raw or ""):
        part = part.strip()
        if not part:
            continue
        mm = re.match(r"^'([^']+)'\s*=\s*'([^']*)'$", part)
        if not mm:
            raise ValueError(f"cannot parse option {part!r}")
        out[mm.group(1)] = mm.group(2)
    return out

# INSERT INTO/OVERWRITE <name> [(col, ...)] <SELECT|VALUES|WITH|TABLE ...>
# Name may be backquoted and/or qualified (catalog.db.table) — real users
# write `INSERT INTO t VALUES (...)` constantly; the reference's factory
# surface is shape-agnostic (src/lib.rs:140-174), so ours must be too.
_DELTA_INSERT = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s*(?:\((?P<cols>[^)]*)\)\s*)?"
    # delta-spark: INSERT INTO t REPLACE WHERE <pred> SELECT ... — the
    # predicate-overwrite form (routed to replace_where_delta).
    r"(?:REPLACE\s+WHERE\s+(?P<rwpred>.+?)\s+"
    r"(?=SELECT\b|VALUES\b|WITH\b|TABLE\b))?"
    r"(?P<body>(?:SELECT|VALUES|WITH|TABLE)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

# DELETE FROM <name> [WHERE cond] — no WHERE deletes every row (SQL).
_DELTA_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s*(?:WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# UPDATE <name> SET col = expr[, ...] [WHERE cond]
_DELTA_UPDATE = re.compile(
    r"^\s*UPDATE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+SET\s+(?P<sets>.+?)(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# VACUUM <name> [RETAIN n HOURS] / OPTIMIZE <name> — delta-spark's
# maintenance SQL, routed to the table-maintenance functions.
_DELTA_VACUUM = re.compile(
    r"^\s*VACUUM\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"(?:\s+RETAIN\s+(?P<hours>\d+)\s+HOURS?)?"
    r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
    re.IGNORECASE,
)

# SHOW TBLPROPERTIES <name> [('key')] — table configuration as
# (key, value) rows, plus the delta.minReader/WriterVersion protocol rows
# delta-spark always includes.
_DELTA_SHOW_PROPS = re.compile(
    r"^\s*SHOW\s+TBLPROPERTIES\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"(?:\s*\(\s*'(?P<key>[^']+)'\s*\))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_DELTA_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"(?:\s+(?P<full>FULL))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zcols>[^)]+)\s*\))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# ALTER TABLE <name> ALTER COLUMN <c> SET DEFAULT <expr> / DROP DEFAULT /
# TYPE <wider> — the allowColumnDefaults writer feature (appends omitting
# the column fill it with the expression) and the typeWidening feature
# (metadata-only lossless retype; narrow files read widened).
_DELTA_COLUMN_DEFAULT = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+ALTER\s+COLUMN\s+(?P<col>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+(?:SET\s+DEFAULT\s+(?P<expr>.+?)|(?P<drop>DROP\s+DEFAULT)"
    r"|TYPE\s+(?P<newtype>.+?))"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# ALTER TABLE <name> CLUSTER BY (a, b) / CLUSTER BY NONE — liquid
# clustering metadata; plain OPTIMIZE then clusters on the declared set.
_DELTA_CLUSTER_BY = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+CLUSTER\s+BY\s*(?:\(\s*(?P<cols>[^)]+?)\s*\)|(?P<none>NONE))"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# ALTER TABLE <name> DROP FEATURE <f> [TRUNCATE HISTORY] — protocol
# downgrade once no trace of the feature remains (delta-spark parity).
_DELTA_DROP_FEATURE = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+DROP\s+FEATURE\s+(?P<feature>`[^`]+`|[A-Za-z][A-Za-z0-9]*)"
    r"(?:\s+(?P<trunc>TRUNCATE\s+HISTORY))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# CONVERT TO DELTA parquet.`<path>` / '<path>' — in-place conversion of a
# parquet directory (files referenced, never moved).
_DELTA_CONVERT = re.compile(
    r"^\s*CONVERT\s+TO\s+DELTA\s+"
    r"(?:parquet\s*\.\s*)?(?P<path>`[^`]+`|'[^']+')"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# FSCK REPAIR TABLE <name> [DRY RUN] — drop references to missing files.
_DELTA_FSCK = re.compile(
    r"^\s*FSCK\s+REPAIR\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"(?:\s+(?P<dry>DRY\s+RUN))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# REORG TABLE <name> APPLY (PURGE) — rewrite only DV-carrying files so no
# active file references a deletion vector (delta-spark REORG parity).
# APPLY (COMPACT DELETION VECTORS) is the metadata-only sibling: re-pack
# the active DVs of many point-DML commits into one bin, data untouched.
_DELTA_REORG = re.compile(
    r"^\s*REORG\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+APPLY\s*\(\s*(?P<reorg_op>PURGE|COMPACT\s+DELETION\s+VECTORS)\s*\)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# ANALYZE TABLE <name> COMPUTE DELTA STATISTICS [FOR COLUMNS (c1, c2)] —
# delta-spark's stats recompute (metadata-only, footer reads + one commit).
_DELTA_ANALYZE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+COMPUTE\s+DELTA\s+STATISTICS"
    r"(?:\s+FOR\s+COLUMNS\s*\(\s*(?P<cols>[^)]+)\s*\))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# ALTER TABLE <name> ADD CONSTRAINT <c> CHECK (<expr>) / DROP CONSTRAINT <c>
# — delta-spark constraint DDL, routed to alter_constraints.
_DELTA_ALTER_CONSTRAINT = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+(?P<op>ADD|DROP)\s+CONSTRAINT\s+(?P<cname>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+CHECK\s*\((?P<expr>.+)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# ALTER TABLE <name> SET TBLPROPERTIES (k=v, ...) / UNSET TBLPROPERTIES
# (k, ...) — the metadata DDL users run to flip delta.appendOnly /
# enableChangeDataFeed / enableInCommitTimestamps, routed to
# alter_properties.
_DELTA_TBLPROPS = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+(?P<op>SET|UNSET)\s+TBLPROPERTIES\s*\(\s*(?P<body>.+?)\s*\)"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# ALTER TABLE <name> RENAME COLUMN <a> TO <b> / DROP COLUMN[S] (a, b) /
# ADD COLUMN[S] (a type, b type) — metadata-only schema evolution, routed
# to alter_columns (rename/drop auto-upgrade the table to
# columnMapping=name, delta-spark parity; pure ADD stays plain).
_DELTA_ALTER_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+(?:RENAME\s+COLUMN\s+(?P<old>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+TO\s+(?P<new>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    r"|DROP\s+COLUMNS?\s*\(?\s*(?P<dropcols>[^)]+?)\s*\)?"
    # nested parens (decimal(10,2)) live inside the add list, so capture
    # everything and strip one outer paren pair in the handler
    r"|ADD\s+COLUMNS?\s+(?P<addcols>.+?))"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# CREATE TABLE <name> SHALLOW|DEEP CLONE <src> LOCATION '<dst>' —
# zero-copy table fork / self-contained snapshot copy (delta-spark clone
# DDL), routed to clone_delta. <src> is a registered delta view name or
# a quoted path.
_DELTA_CLONE = re.compile(
    r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+(?P<depth>SHALLOW|DEEP)\s+CLONE\s+"
    r"(?P<src>`[^`]+`|'[^']+'|[A-Za-z_][A-Za-z0-9_.]*)"
    r"\s+LOCATION\s+'(?P<dst>[^']+)'\s*;?\s*$",
    re.IGNORECASE,
)

# RESTORE [TABLE] <name> TO VERSION AS OF <n> — delta-spark rollback SQL.
_DELTA_RESTORE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s+TO\s+(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*;?\s*$",
    re.IGNORECASE,
)

# DESCRIBE HISTORY <name> — commitInfo per version.
_DELTA_HISTORY = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# DESCRIBE DETAIL <name> — one row of table-level metadata.
_DELTA_DETAIL = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# GENERATE symlink_format_manifest FOR TABLE <name> — delta-spark's
# Presto/Trino compatibility export.
_DELTA_GENERATE = re.compile(
    r"^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

# <view> VERSION AS OF n / TIMESTAMP AS OF 'ts' inside any SELECT —
# delta-spark's time-travel SQL. Rewritten to a snapshot temp view before
# Spark parses the statement.
_DELTA_ASOF_REF = re.compile(
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')",
    re.IGNORECASE,
)


def _rewrite_time_travel(spark: SparkSession, statement: str) -> str:
    """Replace ``view VERSION|TIMESTAMP AS OF x`` references to registered
    Delta views with temp views pinned to that snapshot.

    Matches run against the literal-masked statement so a string like
    'orders VERSION AS OF 2' inside a predicate is DATA, not syntax —
    rewriting it would silently corrupt the comparison (and read a table
    version as a side effect). Replacement values (the timestamp) are
    sliced from the original by span."""
    from .sources.delta import read_delta

    masked = _mask_literals(statement)

    def sub(m: re.Match) -> str:
        name = _resolve_view(m.group("name"), spark)
        if name is None:
            return statement[m.start():m.end()]  # leave untouched
        loc = _delta_views[name]
        if m.group("v") is not None:
            version = int(m.group("v"))
            snap_name = f"{name}__asof_v{version}"
            df = read_delta(spark, loc, version=version)
        else:
            ts_ms = _ts_to_epoch_ms(_g(statement, m, "ts"))
            snap_name = f"{name}__asof_t{ts_ms}"
            df = read_delta(spark, loc, timestamp_ms=ts_ms)
        df.createOrReplaceTempView(snap_name)
        return snap_name

    # match on the mask, splice replacements into the original by span
    out, last = [], 0
    for m in _DELTA_ASOF_REF.finditer(masked):
        out.append(statement[last:m.start()])
        out.append(sub(m))
        last = m.end()
    out.append(statement[last:])
    return "".join(out)

class _CaseFoldedViews(dict):
    """Routing map keyed like Spark's temp-view catalog: view names are
    case-insensitive, so ``register_parquet(spark, "SALES", ...)`` replaces
    the SAME temp view as a prior ``register_delta(spark, "Sales", ...)``
    and must also displace its DML route — a case-sensitive map would keep
    the stale entry, sending DELETE/UPDATE to the old Delta table while
    SELECT reads the new source."""

    @staticmethod
    def _k(key):
        return key.lower() if isinstance(key, str) else key

    def __init__(self, *args, **kwargs):
        super().__init__()
        if args or kwargs:
            self.update(*args, **kwargs)

    def __setitem__(self, key, value):
        super().__setitem__(self._k(key), value)

    def __getitem__(self, key):
        return super().__getitem__(self._k(key))

    def __contains__(self, key):
        return super().__contains__(self._k(key))

    def get(self, key, default=None):
        return super().get(self._k(key), default)

    def pop(self, key, *args):
        return super().pop(self._k(key), *args)

    # Every mutation path must fold — a future `del views[name]`,
    # `.update(...)`, or `.setdefault(...)` going through dict's raw
    # implementation would reintroduce the exact stale-DML-route bug this
    # class exists to prevent (mixed-case registrations leaving a live
    # route behind).
    def __delitem__(self, key):
        super().__delitem__(self._k(key))

    def setdefault(self, key, default=None):
        return super().setdefault(self._k(key), default)

    def update(self, *args, **kwargs):
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def __ior__(self, other):  # views |= {...} must fold too
        self.update(other)
        return self


# Delta-backed view name -> table path, populated by the DDL interceptor and
# register_delta so INSERT INTO can resolve its target (the analogue of the
# reference's DELTA_INSERT table factory, src/lib.rs:140-174).
_delta_views: dict[str, str] = _CaseFoldedViews()


def _ts_to_epoch_ms(raw: str) -> int:
    """SQL timestamp literal -> epoch millis (UTC when zone-less). The
    one normalization every TIMESTAMP AS OF / RESTORE site shares: a 'T'
    or space separator and a trailing 'Z' both parse on every supported
    Python."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(
        raw.strip().replace("T", " ").replace("Z", "+00:00")
    )
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def build_spark(
    app_name: str = "ballista_delta_spark",
    cpus: int | None = None,
    master: str | None = None,
    conf: dict[str, str] | None = None,
):
    """SparkSession builder with the tuned defaults, master/conf overridable.

    ``master`` is the analogue of the reference's remote entry point
    (``SessionContext::remote_with_state("df://host:50050", ...)``, reference
    examples/local_read_client.rs:31): pass ``spark://host:7077`` /
    ``yarn`` / ``k8s://...`` to target a real cluster, or set
    ``$SPARK_GRAFT_MASTER``. Defaults to ``local[cpus]``. ``conf`` entries
    are applied last so callers can override any default.
    """
    n = cpus or default_cpus()
    chosen = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{n}]"
    builder = (
        SparkSession.builder.master(chosen)
        .appName(app_name)
        # Shuffle sizing: ~cores for local tests. On a real cluster this is
        # sized to total cores (or left to AQE coalescing from a high initial).
        .config("spark.sql.shuffle.partitions", str(n))
        # AQE: runtime re-plan — coalesce small shuffle partitions, convert
        # sort-merge joins to broadcast when a side turns out small, split
        # skewed partitions. All critical at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Over-split shuffles up front and let AQE coalesce DOWN
        # (VERDICT r14 #2): AQE never splits a non-skewed exchange UP, so
        # an initial partition count equal to total cores under-splits the
        # big exchanges at 100 TB and each reduce task sorts/joins GBs and
        # spills (guide §5). On a cluster set $SPARK_GRAFT_INITIAL_PARTS
        # to a large multiple of total cores (rule of thumb: expected
        # shuffle bytes / advisoryPartitionSizeInBytes). The LOCAL default
        # stays = cores: a measured same-window A/B at sf0.1 put the 4x
        # form at 30.6 s vs 26.0 s (probes 0.26/0.21) — +15%, concentrated
        # in the eager-checkpoint dedup ids, because parallelismFirst
        # coalescing keeps ~2x more tiny post-shuffle partitions from a
        # 128-partition start and those ids pay the task overhead ~10
        # stages x 4 builds each. At real byte sizes coalescing is
        # byte-targeted and the overhead vanishes — but defaulting the
        # bench box to it would be a constant tuned for the wrong scale.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTS", str(n)),
        )
        # Companion to the over-split: CACHED plans execute without AQE
        # partition coalescing unless this is on (SPARK-39172), so the
        # DML-internal transient caches (delta merge/update) would run
        # their shuffles at the full initial width — 128 tiny tasks on a
        # 25-row merge. Allowing AQE to re-partition cached output keeps
        # the over-split+coalesce contract uniform across cached plans.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Arrow for every JVM<->Python hop (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Whole-stage-codegen class cache (default 100 entries): this
        # engine's query surface compiles far more than 100 distinct
        # codegen units (the unrolled 64-dim embedding chains alone are
        # hundreds of KB of generated Java per plan), so a session running
        # many queries thrashes the cache and re-pays janino compilation
        # + a cold JIT on every execution — measured 2-4 s spikes on the
        # expression-heavy similarity queries. 4096 entries bounds the
        # cost at tens of MB of metaspace on driver and executors alike.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # Pin session TZ so timestamp semantics match the UTC-naive oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # carries no usable parquet footer stats, which starves Delta
        # per-file minValues/maxValues (and thus scan pruning + ZORDER
        # bounds) for every staged timestamp column.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Python-worker connect-back window (default 15s): on a loaded
        # 32-core box a full pytest run can fork workers slower than that,
        # killing streaming tests with "Timed out while waiting for the
        # Python worker to connect back" — an environment flake, not a
        # logic failure.
        .config("spark.python.authenticate.socketTimeout", "120s")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # NOTE (r14 measurement): -XX:-DontCompileHugeMethods lets C2
        # compile the giant unrolled-chain codegen methods (emb_knn_graph
        # join stage 2.7 s -> 0.8 s steady-state in isolation) but causes
        # a suite-wide COMPILE STORM in a many-query session — every big
        # generated class becomes C2-eligible and the concurrent compiles
        # regressed the mid-suite TPC-H block up to 13x (bench total
        # 22.9 s -> 35.4 s). Deliberately NOT set.
        # r15: the per-STAGE form of the same fix that the process-global
        # JVM flag could not give us — cap whole-stage codegen methods at
        # the JVM JIT's own huge-method threshold (8000 bytecode bytes,
        # the DontCompileHugeMethods limit). A fused stage whose method
        # exceeds it runs INTERPRETED bytecode forever (the JIT refuses
        # it); with the cap, Spark demotes exactly those stages to
        # non-wholestage execution, whose per-expression generated
        # methods are small and JIT-compile, while every normal stage
        # keeps fused wholestage codegen. Measured at sf1 (tiled 10x
        # fixture, 32 cores): emb_knn_graph 34.5 -> 4.1 s, sim_cosine_topk
        # 5.7 -> 0.7 s (the 64-dim cosine chains are exactly such
        # stages); neutral on dedup_minhash_lsh / emb_pq_topk / TPC-H.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    for k, v in (conf or {}).items():
        builder = builder.config(k, v)
    return builder


def get_spark(
    app_name: str = "ballista_delta_spark",
    cpus: int | None = None,
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Mirrors the reference's session wiring (src/lib.rs:18-46) — there it turns
    on DataFusion's full feature set; Spark has its feature set on by default,
    so the work here is configuration only. Note ``getOrCreate`` returns the
    existing session if one is live — master/conf apply to NEW sessions.
    """
    return build_spark(app_name, cpus, master, conf).getOrCreate()



def _strip_leading_comments(stmt: str) -> str:
    """Drop leading `--` line comments and /* */ blocks so a commented
    Delta statement still routes to its interceptor (hint blocks `/*+`
    are left alone — they are meaningful to Spark, and legal hints sit
    after SELECT, not at statement start)."""
    s = stmt
    while True:
        t = s.lstrip()
        if t.startswith("--"):
            nl = t.find("\n")
            if nl == -1:
                return t
            s = t[nl + 1:]
        elif t.startswith("/*") and not t.startswith("/*+"):
            end = t.find("*/")
            if end == -1:
                return t
            s = t[end + 2:]
        else:
            return t


# _mask_literals moved to sources/delta.py (r12) so the data-skipping
# predicate splitters share the ONE Spark-lexer-faithful literal scanner
# — a weaker hand-rolled copy there is exactly what made OR/AND
# detection unsound inside double-quoted and backslash-escaped literals.
from .sources.delta import _mask_literals  # noqa: E402,F401


def _g(stmt: str, m: "re.Match", name: str) -> str | None:
    """Group text sliced from the ORIGINAL statement by span — groups
    that can contain string literals must come from here, not
    ``m.group`` (which would return the 'xxx' mask)."""
    s, e = m.span(name)
    return None if s == -1 else stmt[s:e]


def sql(spark: SparkSession, statement: str) -> DataFrame:
    """SQL entry point with the reference's Delta DDL surface.

    ``ctx.sql("create external table c stored as delta location '...'")``
    (reference README.md:59, tests/local.rs:48) is handled by a table factory
    there; here we intercept the same statement shape and register a temp view
    backed by our Delta reader, then hand everything else to Spark SQL.

    Matching discipline: every dialect regex runs against the
    literal-MASKED statement (`_mask_literals`), so SQL keywords inside
    string literals can never mis-route or mis-split a statement; groups
    that may contain literals are sliced back out of the original by
    span (`_g`).
    """
    statement = _strip_leading_comments(statement)
    masked = _mask_literals(statement)
    m = _DELTA_DDL.match(masked)
    if m:
        import os as _os

        from .sources.delta import _strip_file_scheme, read_delta, write_delta

        name, body = m.group("name"), _g(statement, m, "body")
        loc = _strip_file_scheme(_g(statement, m, "loc"))
        exists = _os.path.exists(_os.path.join(loc, "_delta_log"))
        if body is not None:
            # CTAS: materialize the query into a NEW Delta table. An
            # existing table refuses (IF NOT EXISTS skips the write and
            # just registers — delta-spark semantics).
            if exists and not m.group("ine"):
                raise ValueError(
                    f"CREATE TABLE AS: Delta table already exists at {loc}"
                )
            if not exists:
                pcols = [
                    c.strip().strip("`")
                    for c in (m.group("pcols") or "").split(",")
                    if c.strip()
                ]
                # the body goes through THIS dialect (not raw
                # spark.sql), so time-travel / Delta-view references
                # inside the CTAS SELECT work like any top-level query
                write_delta(
                    sql(spark, body), loc, mode="append",
                    partition_by=pcols or None,
                )
        read_delta(spark, loc).createOrReplaceTempView(name)
        _delta_views[name] = loc
        return spark.sql(f"SELECT '{name}' AS registered_table")

    m = _DELTA_COPY_INTO.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from pyspark.sql import Row

            from .sources.delta import copy_into, read_delta

            copts = _parse_sql_options(_g(statement, m, "copts"))
            metrics = copy_into(
                spark, _delta_views[name], _g(statement, m, "src"),
                file_format=m.group("fmt").lower(),
                format_options=_parse_sql_options(_g(statement, m, "fopts")),
                force=str(copts.get("force", "false")).lower() == "true",
            )
            read_delta(spark, _delta_views[name]).createOrReplaceTempView(
                name
            )
            return spark.createDataFrame([Row(**metrics)])

    m = _DELTA_INSERT.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            return _delta_insert(
                spark, name, m.group("cols"), _g(statement, m, "body"),
                overwrite=m.group("mode").upper() == "OVERWRITE",
                replace_where=_g(statement, m, "rwpred"),
            )

    m = _DELTA_DELETE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            return _delta_dml(
                spark, name, "delete",
                cond=_g(statement, m, "cond") or "true",
            )

    m = _DELTA_UPDATE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            sets_txt, cond_txt = _split_update_tail(
                statement, masked, m.start("sets")
            )
            return _delta_dml(
                spark, name, "update",
                cond=cond_txt or "true",
                sets=sets_txt,
            )

    m = _DELTA_MERGE_HEAD.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            return _sql_merge(spark, statement, name, statement[m.end():])

    m = _DELTA_SHOW_PROPS.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from pyspark.sql import Row

            from .sources.delta import _load_snapshot

            snap = _load_snapshot(_delta_views[name])
            props = dict(snap.configuration)
            # delta-spark always reports the protocol as properties
            props["delta.minReaderVersion"] = str(snap.min_reader_version)
            props["delta.minWriterVersion"] = str(snap.min_writer_version)
            key = _g(statement, m, "key")
            if key is not None:
                val = props.get(key)
                if val is None:
                    return spark.createDataFrame(
                        [], "key string, value string"
                    )
                return spark.createDataFrame([Row(key=key, value=val)])
            return spark.createDataFrame(
                [Row(key=k, value=v) for k, v in sorted(props.items())]
            )

    m = _DELTA_VACUUM.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import vacuum

            hours = m.group("hours")
            kwargs = (
                {"retention_ms": int(hours) * 3600 * 1000}
                if hours is not None else {}
            )
            if m.group("dry"):
                # delta-spark's DRY RUN lists the files that WOULD be
                # deleted (a `path` column), not a deletion count
                would = vacuum(
                    _delta_views[name], dry_run=True, spark=spark, **kwargs
                )
                if not would:
                    return spark.createDataFrame([], "path string")
                return spark.createDataFrame(
                    [(p,) for p in would], "path string"
                )
            removed = vacuum(_delta_views[name], spark=spark, **kwargs)
            return spark.sql(
                f"SELECT CAST({len(removed)} AS BIGINT) AS files_deleted"
            )

    m = _DELTA_OPTIMIZE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import optimize, read_delta

            loc = _delta_views[name]
            zcols = [
                c.strip().strip("`")
                for c in (m.group("zcols") or "").split(",") if c.strip()
            ]
            version = optimize(
                spark, loc, zorder_by=zcols or None,
                where=_g(statement, m, "where"),
                full=bool(m.group("full")),
            )
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_CLUSTER_BY.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import cluster_by, read_delta

            loc = _delta_views[name]
            cols = None if m.group("none") else [
                c.strip().strip("`")
                for c in m.group("cols").split(",") if c.strip()
            ]
            version = cluster_by(loc, cols)
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_DROP_FEATURE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import drop_feature, read_delta

            loc = _delta_views[name]
            version = drop_feature(
                loc,
                m.group("feature").strip("`"),
                truncate_history=bool(m.group("trunc")),
            )
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_COLUMN_DEFAULT.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import (
                alter_column_default,
                alter_column_type,
                read_delta,
            )

            loc = _delta_views[name]
            if m.group("newtype"):
                version = alter_column_type(
                    loc, m.group("col").strip("`"), m.group("newtype")
                )
            else:
                version = alter_column_default(
                    loc,
                    m.group("col").strip("`"),
                    None if m.group("drop") else _g(statement, m, "expr"),
                )
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_CONVERT.match(masked)
    if m:
        from .sources.delta import convert_to_delta

        loc = _g(statement, m, "path").strip("`'")
        version = convert_to_delta(spark, loc)
        return spark.sql(
            f"SELECT CAST({version} AS BIGINT) AS committed_version"
        )

    m = _DELTA_FSCK.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import fsck_repair, read_delta

            loc = _delta_views[name]
            res = fsck_repair(loc, dry_run=bool(m.group("dry")), spark=spark)
            if not m.group("dry"):
                read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({res['version']} AS BIGINT) AS committed_version, "
                f"CAST({res['numMissingFiles']} AS BIGINT) AS files_removed"
            )

    m = _DELTA_ANALYZE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import read_delta, recompute_stats

            loc = _delta_views[name]
            cols = m.group("cols")
            res = recompute_stats(
                loc,
                columns=[c.strip().strip("`") for c in cols.split(",")]
                if cols
                else None,
                spark=spark,
            )
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({res['version']} AS BIGINT) AS committed_version, "
                f"CAST({res['numFilesRecomputed']} AS BIGINT) AS files_recomputed"
            )

    m = _DELTA_REORG.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import (
                compact_deletion_vectors,
                read_delta,
                reorg_purge,
            )

            loc = _delta_views[name]
            if m.group("reorg_op").upper() == "PURGE":
                metrics = reorg_purge(spark, loc)
                rewritten = metrics["numFilesRewritten"]
            else:
                metrics = compact_deletion_vectors(loc)
                rewritten = metrics["numFilesRepointed"]
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({metrics['version']} AS BIGINT) AS committed_version, "
                f"CAST({rewritten} AS BIGINT) AS files_rewritten"
            )

    m = _DELTA_TBLPROPS.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import alter_properties, read_delta

            loc = _delta_views[name]
            body = _g(statement, m, "body")
            if m.group("op").upper() == "SET":
                props = {}
                for part in _split_top_level(body):
                    k, eq, v = part.partition("=")
                    if not eq:
                        raise ValueError(
                            f"SET TBLPROPERTIES expects k = v, got {part!r}"
                        )
                    props[k.strip().strip("'\"`")] = v.strip().strip("'\"")
                version = alter_properties(spark, loc, set_props=props)
            else:
                keys = [
                    p.strip().strip("'\"`")
                    for p in _split_top_level(body) if p.strip()
                ]
                version = alter_properties(spark, loc, unset_keys=keys)
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_ALTER_CONSTRAINT.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import alter_constraints, read_delta

            loc = _delta_views[name]
            if m.group("op").upper() == "ADD":
                if not m.group("expr"):
                    raise ValueError(
                        "ADD CONSTRAINT requires CHECK (<expression>)"
                    )
                version = alter_constraints(
                    spark, loc,
                    add={m.group("cname"): _g(statement, m, "expr").strip()},
                )
            else:
                version = alter_constraints(
                    spark, loc, drop=[m.group("cname")]
                )
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_CLONE.match(masked)
    if m:
        from .sources.delta import clone_delta, read_delta

        raw_src = _g(statement, m, "src")
        if raw_src.startswith("'"):
            src_loc = raw_src.strip("'")
        else:
            src_name = _resolve_view(raw_src, spark)
            if src_name is None:
                raise ValueError(
                    f"CLONE source {raw_src!r} is not a registered "
                    "Delta table (use a quoted path or register it first)"
                )
            src_loc = _delta_views[src_name]
        dst = _g(statement, m, "dst")
        clone_delta(
            src_loc, dst, deep=m.group("depth").upper() == "DEEP",
            spark=spark,
        )
        name = m.group("name").strip("`")
        read_delta(spark, dst).createOrReplaceTempView(name)
        _delta_views[name] = dst
        return spark.sql("SELECT CAST(0 AS BIGINT) AS committed_version")

    m = _DELTA_ALTER_COLUMN.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import alter_columns, read_delta

            loc = _delta_views[name]
            if m.group("old"):
                version = alter_columns(
                    loc,
                    renames={
                        m.group("old").strip("`"): m.group("new").strip("`")
                    },
                )
            elif m.group("dropcols"):
                version = alter_columns(
                    loc,
                    drops=[
                        c.strip().strip("`")
                        for c in m.group("dropcols").split(",") if c.strip()
                    ],
                )
            else:
                adds: dict[str, str] = {}
                addcols = _g(statement, m, "addcols").strip()
                if addcols.startswith("(") and addcols.endswith(")"):
                    addcols = addcols[1:-1]
                # split on commas outside BOTH parens and angle brackets
                # so decimal(10,2) AND map<string,int>/struct<a:int,b:int>
                # survive
                for spec in _split_commas_outside_brackets(addcols):
                    parts = spec.strip().split(None, 1)
                    if len(parts) != 2:
                        raise ValueError(
                            f"ADD COLUMNS expects '<name> <type>': {spec!r}"
                        )
                    adds[parts[0].strip("`")] = parts[1]
                version = alter_columns(loc, adds=adds)
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.sql(
                f"SELECT CAST({version} AS BIGINT) AS committed_version"
            )

    m = _DELTA_RESTORE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from pyspark.sql import Row

            from .sources.delta import read_delta, restore_delta

            loc = _delta_views[name]
            if m.group("v") is not None:
                target = int(m.group("v"))
            else:
                from .sources.delta import version_at_timestamp

                target = version_at_timestamp(
                    loc, _ts_to_epoch_ms(_g(statement, m, "ts"))
                )
            metrics = restore_delta(loc, target)
            read_delta(spark, loc).createOrReplaceTempView(name)
            return spark.createDataFrame([Row(**metrics)])

    m = _DELTA_DETAIL.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import describe_detail

            return describe_detail(spark, _delta_views[name])

    m = _DELTA_GENERATE.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import generate_symlink_manifest

            written = generate_symlink_manifest(_delta_views[name])
            if not written:
                return spark.createDataFrame([], "manifest string")
            return spark.createDataFrame(
                [(p,) for p in written], "manifest string"
            )

    m = _DELTA_HISTORY.match(masked)
    if m:
        name = _resolve_view(m.group("name"), spark)
        if name is not None:
            from .sources.delta import DeltaTable

            hist = DeltaTable(_delta_views[name]).history()
            rows = [
                (
                    h["version"],
                    h.get("timestamp"),
                    h.get("operation"),
                    json.dumps(h.get("operationParameters") or {}),
                    json.dumps(h.get("operationMetrics") or {}),
                )
                for h in hist
            ]
            return spark.createDataFrame(
                rows,
                "version bigint, timestamp bigint, operation string, "
                "operationParameters string, operationMetrics string",
            )
    if _DELTA_ASOF_REF.search(masked):
        statement = _rewrite_time_travel(spark, statement)
    return spark.sql(statement)


def _resolve_view(raw: str, spark: SparkSession | None = None) -> str | None:
    """Map the statement's table name to a registered Delta view: exact match
    first, then the last dotted component (``db.t`` / `` `t` `` -> ``t``).

    The tail fallback yields to a REAL catalog table of the full
    qualified name: without that check, ``DELETE FROM sales.orders``
    would run against an unrelated registered view named ``orders`` —
    silent DML on the wrong table."""
    name = raw.strip().strip("`")
    if name in _delta_views:
        return name
    tail = name.split(".")[-1]
    if tail not in _delta_views:
        return None
    if "." in name and spark is not None:
        try:
            if spark.catalog.tableExists(name):
                return None  # the qualified catalog table wins
        except Exception:
            # Fail CLOSED: if the catalog can't answer (misconfigured
            # metastore, transient failure) we cannot prove the dotted
            # name doesn't shadow the tail view — routing the DML to the
            # tail view here is exactly the wrong-table write this guard
            # exists to prevent.
            return None
    return tail


def _delta_insert(
    spark: SparkSession, name: str, cols: str | None, body: str,
    overwrite: bool = False,
    replace_where: str | None = None,
) -> DataFrame:
    """Append (or, for INSERT OVERWRITE, replace) rows of the Delta table
    behind view ``name`` with ``body``'s result.

    - No column list: body must produce exactly the table's column count;
      aligned positionally (names from the body are ignored), cast to the
      declared types — Spark/delta-spark INSERT INTO semantics.
    - Column list: body must produce exactly ``len(cols)`` columns; listed
      columns map positionally, unlisted columns are filled with NULL.
    - OVERWRITE replaces the full table contents in one commit (remove all
      + add new — the delta-spark static-overwrite mode).
    """
    from pyspark.sql import functions as F

    from .sources.delta import read_delta, write_delta

    loc = _delta_views[name]
    # Spark SQL accepts top-level VALUES as an inline-table query, so every
    # body shape (SELECT / VALUES / WITH / TABLE) runs as-is — routed
    # through THE DIALECT so time-travel / Delta-view references inside
    # an INSERT body work exactly like in CTAS.
    rows = sql(spark, body.strip())
    # The SNAPSHOT schema keeps the field metadata (identity / generated /
    # CURRENT_DEFAULT) the scan's aliasing may drop.
    from .sources.delta import _load_snapshot

    fields = _load_snapshot(loc).schema.fields
    # Positional mapping is the contract: rename the query's output to
    # placeholder names first, so duplicate output names (SELECT a.id,
    # b.id) stay addressable by position instead of raising AMBIGUOUS.
    rows = rows.toDF(*[f"__ins_c{i}" for i in range(len(rows.columns))])

    def _auto_filled(f) -> bool:
        # Columns write_delta fills ITSELF when the input omits them —
        # NULL-filling these would bypass the default / identity /
        # generation (or trip the GENERATED ALWAYS guard), so the INSERT
        # must OMIT them instead (SQL INSERT column-list semantics).
        md = f.metadata or {}
        return bool(
            md.get("delta.generationExpression")
            or md.get("CURRENT_DEFAULT") is not None
            or any(k.startswith("delta.identity.") for k in md)
        )

    if cols is not None:
        listed = [c.strip().strip("`") for c in cols.split(",") if c.strip()]
        by_lower = {f.name.lower(): f for f in fields}
        unknown = [c for c in listed if c.lower() not in by_lower]
        if unknown:
            raise ValueError(
                f"INSERT column(s) {unknown} not in table {name} "
                f"({[f.name for f in fields]})"
            )
        if len(rows.columns) != len(listed):
            raise ValueError(
                f"INSERT INTO {name} ({len(listed)} columns) but the query "
                f"produced {len(rows.columns)} columns"
            )
        src = {
            by_lower[c.lower()].name: F.col(f"__ins_c{i}")
            for i, c in enumerate(listed)
        }
        sel = []
        for f in fields:
            if f.name in src:
                sel.append(src[f.name].cast(f.dataType).alias(f.name))
            elif not _auto_filled(f):
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
        out = rows.select(*sel)
    else:
        if len(rows.columns) != len(fields):
            raise ValueError(
                f"INSERT INTO {name}: table has {len(fields)} columns but the "
                f"query produced {len(rows.columns)}"
            )
        out = rows.select(*[
            F.col(f"__ins_c{i}").cast(f.dataType).alias(f.name)
            for i, f in enumerate(fields)
        ])
    if replace_where is not None:
        from .sources.delta_dml import replace_where_delta

        version = replace_where_delta(
            spark, loc, out, replace_where.strip()
        )["version"]
    else:
        version = write_delta(
            out, loc, mode="overwrite" if overwrite else "append"
        )
    # Refresh the view to the new snapshot (the reference errors here:
    # "Can't encode non-delta tables", tests/local.rs:100-103 — we commit).
    read_delta(spark, loc).createOrReplaceTempView(name)
    return spark.sql(f"SELECT CAST({version} AS BIGINT) AS committed_version")


_DELTA_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+(?P<evolve>WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+"
    r"(?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"(?:\s+(?:AS\s+)?(?P<talias>[A-Za-z_][A-Za-z0-9_]*))?"
    r"\s+USING\s+",
    re.IGNORECASE,
)


def _sub_outside_literals(pattern: str, repl: str, text: str) -> str:
    """re.sub that never fires inside string literals: matches run on the
    literal-masked copy, replacements splice into the original by span."""
    masked = _mask_literals(text)
    out, last = [], 0
    for m in re.finditer(pattern, masked):
        out.append(text[last:m.start()])
        out.append(repl)
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def _sql_merge(spark: SparkSession, statement: str, name: str, rest: str):
    """Parse the canonical MERGE grammar and route to merge_delta:

        MERGE INTO t USING (<subquery>)|<table> [AS] s ON <cond>
          [WHEN MATCHED [AND <cond>] THEN
               UPDATE SET c = e, ... | UPDATE SET * | DELETE]...
          [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
               INSERT * | INSERT (cols) VALUES (exprs)]...
          [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
               UPDATE SET c = e, ... | DELETE]...

    Aliases are normalized to the engine's fixed ``t`` / ``s`` names by a
    word-boundary rewrite in the condition and expressions. Clauses keep
    statement order; delta-spark semantics (first matching clause wins, a
    row qualifying for no clause is untouched / not inserted) are applied
    by merge_delta. Known limitation: a ``WHEN`` inside a clause condition
    (CASE WHEN ...) confuses the top-level clause split — use a subquery
    column instead.
    """
    m = _DELTA_MERGE_HEAD.match(statement)
    talias = m.group("talias")
    if talias is None:
        # No explicit alias: the table NAME is the implicit qualifier
        # (delta-spark accepts MERGE INTO mrg USING k ON mrg.id = k.id).
        talias = m.group("name").strip("`").split(".")[-1]
    # USING source: balanced-paren subquery or a table/view name.
    rest = rest.lstrip()
    source_name = None
    if rest.startswith("("):
        depth, in_str, esc, i = 0, None, False, 0
        for i, ch in enumerate(rest):
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == in_str:
                    in_str = None
            elif ch in ("'", '"'):
                in_str = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        source = sql(spark, rest[1:i])  # dialect-routed: time travel,
        rest = rest[i + 1:]             # registered views, nested forms
    else:
        mt = re.match(r"(`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)", rest)
        source = spark.table(mt.group(1).strip("`"))
        source_name = mt.group(1).strip("`").split(".")[-1]
        rest = rest[mt.end():]
    ma = re.match(r"\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+(?=ON\b)", rest,
                  re.IGNORECASE)
    salias = None
    if ma:
        salias = ma.group(1)
        rest = rest[ma.end():]
    if salias is None:
        # Alias-less table source: its name is the implicit qualifier.
        salias = source_name
    mo = re.match(r"\s*ON\s+", rest, re.IGNORECASE)
    if not mo:
        raise ValueError("MERGE: expected ON <condition>")
    rest = rest[mo.end():]
    # Condition runs until the first top-level WHEN — found on the
    # literal-masked text so "... <> 'when matched'" can't split here.
    masked_rest = _mask_literals(rest)
    cut = [mm.span() for mm in re.finditer(r"(?i)\bWHEN\b", masked_rest)]
    bounds = [0] + [c[0] for c in cut] + [len(rest)]
    on = rest[bounds[0]:bounds[1]].strip().rstrip(";").strip()
    clauses = [
        rest[cut[k][1]:bounds[k + 2]].strip().rstrip(";").strip()
        for k in range(len(cut))
    ]

    def norm(expr: str) -> str:
        """Normalize user aliases to the engine's fixed t/s names —
        two-phase through placeholders so an alias literally named 't'
        or 's' (or fully crossed aliases) maps correctly instead of
        colliding with the fixed names, and never inside string
        literals."""
        pairs = [
            (alias, fixed)
            for alias, fixed in ((talias, "t"), (salias, "s"))
            if alias and alias.lower() != fixed
        ]
        for alias, fixed in pairs:
            # (?i): SQL identifiers are case-insensitive — TGT./Tgt.
            # qualify the same relation as tgt.
            expr = _sub_outside_literals(
                rf"(?i)\b{re.escape(alias)}\s*\.", f"\x00{fixed}\x00.", expr
            )
        for _alias, fixed in pairs:
            expr = expr.replace(f"\x00{fixed}\x00.", f"{fixed}.")
        return expr

    matched_clauses: list[tuple[str | None, str, dict | None]] = []
    not_matched_clauses: list[tuple[str | None, dict | bool]] = []
    by_source_clauses: list[tuple[str | None, str, dict | None]] = []
    for cl in clauses:
        # Clause regexes run on the literal-masked clause (a 'then' or
        # ')' inside a string must not terminate a lazy group); groups
        # slice from the original.
        mcl = _mask_literals(cl)
        mu = re.match(
            r"MATCHED\s+(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+UPDATE\s+SET\s+"
            r"(?P<sets>.*)$",
            mcl, re.IGNORECASE | re.DOTALL,
        )
        md = re.match(
            r"MATCHED\s+(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+DELETE$",
            mcl, re.IGNORECASE | re.DOTALL,
        )
        mi = re.match(
            r"NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?"
            r"(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+INSERT\s*"
            r"(?:(?P<star>\*)|(?:\((?P<cols>[^)]*)\)\s*)?"
            r"VALUES\s*\((?P<vals>.*)\))\s*$",
            mcl, re.IGNORECASE | re.DOTALL,
        )
        mbs = re.match(
            r"NOT\s+MATCHED\s+BY\s+SOURCE\s*"
            r"(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+"
            r"(?:(?P<del>DELETE)\s*$|UPDATE\s+SET\s+(?P<sets>.*)$)",
            mcl, re.IGNORECASE | re.DOTALL,
        )
        if mbs:
            raw_cond = _g(cl, mbs, "cond")
            cond = norm(raw_cond) if raw_cond else None
            if mbs.group("del"):
                by_source_clauses.append((cond, "delete", None))
            else:
                tprefix = re.compile(
                    rf"^(?:t|{re.escape(talias)})\." if talias else r"^t\.",
                    re.IGNORECASE,
                )
                by_source_clauses.append((cond, "update", {
                    tprefix.sub("", c): norm(e)
                    for c, e in _split_set_clauses(
                        _g(cl, mbs, "sets")
                    ).items()
                }))
            continue
        if mu:
            raw_cond = _g(cl, mu, "cond")
            cond = norm(raw_cond) if raw_cond else None
            # SET targets may be alias-qualified (t.col = ...): strip the
            # target prefix — merge_delta wants bare column names.
            tprefix = re.compile(
                rf"^(?:t|{re.escape(talias)})\." if talias else r"^t\.",
                re.IGNORECASE,
            )
            sets_raw = _g(cl, mu, "sets").strip().rstrip(";").strip()
            if sets_raw == "*":
                # UPDATE SET * (delta-spark): assign every SOURCE column
                # to the same-named target column.
                matched_clauses.append((cond, "update", {
                    c: f"s.`{c}`" for c in source.columns
                }))
                continue
            matched_clauses.append((cond, "update", {
                tprefix.sub("", c): norm(e)
                for c, e in _split_set_clauses(_g(cl, mu, "sets")).items()
            }))
        elif md:
            raw_cond = _g(cl, md, "cond")
            matched_clauses.append(
                (norm(raw_cond) if raw_cond else None, "delete", None)
            )
        elif mi:
            raw_cond = _g(cl, mi, "cond")
            cond = norm(raw_cond) if raw_cond else None
            if mi.group("star"):
                not_matched_clauses.append((cond, True))
            else:
                vals = _split_top_level(_g(cl, mi, "vals"))
                if mi.group("cols") is None:
                    raise ValueError(
                        "MERGE INSERT without a column list requires INSERT *"
                    )
                cols = [
                    c.strip().strip("`")
                    for c in mi.group("cols").split(",") if c.strip()
                ]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"MERGE INSERT: {len(cols)} columns vs {len(vals)} values"
                    )
                not_matched_clauses.append(
                    (cond, {c: norm(v.strip()) for c, v in zip(cols, vals)})
                )
        else:
            raise ValueError(f"unsupported MERGE clause: WHEN {cl[:60]}...")

    from pyspark.sql import Row

    from .sources.delta import read_delta
    from .sources.delta_dml import merge_delta

    loc = _delta_views[name]
    metrics = merge_delta(
        spark, loc, source, norm(on),
        matched_clauses=matched_clauses,
        not_matched_clauses=not_matched_clauses,
        not_matched_by_source_clauses=by_source_clauses,
        # MERGE WITH SCHEMA EVOLUTION INTO ... (delta-spark SQL form)
        schema_evolution=m.group("evolve") is not None,
    )
    read_delta(spark, loc).createOrReplaceTempView(name)
    return spark.createDataFrame([Row(**metrics)])


def _split_commas_outside_brackets(text: str) -> list[str]:
    """Split on commas not nested in () or <> — column-spec lists carry
    both paren types (decimal(10,2)) and generic types (map<string,int>)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p for p in parts if p.strip()]


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parens/brackets/string literals.
    Backslash escapes inside literals ('O\\'Brien') are skipped, matching
    _mask_literals — treating the escaped quote as a terminator would
    leak the rest of the literal to top level and mis-split."""
    parts, depth, in_str, esc, cur = [], 0, None, False, []
    for ch in s:
        if in_str:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def _split_update_tail(
    statement: str, masked: str, start: int
) -> tuple[str, str | None]:
    """Split everything after UPDATE's SET keyword into (sets, cond) at
    the first TOP-LEVEL ``WHERE`` — the regex's lazy split stops at the
    first WHERE even inside a parenthesized subquery (``SET a = (SELECT
    max(x) FROM u WHERE ...)``), which masking cannot hide. Scans the
    MASKED text (keywords inside literals already hidden) and extracts
    the spans from the original statement."""
    stripped = masked.rstrip()
    stop = len(stripped) - 1 if stripped.endswith(";") else len(stripped)
    depth = 0
    for mm in re.finditer(r"[()]|\bWHERE\b", masked[start:stop], re.IGNORECASE):
        tok = mm.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return (
                statement[start:start + mm.start()].strip(),
                statement[start + mm.end():stop].strip(),
            )
    return statement[start:stop].strip(), None


def _split_set_clauses(sets: str) -> dict[str, str]:
    """Parse ``col = expr, col2 = expr2`` splitting only at top-level commas
    (commas inside parens or string literals belong to the expression)."""
    out: dict[str, str] = {}
    for p in _split_top_level(sets):
        col, eq, expr = p.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"malformed SET clause: {p.strip()!r}")
        out[col.strip().strip("`")] = expr.strip()
    return out


def _delta_dml(
    spark: SparkSession, name: str, op: str, cond: str, sets: str | None = None
) -> DataFrame:
    """Run DELETE/UPDATE SQL against the Delta table behind view ``name``
    via the copy-on-write DML engine (sources/delta_dml), refresh the view,
    and return the operation metrics as a one-row DataFrame. MERGE has no
    SQL form here — use :func:`ballista_delta_spark.sources.delta_dml
    .merge_delta` (its clause structure doesn't regex cleanly)."""
    from pyspark.sql import Row

    from .sources.delta import read_delta
    from .sources import delta_dml

    loc = _delta_views[name]
    if op == "delete":
        metrics = delta_dml.delete_delta(spark, loc, cond)
    else:
        metrics = delta_dml.update_delta(
            spark, loc, cond, _split_set_clauses(sets or "")
        )
    read_delta(spark, loc).createOrReplaceTempView(name)
    return spark.createDataFrame([Row(**metrics)])
