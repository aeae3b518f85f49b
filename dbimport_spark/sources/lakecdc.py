"""Streaming CDC source over the transaction-log lake (format "lake_cdc").

Registers the ACID lake (dbimport_spark/txnlog.py) as a REAL Structured
Streaming source via Spark 4's Python DataSource API: each micro-batch
covers the commit versions between two offsets, fanning out ONE task per
file ADDED in those commits, and every row carries its `_commit_version`
— the streaming spelling of Delta's table-as-a-stream. Offsets are
`{"version": N}` (all versions ≤ N consumed), so a restart from a
checkpoint resumes exactly after the last committed version with no
rescan of old data — the log IS the write-ahead index.

Scope (documented, loud): append-only CDC. A commit that REMOVES files
(upsert/delete whole-snapshot rewrites) is not row-level change data;
reading past one raises unless `ignoreChanges=true` is set (then its
added files are still emitted) — the same contract Delta's streaming
source exposes. Partitioned tables (partition value lives in the log,
not the file) raise NotImplementedError.

Planning is metadata-only: the driver reads log JSONs, never data pages;
executors read exactly the parquet files their partition names. At
100 TB a steady append stream costs one log entry read per commit plus
one task per new file.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from dbimport_spark.txnlog import (
    _data_dir,
    _fold_log,
    _log_dir,
    current_version,
)

_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "int8": "tinyint",
    "string": "string",
    "large_string": "string",
    "double": "double",
    "float": "float",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _table_ddl(path: str, partition_col: str | None = None) -> str:
    """Schema of the table's newest ADDED file (+ the log-resident
    partition column when named + _commit_version), read from the
    parquet footer only."""
    import pyarrow.parquet as pq

    v = current_version(path)
    if v < 0:
        raise ValueError(f"lake_cdc: empty table at {path}")
    live, _ptype = _fold_log(path, v)
    if not live:
        raise ValueError(f"lake_cdc: no added files in any commit at {path}")
    # merge field sets across ALL live files (footer reads only): a
    # schema-evolved table's widest columns may live in any commit
    seen: dict[str, str] = {}
    order: list[str] = []
    for name in sorted(live):
        schema = pq.read_schema(os.path.join(_data_dir(path), name))
        for f in schema:
            t = str(f.type)
            if t.startswith("timestamp"):
                ddl = "timestamp"
            elif t.startswith("decimal"):
                ddl = t
            else:
                ddl = _ARROW_TO_DDL.get(t)
            if ddl is None:
                raise ValueError(
                    f"lake_cdc: unsupported column type {t} ({f.name})"
                )
            if f.name not in seen:
                seen[f.name] = ddl
                order.append(f.name)
            elif seen[f.name] != ddl:
                raise ValueError(
                    f"lake_cdc: conflicting types for {f.name}: "
                    f"{seen[f.name]} vs {ddl}"
                )
    cols = [f"{n} {seen[n]}" for n in order]
    if partition_col:
        _, ptype = _fold_log(path, v)
        if ptype is None:
            raise ValueError(
                "lake_cdc: partitionColumn given but the log records no "
                "partition type (table was not written partitioned)"
            )
        cols.append(f"{partition_col} {ptype}")
    return ", ".join(cols) + ", _commit_version bigint"


def _read_entry(path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(path), f"{version:08d}.json")) as fh:
        return json.load(fh)


class _AddedFile(InputPartition):
    def __init__(self, file_path: str, version: int, pval=None, ptype=None):
        self.file_path = file_path
        self.version = version
        self.pval = pval    # hive-encoded partition value (or None)
        self.ptype = ptype  # partition column DDL type (or None)


def _partition_array(pval, ptype, n_rows):
    """Arrow column re-attaching a log-resident partition value, decoded
    from its hive directory encoding and cast per the recorded DDL type
    (the same round-trip read_snapshot_partitioned performs)."""
    import pyarrow as pa

    from dbimport_spark.txnlog import _HIVE_NULL, _unescape_path_name

    arrow_t = {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "string": pa.string(),
        "date": pa.date32(),
        "boolean": pa.bool_(),
    }.get(ptype or "string")
    if arrow_t is None:
        raise ValueError(f"lake_cdc: unsupported partition type {ptype}")
    if pval is None or pval == _HIVE_NULL:
        return pa.nulls(n_rows, arrow_t)
    raw = _unescape_path_name(pval)
    if ptype in ("bigint", "int"):
        v = int(raw)
    elif ptype == "boolean":
        v = raw.lower() == "true"
    elif ptype == "date":
        import datetime as _dt

        v = _dt.date.fromisoformat(raw)
    else:
        v = raw
    return pa.array([v] * n_rows, arrow_t)


class LakeCdcStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, options, schema=None):
        # arrow schema of the DATA columns (everything but the appended
        # partition + _commit_version columns): older commits' files may
        # predate later widening commits, so each file is conformed to
        # this schema with null-fill — the streaming spelling of the
        # batch reader's mergeSchema
        self._data_fields = None
        if schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            skip = {"_commit_version", options.get("partitionColumn")}
            arrow = to_arrow_schema(schema)
            self._data_fields = [f for f in arrow if f.name not in skip]
        self._init_rest(path, options)

    def _init_rest(self, path: str, options):
        self._path = path
        self._ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        # skipChangeCommits: drop remove-carrying commits entirely (their
        # added files are NOT emitted) — the third arm of Delta's contract
        self._skip_changes = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self._partition_col = options.get("partitionColumn")
        self._ptype = None
        if self._partition_col:
            _, self._ptype = _fold_log(path, current_version(path))
        self._start = int(options.get("startingVersion", 0))
        # maxVersionsPerTrigger: admission control — cap how many commits
        # one micro-batch swallows (Delta's maxFilesPerTrigger at this
        # source's natural granularity: offsets ARE versions, and a
        # version is never split across batches). Best-effort after a
        # restart: the first batch is unbounded because latestOffset()
        # cannot see the checkpointed start (the engine owns it); every
        # subsequent batch is capped. A throughput knob, never a
        # correctness one.
        mv = int(options.get("maxVersionsPerTrigger", 0))
        self._max_versions = mv if mv > 0 else None
        self._cursor: int | None = None  # last version handed to partitions()

    def _trace(self, msg):
        import os as _os

        tf = _os.environ.get("LAKE_CDC_TRACE")
        if tf:
            with open(tf, "a") as fh:
                fh.write(msg + "\n")

    def initialOffset(self) -> dict:
        self._trace(f"initialOffset cursor={self._cursor}")
        self._cursor = self._start - 1
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        cur = current_version(self._path)
        self._trace(f"latestOffset cur={cur} cursor={self._cursor} max={self._max_versions}")
        if self._max_versions is None:
            return {"version": cur}
        if self._cursor is None:
            # the engine calls latestOffset BEFORE initialOffset (traced);
            # bootstrap pacing from startingVersion. After a checkpoint
            # restart the replayed/committed batch re-seeds the cursor via
            # partitions()/commit() before new planning matters.
            self._cursor = self._start - 1
        return {"version": min(cur, self._cursor + self._max_versions)}

    def commit(self, end: dict) -> None:
        # ratchet: a completed batch can only move pacing forward (also
        # re-seeds the cursor after a restart where partitions() was not
        # replayed)
        self._cursor = max(self._cursor if self._cursor is not None else -1,
                           int(end["version"]))

    def partitions(self, start: dict, end: dict):
        self._trace(f"partitions {start} {end}")
        self._cursor = max(self._cursor if self._cursor is not None else -1,
                           int(end["version"]))
        parts: list[_AddedFile] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            entry = _read_entry(self._path, v)
            # A deletion-vector commit changes VISIBLE rows of already-
            # streamed files without adding any — it is change data, same
            # contract arm as a remove-carrying rewrite. (Under
            # ignoreChanges its added files — there are none — stream,
            # matching Delta: DV'd deletions are simply not re-emitted.)
            if entry.get("removed") or entry.get("dv"):
                if self._skip_changes:
                    continue
                if not self._ignore_changes:
                    kind = "removes files" if entry.get("removed") else (
                        "attaches deletion vectors"
                    )
                    raise ValueError(
                        f"lake_cdc: version {v} {kind} (row-level change) "
                        "— not append change data. Set "
                        "ignoreChanges=true to stream its added files anyway, "
                        "or skipChangeCommits=true to drop such commits."
                    )
            for e in entry.get("added", []):
                name = e["n"] if isinstance(e, dict) else e
                pval = e.get("p") if isinstance(e, dict) else None
                if pval is not None and not self._partition_col:
                    raise ValueError(
                        "lake_cdc: table is partitioned (partition values "
                        "live in the log, not the files) — pass the "
                        "partitionColumn option to stream it"
                    )
                parts.append(
                    _AddedFile(
                        os.path.join(_data_dir(self._path), name),
                        v,
                        pval=pval,
                        ptype=self._ptype,
                    )
                )
        # Spark requires ≥1 partition even for an empty range
        return parts or [_AddedFile("", int(end["version"]))]

    def read(self, partition: _AddedFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.file_path:
            return iter([])
        tbl = pq.read_table(partition.file_path)
        if self._data_fields is not None:
            cols = []
            for f in self._data_fields:
                if f.name in tbl.column_names:
                    cols.append(tbl[f.name].cast(f.type))
                else:  # file predates the widening commit: null-fill
                    cols.append(pa.nulls(tbl.num_rows, f.type))
            tbl = pa.table(cols, names=[f.name for f in self._data_fields])
        if self._partition_col:
            tbl = tbl.append_column(
                self._partition_col,
                _partition_array(partition.pval, partition.ptype, tbl.num_rows),
            )
        tbl = tbl.append_column(
            "_commit_version",
            pa.array([partition.version] * tbl.num_rows, pa.int64()),
        )
        return iter(tbl.to_batches(max_chunksize=8192))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; the log is immutable


class LakeCdcDataSource(DataSource):
    """spark.readStream.format("lake_cdc").option("path", table).load()"""

    @classmethod
    def name(cls) -> str:
        return "lake_cdc"

    def schema(self) -> str:
        return _table_ddl(
            self.options["path"], self.options.get("partitionColumn")
        )

    def streamReader(self, schema) -> LakeCdcStreamReader:
        return LakeCdcStreamReader(self.options["path"], self.options, schema)


def register_lake_cdc(spark) -> None:
    from dbimport_spark.plans.registry import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(LakeCdcDataSource)
