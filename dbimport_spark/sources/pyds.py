"""WebDataset as a REGISTERED Spark data source (Python DataSource API,
Spark 4): ``spark.read.format("webdataset").option(...).load()``.

The mapInPandas reader in sources/webdataset.py predates this API and
remains the portable path; this wrapper makes the shard layout a
first-class format so downstream code gets the full reader contract —
catalog-friendly ``format()`` syntax, schema-on-load, and Spark-planned
input partitions (one per tar shard, the layout's native parallelism
unit) instead of a hand-built path DataFrame.

Reference parity note: the reference engine dispatches sources by format
name (DataProvider factory, de/soderer/dbimport/DbImport.java); a
registered DataSource is the Spark-native spelling of that dispatch.

Options:
  path  — glob or comma-list of shard paths (expanded on the driver;
          shard LISTS are metadata-sized even at 100 TB corpora)
  exts  — comma-list of sample extensions to project (``txt,cls,json``);
          each becomes a BINARY column named with ``.`` → ``_``
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str, exts: list[str]):
        self.path = path
        self.exts = exts


class WebDatasetDataSource(DataSource):
    """format("webdataset") — tar shards of adjacent same-stem members."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def _exts(self) -> list[str]:
        return [e.strip() for e in self.options.get("exts", "txt").split(",") if e.strip()]

    def schema(self) -> str:
        cols = [e.replace(".", "_") for e in self._exts()]
        return "shard string, key string, " + ", ".join(f"{c} binary" for c in cols)

    def reader(self, schema) -> "WebDatasetShardReader":
        return WebDatasetShardReader(self.options.get("path", ""), self._exts())

    def writer(self, schema, overwrite: bool) -> "WebDatasetShardWriter":
        out = self.options.get("path", "")
        os.makedirs(out or ".", exist_ok=True)
        if overwrite:
            for f in _glob.glob(os.path.join(out, "shard-*.tar")):
                os.remove(f)
        return WebDatasetShardWriter(out, schema)


class WebDatasetShardReader(DataSourceReader):
    def __init__(self, path_opt: str, exts: list[str]):
        paths: list[str] = []
        for piece in path_opt.split(","):
            piece = piece.strip()
            if not piece:
                continue
            hits = sorted(_glob.glob(piece))
            paths.extend(hits if hits else [piece])
        if not paths:
            raise ValueError("webdataset source needs option('path', <glob>)")
        self._paths = paths
        self._exts = exts

    def partitions(self):
        # one Spark input partition per shard — the WebDataset contract
        # (shards are both the shuffle unit and the parallelism unit)
        return [_ShardPartition(p, self._exts) for p in self._paths]

    def read(self, partition: _ShardPartition):
        from dbimport_spark.sources.webdataset import iter_samples

        with open(partition.path, "rb") as fh:
            blob = fh.read()
        shard = os.path.basename(partition.path)
        for key, fields in iter_samples(blob, partition.exts):
            yield (shard, key) + tuple(fields[e] for e in partition.exts)


def register_webdataset(spark) -> None:
    """Idempotently register the format on this session."""
    if getattr(spark, "_dbimport_wds_registered", False):
        return
    spark.dataSource.register(WebDatasetDataSource)
    spark._dbimport_wds_registered = True


class _ShardCommit(WriterCommitMessage):
    def __init__(self, final_path: str, tmp_path: str, n: int):
        self.final_path = final_path
        self.tmp_path = tmp_path
        self.n = n


class WebDatasetShardWriter(DataSourceWriter):
    """Distributed shard writer: EACH TASK packs its partition's rows
    into one tar shard — the write path that replaces the driver-side
    collect the survey flagged as known-hard for single-file formats:
    shards are many-file by design, so the natural parallel unit writes
    them with no driver data path. Rows: a ``key`` string column plus
    one BINARY column per member extension (``_`` → ``.``, the reader's
    naming inverse); NULL fields are skipped (samples may lack members).

    Two-phase commit against failed / speculative task attempts: each
    attempt writes to an attempt-unique ``shard-<pid>-<uuid>.tar.inprogress``
    name — INVISIBLE to the reader's ``*.tar`` glob — and only the
    driver-side ``commit()`` (invoked once, with exactly the winning
    attempts' messages) renames the winners to ``.tar``. Losing or
    crashed attempts never surface as duplicate shards; their orphaned
    ``.inprogress`` files are swept by commit()/abort(). This closes the
    duplicate-row window the rename-free design had when a retried task
    left its first attempt's shard behind."""

    def __init__(self, path: str, schema):
        if not path:
            raise ValueError("webdataset sink needs option('path', <dir>)")
        self._dir = path
        self._cols = [f.name for f in schema.fields if f.name != "key"]
        if "key" not in [f.name for f in schema.fields]:
            raise ValueError("webdataset sink needs a 'key' string column")

    def write(self, iterator):
        import uuid as _uuid

        from pyspark import TaskContext

        from dbimport_spark.sources.webdataset import write_shard

        pid = TaskContext.get().partitionId()
        samples = []
        for row in iterator:
            fields = {
                c.replace("_", "."): bytes(row[c])
                for c in self._cols
                if row[c] is not None
            }
            samples.append((row["key"], fields))
        final = os.path.join(
            self._dir, f"shard-{pid:05d}-{_uuid.uuid4().hex[:8]}.tar"
        )
        tmp = final + ".inprogress"
        if samples:
            write_shard(tmp, samples)
        return _ShardCommit(final, tmp, len(samples))

    def _sweep_inprogress(self) -> None:
        # losing/crashed attempts never reach commit(); their temp files
        # are safe to drop once the job has resolved (commit or abort)
        for orphan in _glob.glob(os.path.join(self._dir, "shard-*.tar.inprogress")):
            try:
                os.remove(orphan)
            except OSError:
                pass

    def commit(self, messages):
        for msg in messages:
            if msg is None:
                continue
            if msg.n > 0 and os.path.exists(msg.tmp_path):
                os.replace(msg.tmp_path, msg.final_path)
        self._sweep_inprogress()

    def abort(self, messages):
        for msg in messages:
            if msg is None:
                continue
            try:
                if os.path.exists(msg.tmp_path):
                    os.remove(msg.tmp_path)
            except OSError:
                pass
        self._sweep_inprogress()
