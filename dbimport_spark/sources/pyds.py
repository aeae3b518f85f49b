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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
