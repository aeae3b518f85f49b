"""Registry plumbing for driver-checked queries."""

from __future__ import annotations

import functools
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship dbimport_spark to executor Python workers.

    Queries using pandas UDFs / mapInPandas pickle closures BY REFERENCE to
    this package; when the driver process imports __spark_entry__ from a
    different cwd, worker processes can't import it. addPyFile'ing a zip of
    the package makes the import work everywhere (local mode and real
    clusters alike)."""
    sc = spark.sparkContext
    if sc._jsc is None or getattr(sc, "_dbimport_pkg_shipped", False):
        return
    import dbimport_spark

    pkg_dir = os.path.dirname(os.path.abspath(dbimport_spark.__file__))
    zip_base = os.path.join(tempfile.gettempdir(), f"dbimport_spark_pkg_{os.getpid()}")
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="dbimport_spark"
    )
    sc.addPyFile(zip_path)
    sc._dbimport_pkg_shipped = True


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query; oracle=None means the
    driver records a weaker rows-only check (non-SQL-expressible op)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_package_on_workers(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — the registry is "
                "latest-wins by dict semantics, which silently shadows the "
                "earlier query; rename one of them"
            )
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS). Spark builds differ in how
    they read it: older ones need spark.sql.legacy.parquet.nanosAsLong and
    yield a BIGINT to truncate ourselves; 4.1+ reads it natively as
    TIMESTAMP_NTZ already floored to micros. Both paths below produce the
    same TIMESTAMP (session-tz UTC) column, identical to DuckDB's ns→us
    coercion of the same file (both floor)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
