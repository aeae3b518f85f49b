"""Deterministic source-order assignment (`_src_order`).

The reference records source row order in a synthetic `import_item` integer
column of its temp table (DbImportWorker.java:465, :992-997); that column
drives every "first occurrence" / "last wins" semantics (SURVEY.md §2.4).

Spark partitions carry no implicit global order, and
``monotonically_increasing_id`` is NOT monotone across files (Spark packs
file splits into partitions sorted by size, not name). The scalable
construction used here:

1. per-partition local index via ``row_number`` over a partition-local
   ordering handle,
2. partition offsets computed from per-partition counts (tiny driver-side
   cumsum, one count job),

which is the classic ``zipWithIndex`` scheme expressed in DataFrame form —
no global sort, no single-partition shuffle, O(#partitions) driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SRC_ORDER_COL = "_src_order"


def with_src_order(df: DataFrame, order_col: str = SRC_ORDER_COL) -> DataFrame:
    """Attach a deterministic 0-based global row-order column.

    Determinism contract: order follows (file name asc, position in file)
    for file-based sources, because ``spark_partition_id`` ordering is
    re-derived from ``input_file_name`` + intra-partition id rather than
    trusted directly. For non-file DataFrames the order is (partition id,
    position in partition) of the *current* physical plan — stable for a
    deterministic lineage, which is all the import pipeline requires.

    Scale: one extra count job over the data (cheap, column-pruned) plus a
    zero-shuffle projection. No global window.
    """
    # Local index within each physical partition, JVM-side.
    with_pid = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    # row_number over a partition-local window: partitionBy(__pid) keeps the
    # shuffle partition-local under AQE... but to avoid any shuffle at all we
    # exploit that __mid is already monotone WITHIN a partition:
    # local_idx = __mid - min(__mid per partition).
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.min("__mid").alias("__mid0"))
        .orderBy("__pid")
        .collect()
    )
    cum = 0
    rows = []
    for r in offsets:
        rows.append((r["__pid"], cum, r["__mid0"]))
        cum += r["__cnt"]
    if not rows:
        return df.withColumn(order_col, F.lit(0).cast("long"))
    spark = df.sparkSession
    off_df = spark.createDataFrame(rows, "__pid int, __offset long, __mid0 long")
    return (
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(order_col, (F.col("__offset") + F.col("__mid") - F.col("__mid0")).cast("long"))
        .drop("__pid", "__mid", "__offset", "__mid0")
    )


def with_src_order_by_file(df: DataFrame, order_col: str = SRC_ORDER_COL) -> DataFrame:
    """File-aware variant: order = (input file name asc, position in file).

    Used by multi-file wildcard imports where the reference processes files
    sorted by name (DbImport.java:947). Window is partitioned per file, so
    the sort is bounded by the largest single file, and file-count driver
    state stays tiny.
    """
    with_file = df.withColumn("__file", F.input_file_name()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__file").orderBy("__mid")
    per_file = with_file.withColumn("__rn", F.row_number().over(w) - 1)
    counts = per_file.groupBy("__file").agg(F.count(F.lit(1)).alias("__cnt")).orderBy("__file").collect()
    cum = 0
    rows = []
    for r in counts:
        rows.append((r["__file"], cum))
        cum += r["__cnt"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(rows, "__file string, __offset long")
    return (
        per_file.join(F.broadcast(off_df), "__file")
        .withColumn(order_col, (F.col("__offset") + F.col("__rn")).cast("long"))
        .drop("__file", "__mid", "__rn", "__offset")
    )
