"""Single-value blob import: load one file's bytes into a blob column of
the rows matching a filter.

Reference: `importblob` mode — BlobImportDefinition.java (85 LoC),
executed at DbImport.java:822-835: the file content binds to the `?` of a
user-supplied UPDATE statement. Spark expression: binaryFile read of the
one file → literal bytes → conditional withColumn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def import_blob(
    spark: SparkSession,
    target: DataFrame,
    blob_file: str,
    set_column: str,
    where: str,
) -> DataFrame:
    """UPDATE target SET set_column = <bytes of blob_file> WHERE <where>.

    The file is read through the binaryFile source (one row); its content
    becomes a literal in the update projection, so the update itself is a
    pure narrow map over the target — no shuffle, no UDF."""
    row = spark.read.format("binaryFile").load(blob_file).select("content").head()
    if row is None:
        raise FileNotFoundError(blob_file)
    content = bytes(row["content"])
    cond = F.expr(where)
    cols = [
        F.when(cond, F.lit(content)).otherwise(F.col(c)).alias(c)
        if c == set_column
        else F.col(c)
        for c in target.columns
    ]
    if set_column not in target.columns:
        raise ValueError(f"target has no column {set_column!r}")
    return target.select(*cols)
