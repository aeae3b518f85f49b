"""Z-order (Morton) clustering for multi-column data-skipping.

The lake-scale answer to "my queries filter on BOTH customer and date
but the table can only be sorted by one of them": interleave the bits of
the clustering columns' rank spaces into one Morton key, range-partition
and sort by it, and every written file covers a small RECTANGLE of the
multi-dimensional space instead of a full-width stripe — so parquet
row-group min/max stats prune scans on ANY clustered column, not just
the leading sort key. This is the same design Delta/Iceberg expose as
OPTIMIZE ZORDER BY; here it is plain DataFrame ops: one range shuffle on
the z-value plus a within-partition sort.

Bit math is pure integer expressions (shift/or/and), identically
computable in DuckDB for the oracle — the interleave expression is
GENERATED as a flat OR of per-bit shifts, the same trick as the simhash
oracle's 60 bit-sum columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_DIM = 21  # 2 dims × 21 bits = 42-bit Morton key, fits a bigint


def interleave_sql(a: str, b: str, bits: int = BITS_PER_DIM) -> str:
    """SQL for the Morton interleave of two non-negative ints (low
    ``bits`` of each): bit i of ``a`` lands at 2i, of ``b`` at 2i+1.
    Flat OR of shifts — identical text works in Spark SQL and DuckDB."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def z_value(a, b, bits: int = BITS_PER_DIM) -> "F.Column":
    """Morton key column for two non-negative integer columns (names or
    SQL snippets)."""
    return F.expr(interleave_sql(str(a), str(b), bits))


def interleave_sql_n(cols: list, bits: int) -> str:
    """N-dimensional Morton interleave: bit i of dimension d lands at
    position ``i * n_dims + d`` (round-robin — every dimension
    contributes equally to every split level, the property that makes
    range splits prune on ANY clustered column). ``n_dims * bits`` must
    fit a signed bigint (≤ 62). Same flat OR-of-shifts text in Spark SQL
    and DuckDB."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} dims × {bits} bits exceeds a bigint")
    parts = []
    for i in range(bits):
        for d, c in enumerate(cols):
            parts.append(f"((({c} >> {i}) & 1) << {i * n + d})")
    return "(" + " | ".join(parts) + ")"


def z_value_n(cols: list, bits: int) -> "F.Column":
    """Morton key for N non-negative integer columns (names/snippets)."""
    return F.expr(interleave_sql_n([str(c) for c in cols], bits))


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` by the Morton key of (col_a, col_b) and write
    ``n_files``-ish parquet files, each covering a small rectangle of the
    (a, b) space. One range shuffle + per-partition sort; no driver
    materialization. Columns must be non-negative integers (rank or
    bucket them first — rank-space interleaving is what bounds each
    dimension's bits)."""
    z = z_value(col_a, col_b).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
