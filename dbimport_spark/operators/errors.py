"""Erroneous-row extraction: invalid rows re-extracted from the source
file into a sibling `.errors` file in the original format.

Reference: DataProvider.filterDataItems per provider (e.g.
CsvDataProvider.java:227-284), triggered at DbImportWorker.java:591-593.
The reference re-reads the source and copies the lines whose indexes
erred; we do the same — line positions come from a distributed
zipWithIndex over the text file, the (small) error index set is collected,
and the matching raw lines are written next to the source. Error sets are
small by contract (the reference truncates its report to 10), so the
final write is driver-side like the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.operators.order import SRC_ORDER_COL


def extract_error_rows(
    spark: SparkSession,
    source_path: str,
    invalid: DataFrame,
    order_col: str = SRC_ORDER_COL,
    has_header: bool = True,
    suffix: str = ".errors",
) -> str:
    """Write the raw source lines whose data-row index appears in
    ``invalid[order_col]`` to ``source_path + suffix`` (header copied when
    present). Returns the error-file path."""
    bad = sorted(
        r[0] for r in invalid.select(order_col).distinct().collect() if r[0] is not None
    )
    header_offset = 1 if has_header else 0
    wanted = {int(b) + header_offset for b in bad}
    if has_header:
        wanted.add(0)

    # line numbering via zipWithIndex: partition order follows file byte
    # order for a single text file, so indexes == physical line numbers
    lines = (
        spark.read.text(source_path)
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
        .filter(lambda t: t[1] in wanted)
        .collect()
    )
    out_path = source_path + suffix
    with open(out_path, "w", encoding="utf-8", newline="") as f:
        for text, _idx in sorted(lines, key=lambda t: t[1]):
            f.write(text + "\n")
    return out_path
