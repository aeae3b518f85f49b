"""Inline data source: the `-import` argument IS the data, not a path.

Reference: `-data` flag (DataProvider.java:150-156,
DbImportDefinition.java:222-259). Inline data is by definition small —
parsed driver-side with the stdlib csv module (quote-aware), then
parallelized.
"""

from __future__ import annotations

import csv as _csv
import io

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.operators.order import SRC_ORDER_COL


def read_inline_data(
    spark: SparkSession,
    data: str,
    separator: str = ";",
    quote: str = '"',
    no_headers: bool = False,
    null_value_string: str = "",
) -> DataFrame:
    rows = list(
        _csv.reader(io.StringIO(data), delimiter=separator, quotechar=quote)
    )
    rows = [r for r in rows if r]
    if not rows:
        raise ValueError("inline data is empty")
    if no_headers:
        header = [f"column_{i + 1}" for i in range(len(rows[0]))]
        body = rows
    else:
        header, body = rows[0], rows[1:]
    records = []
    for i, r in enumerate(body):
        rec = {
            h: (None if v == null_value_string else v)
            for h, v in zip(header, r)
        }
        rec[SRC_ORDER_COL] = i
        records.append(rec)
    schema = ", ".join([f"`{h}` string" for h in header] + [f"{SRC_ORDER_COL} long"])
    return spark.createDataFrame(records, schema)
