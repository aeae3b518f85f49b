"""Excel (.xls/.xlsx) and ODS sources.

Reference: dataprovider/ExcelDataProvider.java (magic-byte sniffing
:573-605, sheet select via `-dp` :488-568, typed cells :259-332) and
OdsDataProvider.java. Excel/ODS files are inherently single-file,
driver-side reads in the reference too — small by nature.

openpyxl / xlrd / odfpy are NOT in this container: the parse step raises
NotImplementedError behind an import-try; the Spark-side plumbing
(rows → typed createDataFrame + _src_order) is real and unit-tested via
``rows_to_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.operators.order import SRC_ORDER_COL

XLSX_MAGIC = b"PK\x03\x04"   # zip container (ExcelDataProvider.java:573-605)
XLS_MAGIC = b"\xd0\xcf\x11\xe0"  # OLE2


def sniff_excel_kind(path: str) -> str:
    with open(path, "rb") as f:
        head = f.read(4)
    if head == XLSX_MAGIC:
        return "xlsx"
    if head == XLS_MAGIC:
        return "xls"
    raise ValueError(f"not an Excel file (magic bytes {head!r}): {path}")


def rows_to_df(
    spark: SparkSession,
    header: list[str],
    rows: list[list],
    trim_trailing_empty: bool = True,
) -> DataFrame:
    """Typed rows → DataFrame + _src_order. Last-used-row trimming mirrors
    ExcelDataProvider's trailing-blank handling."""
    if trim_trailing_empty:
        while rows and all(v is None or v == "" for v in rows[-1]):
            rows.pop()
    records = []
    for i, r in enumerate(rows):
        rec = dict(zip(header, list(r) + [None] * (len(header) - len(r))))
        rec[SRC_ORDER_COL] = i
        records.append(rec)
    return spark.createDataFrame(records) if records else spark.createDataFrame(
        [], ", ".join(f"`{h}` string" for h in header) + f", {SRC_ORDER_COL} long"
    )


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,  # `-dp`
    no_headers: bool = False,
) -> DataFrame:
    kind = sniff_excel_kind(path)
    if kind == "xlsx":
        try:
            import openpyxl
        except ImportError as e:
            raise NotImplementedError(
                "xlsx parsing requires openpyxl (not installed in this container)"
            ) from e
        wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
        ws = wb[sheet_name] if sheet_name else wb.worksheets[0]
        raw = [[c.value for c in row] for row in ws.iter_rows()]
    else:
        try:
            import xlrd
        except ImportError as e:
            raise NotImplementedError(
                "xls parsing requires xlrd (not installed in this container)"
            ) from e
        book = xlrd.open_workbook(path)
        sh = book.sheet_by_name(sheet_name) if sheet_name else book.sheet_by_index(0)
        raw = [sh.row_values(i) for i in range(sh.nrows)]
    if not raw:
        raise ValueError(f"empty sheet in {path}")
    if no_headers:
        header = [f"column_{i + 1}" for i in range(len(raw[0]))]
        body = raw
    else:
        header = [str(h) if h is not None else f"column_{i + 1}" for i, h in enumerate(raw[0])]
        body = raw[1:]
    return rows_to_df(spark, header, body)


def read_ods(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    no_headers: bool = False,
) -> DataFrame:
    try:
        from odf import opendocument  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "ods parsing requires odfpy (not installed in this container)"
        ) from e
    raise NotImplementedError("ODS cell extraction lands with odfpy available")
