"""Excel (.xls/.xlsx) and ODS sources.

Reference: dataprovider/ExcelDataProvider.java (magic-byte sniffing
:573-605, sheet select via `-dp` :488-568, typed cells :259-332) and
OdsDataProvider.java. Excel/ODS files are inherently single-file,
driver-side reads in the reference too — small by nature.

.xlsx and .ods are zip-of-XML formats, parsed here with the stdlib
(zipfile + xml.etree) — openpyxl/odfpy are preferred when installed but
NOT required. Legacy binary .xls (OLE2) genuinely needs xlrd and stays
import-gated. Typed cells (numeric, date-formatted numeric → datetime,
boolean, string) mirror ExcelDataProvider.java:259-332.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
import xml.etree.ElementTree as _ET
import zipfile as _zipfile

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


def _disambiguate_headers(header: list[str]) -> list[str]:
    """Duplicate header cells get _2/_3… suffixes — the reference keeps raw
    POI names (duplicates allowed in a row-map), but a columnar schema needs
    unique names; a dict-of-row build would silently drop the earlier
    column."""
    seen: dict[str, int] = {}
    out = []
    for h in header:
        n = seen.get(h, 0) + 1
        seen[h] = n
        out.append(h if n == 1 else f"{h}_{n}")
    return out


def _infer_column_type(values: list):
    """Explicit per-column Spark type from typed cell values. Spark's own
    createDataFrame inference dies on all-None columns and mixed-type
    columns (both common in real sheets) — infer here and fall back to
    string."""
    from pyspark.sql import types as T

    kinds = set()
    for v in values:
        if v is None or v == "":
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        elif isinstance(v, _dt.datetime):
            kinds.add("datetime")
        elif isinstance(v, _dt.date):
            kinds.add("date")
        elif isinstance(v, str):
            kinds.add("str")
        else:
            kinds.add("other")
    if kinds == {"bool"}:
        return T.BooleanType(), None
    if kinds == {"int"}:
        return T.LongType(), None
    if kinds in ({"float"}, {"int", "float"}):
        return T.DoubleType(), float
    if kinds == {"datetime"}:
        return T.TimestampType(), None
    if kinds == {"date"}:
        return T.DateType(), None
    # all-None, pure string, or mixed → string (stringify non-strings)
    return T.StringType(), (
        None if kinds <= {"str"} else (lambda v: v if isinstance(v, str) else str(v))
    )


def rows_to_df(
    spark: SparkSession,
    header: list[str],
    rows: list[list],
    trim_trailing_empty: bool = True,
) -> DataFrame:
    """Typed rows → DataFrame + _src_order with an EXPLICIT schema inferred
    per column (string fallback for mixed/empty columns, duplicate headers
    disambiguated). Last-used-row trimming mirrors ExcelDataProvider's
    trailing-blank handling."""
    from pyspark.sql import types as T

    if trim_trailing_empty:
        while rows and all(v is None or v == "" for v in rows[-1]):
            rows.pop()
    header = _disambiguate_headers(header)
    ncols = len(header)
    padded = [list(r)[:ncols] + [None] * (ncols - len(r)) for r in rows]
    fields, converters = [], []
    for i, h in enumerate(header):
        dtype, conv = _infer_column_type([r[i] for r in padded])
        fields.append(T.StructField(h, dtype))
        converters.append(conv)
    fields.append(T.StructField(SRC_ORDER_COL, T.LongType(), nullable=False))
    schema = T.StructType(fields)
    records = []
    for i, r in enumerate(padded):
        rec = [
            None if v is None or v == "" else (conv(v) if conv else v)
            for v, conv in zip(r, converters)
        ]
        records.append(rec + [i])
    return spark.createDataFrame(records, schema)


# ------------------------------------------------------- stdlib xlsx parse

_XLSX_DATE_BUILTIN_FMTS = set(range(14, 23)) | {45, 46, 47}
_DATE_FMT_RE = _re.compile(r"[ymdhs]", _re.IGNORECASE)
_CELL_REF_RE = _re.compile(r"^([A-Z]+)\d+$")
_EXCEL_EPOCH = _dt.datetime(1899, 12, 30)


def _tag(el) -> str:
    return el.tag.rsplit("}", 1)[-1]


def _col_index(ref: str | None) -> int | None:
    """'BC7' → 0-based column 54; None when the cell has no ref."""
    if not ref:
        return None
    m = _CELL_REF_RE.match(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _xlsx_shared_strings(zf: _zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = _ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root:
        out.append("".join(t.text or "" for t in si.iter() if _tag(t) == "t"))
    return out


def _xlsx_date_styles(zf: _zipfile.ZipFile) -> set[int]:
    """Indexes into cellXfs whose number format is date-like
    (ExcelDataProvider converts date-formatted numerics to datetime)."""
    if "xl/styles.xml" not in zf.namelist():
        return set()
    root = _ET.fromstring(zf.read("xl/styles.xml"))
    custom_date_ids = set()
    for nf in root.iter():
        if _tag(nf) == "numFmt":
            code = nf.get("formatCode", "")
            if _DATE_FMT_RE.search(_re.sub(r'"[^"]*"', "", code)):
                custom_date_ids.add(int(nf.get("numFmtId", "-1")))
    date_styles = set()
    for el in root.iter():
        if _tag(el) == "cellXfs":
            for i, xf in enumerate(x for x in el if _tag(x) == "xf"):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in _XLSX_DATE_BUILTIN_FMTS or fmt in custom_date_ids:
                    date_styles.add(i)
    return date_styles


def _xlsx_sheet_path(zf: _zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = _ET.fromstring(zf.read("xl/workbook.xml"))
    rels = _ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels if _tag(r) == "Relationship"
    }
    sheets = [el for el in wb.iter() if _tag(el) == "sheet"]
    if not sheets:
        raise ValueError("workbook has no sheets")
    chosen = None
    if sheet_name is None:
        chosen = sheets[0]
    else:
        for s in sheets:
            if s.get("name") == sheet_name:
                chosen = s
                break
        if chosen is None:
            raise ValueError(f"sheet not found: {sheet_name!r}")
    rid = next(v for k, v in chosen.attrib.items() if k.endswith("}id") or k == "id")
    target = rid_to_target[rid]
    return target if target.startswith("xl/") else f"xl/{target}"


def _num(text: str) -> float:
    """Spreadsheet numerics are doubles (the reference's POI
    getNumericCellValue likewise returns double; int-ness is decided by
    the target column's coercion, not the source)."""
    return float(text)


def _read_xlsx_stdlib(path: str, sheet_name: str | None) -> list[list]:
    """Minimal OOXML spreadsheet parse: shared strings, inline strings,
    booleans, numerics, date-styled numerics → datetime."""
    with _zipfile.ZipFile(path) as zf:
        sst = _xlsx_shared_strings(zf)
        date_styles = _xlsx_date_styles(zf)
        sheet = _ET.fromstring(zf.read(_xlsx_sheet_path(zf, sheet_name)))
    rows: list[list] = []
    for row_el in (el for el in sheet.iter() if _tag(el) == "row"):
        row: list = []
        for c in (el for el in row_el if _tag(el) == "c"):
            idx = _col_index(c.get("r"))
            if idx is None:
                idx = len(row)
            while len(row) < idx:
                row.append(None)
            ctype = c.get("t", "n")
            v_el = next((x for x in c if _tag(x) == "v"), None)
            if ctype == "inlineStr":
                val = "".join(t.text or "" for t in c.iter() if _tag(t) == "t")
            elif v_el is None or v_el.text is None:
                val = None
            elif ctype == "s":
                val = sst[int(v_el.text)]
            elif ctype == "str":
                val = v_el.text
            elif ctype == "b":
                val = v_el.text == "1"
            elif ctype == "e":
                val = None
            else:  # numeric; date-styled numerics become datetimes
                if int(c.get("s", "-1")) in date_styles:
                    val = _EXCEL_EPOCH + _dt.timedelta(days=float(v_el.text))
                else:
                    val = _num(v_el.text)
            row.append(val)
        rows.append(row)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def write_xlsx_minimal(path: str, header: list[str], rows: list[list]) -> None:
    """Fixture-grade xlsx writer (inline strings + numbers + booleans, one
    sheet, no styles) — enough to round-trip through any xlsx reader."""

    def cell(v) -> str:
        if v is None:
            return "<c/>"
        if isinstance(v, bool):
            return f"<c t=\"b\"><v>{1 if v else 0}</v></c>"
        if isinstance(v, (int, float)):
            return f"<c><v>{v!r}</v></c>"
        from xml.sax.saxutils import escape

        return f"<c t=\"inlineStr\"><is><t>{escape(str(v))}</t></is></c>"

    all_rows = [header] + rows
    sheet_rows = "".join(
        "<row>" + "".join(cell(v) for v in r) + "</row>" for r in all_rows
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": (
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>{sheet_rows}</sheetData></worksheet>'
        ),
    }
    with _zipfile.ZipFile(path, "w") as zf:
        for name, content in parts.items():
            zf.writestr(name, content)


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

            wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
            ws = wb[sheet_name] if sheet_name else wb.worksheets[0]
            raw = [[c.value for c in row] for row in ws.iter_rows()]
        except ImportError:
            raw = _read_xlsx_stdlib(path, sheet_name)
    else:
        try:
            import xlrd

            book = xlrd.open_workbook(path)
            sh = book.sheet_by_name(sheet_name) if sheet_name else book.sheet_by_index(0)
            raw = [sh.row_values(i) for i in range(sh.nrows)]
        except ImportError:
            from dbimport_spark.sources.xls import read_xls_rows

            raw = read_xls_rows(path, sheet_name)
    if not raw:
        raise ValueError(f"empty sheet in {path}")
    if no_headers:
        header = [f"column_{i + 1}" for i in range(len(raw[0]))]
        body = raw
    else:
        header = [str(h) if h is not None else f"column_{i + 1}" for i, h in enumerate(raw[0])]
        body = raw[1:]
    return rows_to_df(spark, header, body)


# ------------------------------------------------------- stdlib ods parse

_ODS_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_ODS_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"


def _ods_cell_value(cell):
    vtype = cell.get(_ODS_OFFICE + "value-type")
    if vtype == "float" or vtype == "currency" or vtype == "percentage":
        return _num(cell.get(_ODS_OFFICE + "value"))
    if vtype == "boolean":
        return cell.get(_ODS_OFFICE + "boolean-value") == "true"
    if vtype == "date":
        return _dt.datetime.fromisoformat(cell.get(_ODS_OFFICE + "date-value"))
    text = "".join(cell.itertext())
    return text if text != "" else None


def _read_ods_stdlib(path: str, sheet_name: str | None) -> list[list]:
    with _zipfile.ZipFile(path) as zf:
        content = _ET.fromstring(zf.read("content.xml"))
    tables = [el for el in content.iter(_ODS_TABLE + "table")]
    if not tables:
        raise ValueError("ODS document has no tables")
    table = tables[0]
    if sheet_name is not None:
        table = next(
            (t for t in tables if t.get(_ODS_TABLE + "name") == sheet_name), None
        )
        if table is None:
            raise ValueError(f"sheet not found: {sheet_name!r}")
    rows: list[list] = []
    for row_el in table.iter(_ODS_TABLE + "table-row"):
        row: list = []
        for cell in row_el:
            if cell.tag != _ODS_TABLE + "table-cell":
                continue
            repeat = int(cell.get(_ODS_TABLE + "number-columns-repeated", "1"))
            val = _ods_cell_value(cell)
            if val is None and repeat > 1000:
                # trailing filler cells (LibreOffice pads to 16384 cols)
                continue
            row.extend([val] * repeat)
        rows.append(row)
    while rows and all(v is None for v in rows[-1]):
        rows.pop()
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def write_ods_minimal(path: str, header: list[str], rows: list[list]) -> None:
    """Fixture-grade single-sheet ODS writer (strings/floats/booleans)."""
    from xml.sax.saxutils import escape

    def cell(v) -> str:
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            b = "true" if v else "false"
            return (
                f'<table:table-cell office:value-type="boolean" office:boolean-value="{b}">'
                f"<text:p>{b}</text:p></table:table-cell>"
            )
        if isinstance(v, (int, float)):
            return (
                f'<table:table-cell office:value-type="float" office:value="{v!r}">'
                f"<text:p>{v!r}</text:p></table:table-cell>"
            )
        return (
            '<table:table-cell office:value-type="string">'
            f"<text:p>{escape(str(v))}</text:p></table:table-cell>"
        )

    body = "".join(
        "<table:table-row>" + "".join(cell(v) for v in r) + "</table:table-row>"
        for r in [list(header)] + rows
    )
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="Sheet1">{body}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:media-type="application/vnd.oasis.opendocument.spreadsheet" manifest:full-path="/"/>'
        '<manifest:file-entry manifest:media-type="text/xml" manifest:full-path="content.xml"/>'
        "</manifest:manifest>"
    )
    with _zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
        zf.writestr("META-INF/manifest.xml", manifest)


def read_ods(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    no_headers: bool = False,
) -> DataFrame:
    """Same contract as read_excel for OpenDocument spreadsheets
    (OdsDataProvider.java)."""
    raw = _read_ods_stdlib(path, sheet_name)
    if not raw:
        raise ValueError(f"empty sheet in {path}")
    if no_headers:
        header = [f"column_{i + 1}" for i in range(len(raw[0]))]
        body = raw
    else:
        header = [str(h) if h is not None else f"column_{i + 1}" for i, h in enumerate(raw[0])]
        body = raw[1:]
    return rows_to_df(spark, header, body)
