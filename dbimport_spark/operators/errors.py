"""Erroneous-row extraction: invalid rows re-extracted from the source
file into a sibling `.errors` file in the ORIGINAL format and the
ORIGINAL compression envelope.

Reference: DataProvider.filterDataItems per provider, triggered at
DbImportWorker.java:591-593. Each provider re-reads its source, re-writes
the erred items in its own serialization, and re-wraps the source's
compression — CsvDataProvider.java:227-284 emits
``<src>.<suffix>.csv[.zip|.gz|.tar.gz|.tgz]`` with the header row and the
original separator/quote/escape; JsonDataProvider/XmlDataProvider emit
JSON arrays / XML documents the same way. :func:`filter_data_items` is
the full-fidelity port of that contract; :func:`extract_error_rows` is
the older raw-text-line form, kept for plain uncompressed line-oriented
sources.

Scale note: error sets are small by contract (the reference truncates its
error report at 10 items), so the re-serialization is driver-side —
exactly like the reference, whose providers are single-file formats.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile
import zipfile

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


# ---------------------------------------------------- format-faithful form

_ENVELOPES = (".tar.gz", ".tgz", ".zip", ".gz")


def _split_envelope(path: str) -> tuple[str, str]:
    """path → (inner path without envelope extension, envelope ext or '')."""
    lower = path.lower()
    for ext in _ENVELOPES:
        if lower.endswith(ext):
            return path[: -len(ext)], ext
    return path, ""


def _csv_parse(text: str, sep: str, quote: str, escape: str | None):
    import csv as _csv

    rdr = _csv.reader(
        io.StringIO(text),
        delimiter=sep,
        quotechar=quote,
        doublequote=escape is None,
        escapechar=escape,
    )
    return [row for row in rdr if row]


def _csv_field(
    v: str | None, sep: str, quote: str, escape: str | None,
    null_value: str = "",
) -> str:
    if v is None:
        # the reference's null sentinel round-trips: a None field is
        # re-emitted as the configured sentinel text
        v = null_value
    needs_quote = (
        sep in v or quote in v or "\n" in v or "\r" in v
        or (escape is not None and escape in v)
    )
    if not needs_quote:
        return v
    if escape is not None:
        # escape the escape char itself first, then the quote char, so
        # values containing a bare escape character round-trip
        body = v.replace(escape, escape + escape).replace(quote, escape + quote)
    else:
        body = v.replace(quote, quote + quote)
    return quote + body + quote


def _csv_serialize(
    rows, sep: str, quote: str, escape: str | None, null_value: str = ""
) -> str:
    return "".join(
        sep.join(_csv_field(v, sep, quote, escape, null_value) for v in row) + "\n"
        for row in rows
    )


def filter_data_items(
    source_path: str,
    item_indexes,
    suffix: str = "errors",
    fmt: str | None = None,
    separator: str = ";",
    quote: str = '"',
    escape: str | None = None,
    has_header: bool = True,
    data_path: str | None = None,
    null_value: str = "",
    zip_password: str | None = None,
) -> str:
    """Re-extract the items at 1-based data indexes ``item_indexes`` from
    ``source_path`` into a sibling file in the ORIGINAL format and
    compression envelope; returns the new file's path.

    Naming follows the reference exactly (CsvDataProvider.java:234-253):
    ``data.csv.zip`` → ``data.csv.zip.errors.csv.zip`` (inner entry
    re-zipped), ``data.csv.gz`` → ``data.csv.gz.errors.csv.gz``,
    ``data.csv`` → ``data.csv.errors.csv``; CSV output repeats the header
    row and the original separator/quote/escape. XML/JSON sources write
    format-faithful documents (the items as an XML entry list / a JSON
    array) instead of raw text lines."""
    from dbimport_spark.sources.compression import decompress_if_needed, detect_format

    fmt = fmt or detect_format(source_path)
    _inner, env = _split_envelope(source_path)
    plain = decompress_if_needed(
        source_path, password=zip_password, for_spark_text_reader=False
    )
    wanted = {int(i) for i in item_indexes}

    if fmt == "csv":
        with open(plain, encoding="utf-8", newline="") as fh:
            rows = _csv_parse(fh.read(), separator, quote, escape)
        header = rows[0] if has_header and rows else None
        data_rows = rows[1:] if has_header else rows
        picked = [r for i, r in enumerate(data_rows, start=1) if i in wanted]
        out_rows = ([header] if header is not None else []) + picked
        payload = _csv_serialize(
            out_rows, separator, quote, escape, null_value
        ).encode("utf-8")
        ext = "csv"
    elif fmt == "json":
        import json as _json

        with open(plain, encoding="utf-8") as fh:
            doc = _json.load(fh)
        items = doc
        if data_path:
            for part in data_path.strip("/").split("/"):
                items = items[part]
        picked = [it for i, it in enumerate(items, start=1) if i in wanted]
        payload = _json.dumps(picked, indent=1).encode("utf-8")
        ext = "json"
    elif fmt == "xml":
        import xml.etree.ElementTree as ET

        tree = ET.parse(plain)
        list_el = tree.getroot()
        if data_path:
            for part in data_path.strip("/").split("/"):
                if list_el.tag == part:
                    continue
                nxt = list_el.find(part)
                if nxt is None:
                    raise ValueError(f"dataPath element not found: {part}")
                list_el = nxt
        out_root = ET.Element(list_el.tag)
        for i, entry in enumerate(list_el, start=1):
            if i in wanted:
                out_root.append(entry)
        payload = ET.tostring(out_root, encoding="utf-8", xml_declaration=True)
        ext = "xml"
    elif fmt == "excel":
        import tempfile

        from dbimport_spark.sources.excel import (
            _read_xlsx_stdlib,
            sniff_excel_kind,
            write_xlsx_minimal,
        )
        from dbimport_spark.sources.xls import read_xls_rows, write_xls_minimal

        kind = sniff_excel_kind(plain)
        rows = (
            read_xls_rows(plain) if kind == "xls" else _read_xlsx_stdlib(plain, None)
        )
        header = [str(c) for c in rows[0]] if has_header and rows else []
        data_rows = rows[1:] if has_header else rows
        picked = [r for i, r in enumerate(data_rows, start=1) if i in wanted]
        ext = kind  # xlsx or xls
        writer = write_xls_minimal if kind == "xls" else write_xlsx_minimal
        with tempfile.NamedTemporaryFile(suffix="." + ext, delete=False) as tmp:
            tmp_path = tmp.name
        try:
            writer(tmp_path, header, picked)
            with open(tmp_path, "rb") as fh:
                payload = fh.read()
        finally:
            os.unlink(tmp_path)
    elif fmt == "ods":
        import tempfile

        from dbimport_spark.sources.excel import _read_ods_stdlib, write_ods_minimal

        rows = _read_ods_stdlib(plain, None)
        header = [str(c) for c in rows[0]] if has_header and rows else []
        data_rows = rows[1:] if has_header else rows
        picked = [r for i, r in enumerate(data_rows, start=1) if i in wanted]
        ext = "ods"
        with tempfile.NamedTemporaryFile(suffix=".ods", delete=False) as tmp:
            tmp_path = tmp.name
        try:
            write_ods_minimal(tmp_path, header, picked)
            with open(tmp_path, "rb") as fh:
                payload = fh.read()
        finally:
            os.unlink(tmp_path)
    elif fmt == "vcf":
        # re-emit the original vCard blocks byte-faithfully: split on
        # BEGIN:VCARD … END:VCARD and keep the wanted 1-based card indexes
        with open(plain, encoding="utf-8", newline="") as fh:
            text = fh.read()
        cards, cur, in_card = [], [], False
        for line in text.splitlines(keepends=True):
            if line.strip().upper() == "BEGIN:VCARD":
                in_card, cur = True, [line]
            elif line.strip().upper() == "END:VCARD" and in_card:
                cur.append(line)
                cards.append("".join(cur))
                in_card = False
            elif in_card:
                cur.append(line)
        picked = [c for i, c in enumerate(cards, start=1) if i in wanted]
        payload = "".join(picked).encode("utf-8")
        ext = "vcf"
    else:
        raise ValueError(f"filter_data_items: unsupported format {fmt!r}")

    out_base = f"{source_path}.{suffix}.{ext}"
    if env == ".gz":
        out_path = out_base + ".gz"
        with gzip.open(out_path, "wb") as fh:
            fh.write(payload)
    elif env == ".zip":
        out_path = out_base + ".zip"
        inner_name = os.path.basename(out_base)
        with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(inner_name, payload)
    elif env in (".tar.gz", ".tgz"):
        out_path = out_base + env
        inner_name = os.path.basename(source_path) + "." + suffix
        with tarfile.open(out_path, "w:gz") as tf:
            info = tarfile.TarInfo(inner_name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    else:
        out_path = out_base
        with open(out_path, "wb") as fh:
            fh.write(payload)
    return out_path
