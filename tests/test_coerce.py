"""Coercion kernel semantics (SURVEY.md §2.2; DbImportWorker.java:1113-1607)."""

import datetime

import pytest
from pyspark.sql import functions as F

from dbimport_spark.config import ColumnMapping, parse_mapping_string
from dbimport_spark.operators import coerce


def run(spark, values, build, schema="v string"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    res = build(F.col("v"))
    out = df.select(res.value.alias("value"), res.error.alias("error")).collect()
    return [(r["value"], r["error"]) for r in out]


def test_decimal_us(spark):
    got = run(spark, ["1,234.5", "17", "bad", "", None], lambda c: coerce.coerce_decimal(c, "."))
    assert got[0] == (1234.5, False)
    assert got[1] == (17.0, False)
    assert got[2] == (None, True)      # non-empty unparseable → row error
    assert got[3] == (None, False)     # empty → null, no error
    assert got[4] == (None, False)


def test_decimal_eu(spark):
    got = run(spark, ["1.234,5", "1,23"], lambda c: coerce.coerce_decimal(c, ","))
    assert got[0] == (1234.5, False)
    assert got[1] == (1.23, False)


def test_integer_accepts_bool(spark):
    got = run(spark, ["42", "true", "false", "x"], lambda c: coerce.coerce_integer(c))
    assert [g[0] for g in got[:3]] == [42, 1, 0]
    assert got[3] == (None, True)


def test_integer_decimal_widening(spark):
    """A value containing '.' in an int column parses as double, NOT a row
    error (DbImportWorker.java:1517-1535: setDouble on the int column, the
    DB converts). HSQLDB rounds, so the pinned golden is round-half-up."""
    got = run(
        spark,
        ["1.5", "2.5", "-1.5", "1.25", "1.23e1", "1.x", "."],
        lambda c: coerce.coerce_integer(c, "bigint"),
    )
    assert got[0] == (2, False)
    assert got[1] == (3, False)    # half away from zero, like HSQLDB
    assert got[2] == (-2, False)
    assert got[3] == (1, False)
    assert got[4] == (12, False)   # scientific with '.' → Double.parseDouble
    assert got[5] == (None, True)  # still unparseable → row error
    assert got[6] == (None, True)


def test_email(spark):
    got = run(spark, [" User@Example.COM ", "nope"], coerce.coerce_email)
    assert got[0] == ("user@example.com", False)
    assert got[1] == (None, True)


def test_datetime_pattern_and_cascade(spark):
    got = run(
        spark,
        ["01.02.2003 11:12:13"],
        lambda c: coerce.coerce_datetime(c, pattern="dd.MM.yyyy HH:mm:ss"),
    )
    assert got[0] == (datetime.datetime(2003, 2, 1, 11, 12, 13), False)
    got = run(spark, ["2003-02-01 11:12:13", "01.02.2003 11:12:13", "garbage"],
              lambda c: coerce.coerce_datetime(c))
    assert got[0][0] == datetime.datetime(2003, 2, 1, 11, 12, 13)
    assert got[1][0] == datetime.datetime(2003, 2, 1, 11, 12, 13)
    assert got[2] == (None, True)


def test_timezone_shift_dublin_berlin(spark):
    # golden: 2003-02-01 11:12:13 Dublin → 12:12:13 Berlin
    # (DbImportTest_HSQL.java:1450-1494)
    got = run(
        spark,
        ["01.02.2003 11:12:13"],
        lambda c: coerce.coerce_datetime(
            c, pattern="dd.MM.yyyy HH:mm:ss",
            import_tz="Europe/Dublin", db_tz="Europe/Berlin",
        ),
    )
    assert got[0][0] == datetime.datetime(2003, 2, 1, 12, 12, 13)


def test_date_with_time_under_date_pattern(spark):
    # date value carrying a time must still parse (DbImportTest_HSQL.java:1406-1448)
    got = run(spark, ["01.02.2003 21:22:23", "01.02.2003"],
              lambda c: coerce.coerce_date(c, pattern="dd.MM.yyyy"))
    assert got[0][0] == datetime.date(2003, 2, 1)
    assert got[1][0] == datetime.date(2003, 2, 1)


def test_boolean(spark):
    got = run(spark, ["TRUE", "no", "zzz"], coerce.coerce_boolean)
    assert got[0] == (True, False)
    assert got[1] == (False, False)
    assert got[2] == (None, True)


def test_base64_blob(spark):
    got = run(spark, ["YWJj", "!!!"], coerce.coerce_blob_base64)
    assert got[0] == (bytearray(b"abc"), False)
    assert got[1][1] is True


def test_base64_blob_mime_wrapped(spark):
    """Whitespace-wrapped base64 (MIME 76-char lines) decodes — the length%4
    gate must count only base64 chars, not the newlines."""
    import base64 as b64mod

    payload = bytes(range(90))
    wrapped = b64mod.encodebytes(payload).decode()  # has embedded newlines
    assert "\n" in wrapped.strip()
    got = run(spark, [wrapped], coerce.coerce_blob_base64)
    assert got[0] == (bytearray(payload), False)


def test_apply_mappings_valid_invalid_split(spark):
    # F4 error dataset: bad datatype row in the middle skipped
    # (DbImportTest_HSQL.java:340-424)
    df = spark.createDataFrame(
        [("121", "123.456"), ("122", "123x456"), ("123", "789.012")],
        "column_integer string, column_double string",
    )
    mappings = [
        ColumnMapping("k", "column_integer"),
        ColumnMapping("d", "column_double"),
    ]
    valid, invalid = coerce.apply_mappings(df, mappings, {"k": "int", "d": "double"})
    assert sorted(r["k"] for r in valid.collect()) == [121, 123]
    bad = invalid.collect()
    assert len(bad) == 1 and "d" in bad[0]["error_reason"]


def test_parse_mapping_string():
    ms = (
        "column_integer='column integer'; column_double='column_double';"
        " column_blob=; column_timestamp='column_timestamp'dd.MM.yyyy HH:mm:ss"
    )
    parsed = parse_mapping_string(ms)
    by_target = {m.target: m for m in parsed}
    assert by_target["column_integer"].source == "column integer"
    assert by_target["column_blob"].source is None
    assert by_target["column_timestamp"].format_info == "dd.MM.yyyy HH:mm:ss"


def test_file_format_info_blob(spark, tmp_path):
    """`file` format-info: cell path -> file bytes, gz decompressed,
    missing file -> row error (DbImportWorker.java:1209-1315)."""
    import gzip

    from dbimport_spark.config import ColumnMapping
    from dbimport_spark.operators.coerce import apply_mappings

    plain = tmp_path / "a.bin"
    plain.write_bytes(b"hello-blob")
    gzed = tmp_path / "b.txt.gz"
    with gzip.open(gzed, "wb") as f:
        f.write(b"unzipped-content")

    df = spark.createDataFrame(
        [(1, str(plain)), (2, str(gzed)), (3, str(tmp_path / "missing.bin")), (4, None)],
        "id int, path string",
    )
    valid, invalid = apply_mappings(
        df,
        [ColumnMapping("id", "id"), ColumnMapping("payload", "path", format_info="file")],
        {"id": "int", "payload": "binary"},
    )
    got = {r["id"]: r["payload"] for r in valid.collect()}
    assert bytes(got[1]) == b"hello-blob"
    assert bytes(got[2]) == b"unzipped-content"
    assert got[4] is None
    assert [r["id"] for r in invalid.collect()] == [3]


def test_extract_error_rows(spark, tmp_path):
    from dbimport_spark.operators.errors import extract_error_rows
    from dbimport_spark.sources.csv import CsvSource

    src = tmp_path / "in.csv"
    src.write_text("id;v\n1;ok\n2;bad\n3;ok\n4;bad\n")
    df = CsvSource(separator=";").read(spark, str(src), with_order=True)
    invalid = df.filter(df.v == "bad")
    out = extract_error_rows(spark, str(src), invalid)
    assert out.endswith(".errors")
    assert open(out).read() == "id;v\n2;bad\n4;bad\n"


def test_import_blob(spark, tmp_path):
    from dbimport_spark.operators.blobimport import import_blob

    blob = tmp_path / "logo.png"
    blob.write_bytes(b"\x89PNGfake")
    target = spark.createDataFrame(
        [(1, None), (2, None), (3, b"old")], "id int, doc binary"
    )
    out = import_blob(spark, target, str(blob), "doc", "id % 2 = 1")
    got = {r["id"]: (bytes(r["doc"]) if r["doc"] is not None else None) for r in out.collect()}
    assert got[1] == b"\x89PNGfake" and got[3] == b"\x89PNGfake"
    assert got[2] is None
