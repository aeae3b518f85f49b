"""Coercion-kernel queries (SURVEY.md §2.2/§2.3) with DuckDB oracles.

Each query synthesizes string-typed inputs from the parquet tables (cast →
string), runs the coercion kernel, and returns the typed result. Each side
builds and parses ITS OWN string rendering, so engine-specific float
formatting cancels out — the final typed values must round-trip to the
identical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.config import ColumnMapping
from dbimport_spark.operators import coerce
from dbimport_spark.plans.registry import load, load_events, register


@register(
    "coerce_decimal_eu",
    """WITH eu AS (
  SELECT c_custkey, replace(CAST(c_acctbal AS VARCHAR), '.', ',') AS s FROM customer
)
SELECT c_custkey,
       TRY_CAST(replace(replace(s, '.', ''), ',', '.') AS DOUBLE) AS acct_parsed
FROM eu""",
)
def coerce_decimal_eu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EU decimal coercion ','  (DbImportWorker.java:1177-1208): value
    rendered with a decimal comma, parsed back to the identical double."""
    c = load(spark, sf_dir, "customer")
    eu_string = F.regexp_replace(F.col("c_acctbal").cast("string"), r"\.", ",")
    res = coerce.coerce_decimal(eu_string, ",", "double")
    return c.select(F.col("c_custkey"), res.value.alias("acct_parsed"))


@register(
    "coerce_int_bool",
    """SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN CAST(1 AS BIGINT)
            WHEN o_orderkey % 5 = 1 THEN CAST(0 AS BIGINT)
            WHEN o_orderkey % 5 = 2
                 THEN CAST(round(TRY_CAST(CAST(o_orderkey AS VARCHAR) || '.5' AS DOUBLE)) AS BIGINT)
            WHEN o_orderkey % 5 = 3
                 THEN CAST(round(TRY_CAST(CAST(o_orderkey AS VARCHAR) || '.25' AS DOUBLE)) AS BIGINT)
            ELSE TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) END AS parsed
FROM orders""",
)
def coerce_int_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer coercion accepting true/false → 1/0
    (DbImportWorker.java:1511-1516) and decimal-widening: a value containing
    '.' in an int/bigint column parses as double and is written (the DB
    rounds), NOT flagged as an error (DbImportWorker.java:1517-1535)."""
    o = load(spark, sf_dir, "orders")
    key_s = F.col("o_orderkey").cast("string")
    raw = (
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("true"))
        .when(F.col("o_orderkey") % 5 == 1, F.lit("false"))
        .when(F.col("o_orderkey") % 5 == 2, F.concat(key_s, F.lit(".5")))
        .when(F.col("o_orderkey") % 5 == 3, F.concat(key_s, F.lit(".25")))
        .otherwise(key_s)
    )
    res = coerce.coerce_integer(raw, "bigint")
    return o.select(F.col("o_orderkey"), res.value.alias("parsed"))


@register(
    "coerce_date_pattern",
    """SELECT event_id,
       strptime(strftime(ts, '%d.%m.%Y %H:%M:%S'), '%d.%m.%Y %H:%M:%S') AS ts_parsed
FROM events""",
)
def coerce_date_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit date-pattern parse (strict Java pattern,
    DbImportWorker.java:1343-1371): dd.MM.yyyy HH:mm:ss round-trip."""
    e = load_events(spark, sf_dir)
    raw = F.date_format(F.col("ts"), "dd.MM.yyyy HH:mm:ss")
    res = coerce.coerce_datetime(raw, pattern="dd.MM.yyyy HH:mm:ss")
    return e.select(F.col("event_id"), res.value.alias("ts_parsed"))


@register(
    "coerce_tz_shift",
    """SELECT event_id,
       timezone('Europe/Berlin', timezone('Europe/Dublin', ts)) AS ts_shifted
FROM events""",
)
def coerce_tz_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import-tz → db-tz wall-clock shift (DbImportWorker.java:1346-1348,
    :1574-1583; golden Dublin→Berlin DbImportTest_HSQL.java:1450-1494)."""
    e = load_events(spark, sf_dir)
    shifted = F.from_utc_timestamp(F.to_utc_timestamp(F.col("ts"), "Europe/Dublin"), "Europe/Berlin")
    return e.select(F.col("event_id"), shifted.alias("ts_shifted"))


@register(
    "coerce_email",
    """SELECT c_custkey,
       CASE WHEN regexp_matches(lower(trim(n)), '^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$')
            THEN lower(trim(n)) END AS email
FROM (SELECT c_custkey,
             CASE WHEN c_custkey % 4 = 0 THEN 'not-an-email'
                  ELSE ' User' || CAST(c_custkey AS VARCHAR) || '@Example.COM ' END AS n
      FROM customer)""",
)
def coerce_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """email format-info: lowercase+trim+validate, invalid → null value
    (row would be routed to the invalid side-output;
    DbImportWorker.java:1332-1342)."""
    c = load(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 4 == 0, F.lit("not-an-email")).otherwise(
        F.concat(F.lit(" User"), F.col("c_custkey").cast("string"), F.lit("@Example.COM "))
    )
    res = coerce.coerce_email(raw)
    return c.select(F.col("c_custkey"), res.value.alias("email"))


INVALID_RAW_SQL = """raws AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'N/A' ELSE CAST(c_acctbal AS VARCHAR) END AS raw
  FROM customer
)"""


@register(
    "coerce_invalid_rows",
    f"""WITH {INVALID_RAW_SQL}
SELECT c_custkey, 'invalid value for acct' AS error_reason
FROM raws
WHERE TRY_CAST(raw AS DOUBLE) IS NULL AND trim(raw) <> ''""",
)
def coerce_invalid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-row routing: coercion failure marks the row invalid and
    skips it, import continues (DbImportWorker.java:1003-1019; golden
    DbImportTest_HSQL.java:340-424). Returns the invalid side-output."""
    c = load(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 7 == 0, F.lit("N/A")).otherwise(
        F.col("c_acctbal").cast("string")
    )
    df = c.select("c_custkey", raw.alias("raw"))
    _, invalid = coerce.apply_mappings(
        df, [ColumnMapping("acct", "raw")], {"acct": "double"}, keep_cols=["c_custkey"]
    )
    return invalid.select("c_custkey", "error_reason")


@register(
    "coerce_valid_rows",
    f"""WITH {INVALID_RAW_SQL}
SELECT c_custkey, TRY_CAST(raw AS DOUBLE) AS acct
FROM raws
WHERE TRY_CAST(raw AS DOUBLE) IS NOT NULL OR trim(raw) = ''""",
)
def coerce_valid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid branch of the same split — rows that land in the target."""
    c = load(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 7 == 0, F.lit("N/A")).otherwise(
        F.col("c_acctbal").cast("string")
    )
    df = c.select("c_custkey", raw.alias("raw"))
    valid, _ = coerce.apply_mappings(
        df, [ColumnMapping("acct", "raw")], {"acct": "double"}, keep_cols=["c_custkey"]
    )
    return valid.select("c_custkey", "acct")


@register(
    "coerce_case_base64",
    """SELECT c_custkey, lower(c_name) AS name_lc, upper(c_mktsegment) AS seg_uc,
       upper(hex(encode(c_name))) AS name_blob_hex
FROM customer WHERE c_custkey <= 300""",
)
def coerce_case_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lc / uc case format-infos (DbImportWorker.java:1316-1331) and the
    base64→blob decode (:1484-1487), driven through the coercion kernel's
    own column builders.

    The decoded blob is projected as HEX in the graded result (the driver's
    canonicalizer cannot sort raw binary values); coerce_blob_base64 itself
    still produces BinaryType."""
    from dbimport_spark.operators.coerce import coerce_blob_base64, coerce_case

    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    # MIME-wrap at 60 chars to exercise the whitespace-tolerant decode path.
    b64 = F.regexp_replace(
        F.base64(F.encode(F.col("c_name"), "UTF-8")), "(.{60})", "$1\n"
    )
    return c.select(
        "c_custkey",
        coerce_case(F.col("c_name"), "lc").value.alias("name_lc"),
        coerce_case(F.col("c_mktsegment"), "uc").value.alias("seg_uc"),
        F.upper(F.hex(coerce_blob_base64(b64).value)).alias("name_blob_hex"),
    )
