"""WARC / WET web-archive queries + URL canonicalization dedup.

The crawl-entry surface of a 100 TB text pipeline: read WARC response
captures and WET extracted-text records (sources/warc.py — member-range
splittable .warc.gz), and canonicalize/dedup URLs — the first operator
any web corpus hits before text dedup.

Fixtures follow the source_queries pattern: a deterministic archive is
exported driver-side from the sf `documents` table at plan-construction
time, then read back DISTRIBUTED through the real reader, so the DuckDB
oracle recomputes the expectation straight from the parquet view.

Reference parity note: transparent compressed-envelope record streaming
mirrors /root/reference/src/main/java/de/soderer/dbimport/dataprovider/
DataProvider.java:166-197; WARC itself and URL canonicalization are
beyond-reference scale-pipeline scope from the builder's brief.
"""

from __future__ import annotations

import datetime as _dt
import os

# module-level: pandas_udf resolves string type hints in module globals,
# and `from __future__ import annotations` makes ALL hints strings
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import load, register
from dbimport_spark.plans.source_queries import _export_dir
from dbimport_spark.sources.warc import (
    conversion_record,
    http_response_body,
    http_response_record,
    read_warc,
    write_warc_shards,
)

_URL_PREFIX = "https://crawl.example.org/doc/"
_EPOCH = _dt.datetime(2026, 1, 1)


def _doc_url(doc_id: int) -> str:
    return f"{_URL_PREFIX}{doc_id}"


def _doc_date(doc_id: int) -> str:
    return (_EPOCH + _dt.timedelta(seconds=int(doc_id))).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _warc_doc_records(row):
    """One HTTP response capture per doc, plus request-record capture
    noise per 3rd doc that the reader-side type filter must skip."""
    url, date = _doc_url(row.doc_id), _doc_date(row.doc_id)
    out = []
    if row.doc_id % 3 == 0:
        out.append(
            (
                {
                    "warc-type": "request",
                    "warc-target-uri": url,
                    "warc-date": date,
                    "content-type": "application/http; msgtype=request",
                },
                b"GET / HTTP/1.1\r\nHost: crawl.example.org\r\n\r\n",
            )
        )
    out.append(http_response_record(url, date, row.text.encode("utf-8")))
    return out


def _wet_doc_records(row):
    return [
        conversion_record(
            _doc_url(row.doc_id), _doc_date(row.doc_id), row.text.encode("utf-8")
        )
    ]


def _source_fingerprint(path: str) -> str:
    """Cheap content key for a parquet file or directory: name, size and
    mtime of every data file — no Spark job, no data read."""
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if not f.startswith(("_", "."))
        )
        return ";".join(
            f"{f}:{os.path.getsize(os.path.join(path, f))}:"
            f"{int(os.path.getmtime(os.path.join(path, f)))}"
            for f in parts
        )
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}"


def _builder_fingerprint(fn) -> str:
    """Key the memo on the record builder's COMPILED code (bytecode +
    consts + nested code objects via marshal), so editing a page
    template or record layout invalidates the cached shards without any
    manual version bump."""
    import hashlib
    import marshal

    return hashlib.sha1(marshal.dumps(fn.__code__)).hexdigest()


def _memoized_warc_export(
    spark: SparkSession, sf_dir: str, subdir: str, record_fn
) -> list[str]:
    """Content-keyed memoization of the WARC fixture export (r6 verdict:
    the unconditional delete-and-rewrite charged every plan construction
    a full fixture-write job AND raced concurrent sessions sweeping each
    other's shards). Skip the write when the recorded key — source
    parquet fingerprint + record-builder bytecode + shard count — still
    matches and every shard + sidecar index exists; only a genuinely
    changed corpus or builder rebuilds."""
    import json as _json

    out = os.path.join(_export_dir(sf_dir), subdir)
    memo = os.path.join(out, "_memo.json")
    key = {
        "src": _source_fingerprint(f"{sf_dir}/documents.parquet"),
        "builder": _builder_fingerprint(record_fn),
        "shards": 8,
    }
    try:
        with open(memo, "r", encoding="utf-8") as fh:
            m = _json.load(fh)
        if m.get("key") == key and m.get("paths") and all(
            os.path.exists(p) and os.path.exists(p + ".idx")
            for p in m["paths"]
        ):
            return m["paths"]
    except (OSError, ValueError):
        pass
    paths = write_warc_shards(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        out,
        record_fn,
        num_shards=8,
        key_col="doc_id",
    )
    tmp = memo + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        _json.dump({"key": key, "paths": paths}, fh)
    os.replace(tmp, memo)
    return paths


def _export_warc(spark: SparkSession, sf_dir: str) -> list[str]:
    """documents → crawl_warc/part-*.warc.gz via the DISTRIBUTED shard
    writer (one task per shard, one gzip member per record + sidecar
    .idx) — the CommonCrawl crawl-directory layout; no driver data
    path. Memoized on source + builder fingerprints."""
    return _memoized_warc_export(spark, sf_dir, "crawl_warc", _warc_doc_records)


def _export_wet(spark: SparkSession, sf_dir: str) -> list[str]:
    """documents → crawl_wet/part-*.warc.gz: WET conversion records
    (extracted text), distributed shard write. Memoized."""
    return _memoized_warc_export(spark, sf_dir, "crawl_wet", _wet_doc_records)


@register(
    "src_warc_documents",
    f"""SELECT doc_id,
       '{_URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS ts,
       text
FROM documents""",
)
def src_warc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC response-record import: member-range-split read of the
    .warc.gz (sidecar-index partitioning, 4 MB target ranges so even the
    fixture fans out), server-side record-type filter (request records
    never materialize), HTTP envelope stripped in the same Arrow pass.
    At 100 TB this is one task per ~64 MB member range of each shard —
    pure map work, no shuffle anywhere in the plan."""
    paths = _export_warc(spark, sf_dir)
    raw = read_warc(
        spark, paths, record_types=("response",), target_bytes=1 << 20
    )

    @F.pandas_udf("string")
    def http_body(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: http_response_body(bytes(b))[2].decode("utf-8")
        )

    return raw.select(
        F.regexp_extract("url", r"doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
        F.col("url"),
        F.to_timestamp(
            F.regexp_replace("warc_date", "Z$", ""), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("ts"),
        http_body("payload").alias("text"),
    )


@register(
    "src_warc_wet_text",
    f"""SELECT '{_URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url,
       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE length(text) > 0""",
)
def src_warc_wet_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET conversion-record import + token/char counting — the first
    text-analysis pass of a crawl pipeline, fused into the scan (payload
    → counts inside the projection; the full text never shuffles)."""
    paths = _export_wet(spark, sf_dir)
    raw = read_warc(
        spark, paths, record_types=("conversion",), target_bytes=1 << 20
    )
    txt = F.col("payload").cast("string")
    return (
        raw.select(
            "url",
            F.size(F.split(txt, " ")).cast("bigint").alias("n_tokens"),
            F.length(txt).cast("bigint").alias("n_chars"),
        )
        .filter(F.col("n_chars") > 0)
    )


# ------------------------------------------------------- HTML main content


def _warc_html_records(row):
    """One HTTP response capture per doc whose payload is a full HTML
    page: head noise (style rules, a script whose string literal holds
    fake ``<p>`` tags), chrome (banner header, a nav with
    ``2 + doc_id % 7`` links, an aside ad, a footer link), an HTML
    comment, and a <main> whose first paragraph carries literal
    entities and whose second is the escaped document text with the
    first word wrapped in an inline link. Everything the extractor must
    drop or decode is deterministic in doc_id, so the DuckDB oracle can
    recompute the clean text straight from the parquet view."""
    import html as _h

    url, date = _doc_url(row.doc_id), _doc_date(row.doc_id)
    nav = " ".join(
        f'<a href="/cat/{j}">cat {j} news</a>'
        for j in range(2 + row.doc_id % 7)
    )
    if row.text:
        first, _, rest = _h.escape(row.text).partition(" ")
        body_para = f'<p><a href="/rel/{row.doc_id}">{first}</a>'
        if rest:
            body_para += f" {rest}"
        body_para += "</p>"
    else:
        body_para = "<p></p>"
    page = (
        "<!DOCTYPE html><html><head>"
        f"<title>Doc {row.doc_id}</title>"
        "<style>main p { margin: 0; }</style>"
        "<script>var tmpl = '<p>not real text</p>'; if (1 < 2) {}</script>"
        "</head><body>"
        f"<header><h1>Example Crawl</h1><nav>{nav}</nav></header>"
        "<!-- boilerplate comment: do not extract -->"
        "<main>"
        f"<p>Q&amp;A &lt;notes&gt; #{row.doc_id}</p>"
        f"{body_para}"
        "</main>"
        "<aside>Sponsored: buy things &amp; stuff</aside>"
        '<footer>&copy; 2026 <a href="/about">about</a></footer>'
        "</body></html>"
    )
    return [http_response_record(url, date, page.encode("utf-8"))]


def _export_warc_html(spark: SparkSession, sf_dir: str) -> list[str]:
    return _memoized_warc_export(
        spark, sf_dir, "crawl_html", _warc_html_records
    )


@register(
    "src_warc_html_extract",
    """SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'Q&A <notes> #' || CAST(doc_id AS VARCHAR)
         || CASE WHEN length(text) > 0
                 THEN chr(10) || trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))
                 ELSE '' END AS main_text,
       CAST(3 + doc_id % 7
            + CASE WHEN length(text) > 0 THEN 1 ELSE 0 END AS INT) AS n_links
FROM documents""",
)
def src_warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → clean-text main-content extraction over raw WARC response
    captures — the missing middle of the crawl chain (r6 verdict #2):
    WARC scan → THIS → quality/dedup. Strips script/style/head, drops
    nav/header/footer/aside chrome, decodes entities, collapses
    whitespace, keeps block structure as newlines, and counts outlinks
    (functions/htmltext.py, stdlib html.parser in one Arrow-batched
    kernel). At 100 TB: the extraction rides the same member-range-split
    scan tasks as the payload read — map-only, no shuffle, full text
    never moves twice."""
    paths = _export_warc_html(spark, sf_dir)
    raw = read_warc(
        spark, paths, record_types=("response",), target_bytes=1 << 20
    )
    from dbimport_spark.functions.htmltext import html_extract_udf

    @F.pandas_udf("string")
    def http_body(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: http_response_body(bytes(b))[2].decode("utf-8")
        )

    ext = raw.select(
        F.regexp_extract("url", r"doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
        html_extract_udf()(http_body("payload")).alias("x"),
    )
    return ext.select(
        "doc_id",
        F.col("x.title").alias("title"),
        F.col("x.main_text").alias("main_text"),
        F.col("x.n_links").alias("n_links"),
    )


# ------------------------------------------------------------ canonical URLs


def canonical_url(col):
    """URL canonicalization as a pure JVM-side expression tree (no UDF):
    strip fragment, lowercase scheme+host, drop leading ``www.``, drop
    scheme-default ports (:80 http / :443 https), collapse duplicate
    path slashes, strip the trailing slash (non-root), and remove
    ``utm_*`` tracking params while preserving the order of the rest.
    Deterministic string algebra — identical semantics are mirrored in
    DuckDB SQL by the oracle below."""
    u = F.regexp_replace(col, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*(.*)$", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, "/$", "")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    query = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


# DuckDB mirror of canonical_url — the 'g' flag is load-bearing where
# Spark's regexp_replace is global by default (slash collapsing).
_CANON_SQL = """array_to_string(
  [lower(regexp_extract(u1, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)), '://',
   CASE lower(regexp_extract(u1, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1))
     WHEN 'http' THEN regexp_replace(
       regexp_replace(lower(regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?]*)', 1)), '^www\\.', ''),
       ':80$', '')
     WHEN 'https' THEN regexp_replace(
       regexp_replace(lower(regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?]*)', 1)), '^www\\.', ''),
       ':443$', '')
     ELSE regexp_replace(lower(regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?]*)', 1)), '^www\\.', '')
   END,
   CASE WHEN p2 <> '/' THEN regexp_replace(p2, '/$', '') ELSE p2 END,
   CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END], '')"""


@register(
    "curation_url_canonicalize",
    f"""WITH variants AS (
  SELECT doc_id,
         'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.ORG:443//Docs//'
           || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
           || '#sec' AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://example' || CAST(doc_id % 7 AS VARCHAR) || '.org/Docs/'
           || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR)
           || '&utm_campaign=x' AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://example' || CAST(doc_id % 7 AS VARCHAR) || '.org/Docs/'
           || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'http://example' || CAST(doc_id % 7 AS VARCHAR) || '.org:80/Docs/'
           || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id % 5 = 0
),
canon AS (
  SELECT doc_id, url,
         regexp_replace(url, '#.*', '') AS u1,
         regexp_replace(regexp_extract(regexp_replace(url, '#.*', ''),
             '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?]*([^?]*)', 1), '/{{2,}}', '/', 'g') AS p0,
         regexp_extract(regexp_replace(url, '#.*', ''),
             '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?]*[^?]*\\?(.*)$', 1) AS q0
  FROM variants
),
canon2 AS (
  SELECT doc_id, url, u1,
         CASE WHEN p0 = '' THEN '/' ELSE p0 END AS p2,
         array_to_string(list_filter(string_split(q0, '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_')), '&') AS q2
  FROM canon
)
SELECT {_CANON_SQL} AS canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       min(doc_id) AS keeper_doc_id
FROM canon2
GROUP BY canonical_url""",
)
def curation_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL dedup through canonicalization — the crawl pipeline's
    first dedup pass. Messy variants (case, www, default ports, doubled
    slashes, trailing slash, fragments, utm tracking params) are
    generated per doc, canonicalized by a pure expression tree
    (whole-stage-codegen, no UDF, no Python), and hash-aggregated on the
    canonical form. At 100 TB: generation is a projection; the only
    shuffle is the final groupBy on canonical_url — exactly the exact-
    dedup shape, with AQE handling any hot-domain skew."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 7).cast("string")
    i = F.col("doc_id").cast("string")
    v1 = F.concat(
        F.lit("HTTPS://WWW.Example"), k, F.lit(".ORG:443//Docs//"), i,
        F.lit("/?utm_source=feed&id="), i, F.lit("#sec"),
    )
    v2 = F.concat(
        F.lit("https://example"), k, F.lit(".org/Docs/"), i,
        F.lit("?id="), i, F.lit("&utm_campaign=x"),
    )
    v3 = F.concat(
        F.lit("https://example"), k, F.lit(".org/Docs/"), i, F.lit("?id="), i
    )
    v4 = F.concat(
        F.lit("http://example"), k, F.lit(".org:80/Docs/"), i, F.lit("?id="), i
    )
    variants = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("doc_id") % 5 == 0, F.array(v1, v2, v3, v4)
            ).otherwise(F.array(v1, v2, v3))
        ).alias("url"),
    )
    return (
        variants.select("doc_id", "url", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.countDistinct("url").cast("bigint").alias("n_distinct_raw"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )
