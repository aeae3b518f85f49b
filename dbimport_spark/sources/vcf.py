"""VCF (vCard) source: one row per card, structured ADR exploded into
`address_N_part` dynamic columns, repeated properties numbered.

Reference: dataprovider/VcfDataProvider.java:178-222 (ADR explode
:199-218); golden flattened output DbImportTest_HSQL.java:1660-1683
(FIXTURES.md F6). Quoted-printable and base64 encodings decoded.

Whole-file format, parsed per file in parallel via binaryFile.
"""

from __future__ import annotations

import quopri

from pyspark.sql import DataFrame, SparkSession

ADR_PARTS = ["pobox", "extended", "street", "locality", "region", "postalcode", "country"]

PROP_NAME_MAP = {
    "FN": "formattedname",
    "TEL": "telephonenumber",
    "EMAIL": "email",
    "ORG": "organisation",
    "TITLE": "title",
    "NOTE": "note",
    "URL": "url",
    "BDAY": "birthday",
    "ADR": "address",
}


def _unfold(text: str) -> list[str]:
    """RFC 6350 line unfolding: continuation lines start with space/tab.
    Lines are CRLF/LF-delimited ONLY — str.splitlines() would also split
    on U+0085/U+2028/U+2029 and corrupt values containing them."""
    import re as _re

    lines: list[str] = []
    for raw in _re.split(r"\r\n|\r|\n", text):
        if raw[:1] in (" ", "\t") and lines:
            lines[-1] += raw[1:]
        else:
            lines.append(raw)
    return lines


def _decode_value(value: str, params: dict[str, str]) -> str:
    enc = params.get("ENCODING", "").upper()
    charset = params.get("CHARSET", "utf-8")
    if enc in ("QUOTED-PRINTABLE", "QP"):
        return quopri.decodestring(value.encode("ascii", "replace")).decode(
            charset, "replace"
        )
    if enc in ("B", "BASE64"):
        import base64

        return base64.b64decode(value).decode(charset, "replace")
    return value


def parse_vcf_text(text: str) -> list[dict[str, str]]:
    cards: list[dict[str, str]] = []
    card: dict[str, str] | None = None
    counters: dict[str, int] = {}
    for line in _unfold(text):
        line = line.strip("\r")
        if not line.strip():
            continue
        name_part, _, value = line.partition(":")
        pieces = name_part.split(";")
        prop = pieces[0].upper()
        params: dict[str, str] = {}
        attrs: list[str] = []
        for p in pieces[1:]:
            if "=" in p:
                k, _, v = p.partition("=")
                if k.upper() == "TYPE":
                    attrs.extend(t for t in v.split(",") if t)
                else:
                    params[k.upper()] = v
            else:
                attrs.append(p)
        if prop == "BEGIN" and value.upper() == "VCARD":
            card, counters = {}, {}
            continue
        if prop == "END" and value.upper() == "VCARD":
            if card is not None:
                cards.append(card)
            card = None
            continue
        if card is None or prop in ("VERSION",):
            continue
        value = _decode_value(value, params)
        attr_str = ",".join(a for a in attrs if a.upper() != "PREF")
        if prop == "N":
            # structured name: Last;First;Middle;Prefix;Suffix
            parts = [_decode_value(p, params) for p in value.split(";")]
            for i, col in enumerate(["lastname", "firstname", "middlename", "nameprefix", "namesuffix"]):
                if i < len(parts) and parts[i]:
                    card[col] = parts[i]
        elif prop == "ADR":
            counters["ADR"] = counters.get("ADR", 0) + 1
            n = counters["ADR"]
            # internal separators inside parts become ", "
            # (VcfDataProvider.java:199-218)
            parts = [p.replace("\\,", ", ").replace("\\n", ", ") for p in value.split(";")]
            for i, partname in enumerate(ADR_PARTS):
                if i < len(parts) and parts[i]:
                    card[f"address_{n}_{partname}"] = parts[i]
            if attr_str:
                card[f"address_{n}_attr"] = attr_str
        else:
            base = PROP_NAME_MAP.get(prop, prop.lower())
            if prop in ("TEL", "EMAIL", "URL", "ADR"):
                counters[prop] = counters.get(prop, 0) + 1
                n = counters[prop]
                card[f"{base}_{n}"] = value
                if attr_str:
                    card[f"{base}_{n}_attr"] = attr_str
            else:
                card[base] = value
    return cards


def read_vcf(spark: SparkSession, path: str, with_order: bool = True) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                for i, row in enumerate(parse_vcf_text(r["content"].decode("utf-8", "replace"))):
                    out.append({"__file": r["path"], "__file_pos": i, "__row": row})
            yield pd.DataFrame(out, columns=["__file", "__file_pos", "__row"]) if out else pd.DataFrame(
                {"__file": [], "__file_pos": [], "__row": []}
            )

    parsed = files.mapInPandas(
        parse, "`__file` string, `__file_pos` long, `__row` map<string,string>"
    )
    keys = sorted(
        r["k"]
        for r in parsed.select(F.explode(F.map_keys("__row")).alias("k")).distinct().collect()
    )
    out = parsed.select(
        "__file", "__file_pos", *[F.col("__row").getItem(k).alias(k) for k in keys]
    )
    if with_order:
        from pyspark.sql import Window

        out = out.withColumn(
            "_src_order",
            F.row_number().over(Window.orderBy("__file", "__file_pos")).cast("long") - 1,
        )
    return out.drop("__file", "__file_pos")
