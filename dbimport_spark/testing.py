"""Golden-readout canonicalization for string-equality testing.

Reference: TestDbUtilities.readoutTable
(src/test/java/de/soderer/dbimport/TestDbUtilities.java:53-77) — every
golden assertion in the reference's vendor suites compares against this
canonical CSV form: `;`-separated with `"` quoting, header = column names
sorted alphabetically with key columns FIRST, rows ordered by the key
columns, blobs as base64, timestamps `yyyy-MM-dd HH:mm:ss[.ffffff]`.
"""

from __future__ import annotations

import base64
import datetime as _dt

from pyspark.sql import DataFrame


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, _dt.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}"
        return s
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _cell(v) -> str:
    s = _fmt(v)
    if ";" in s or '"' in s or "\n" in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def readout_table(df: DataFrame, key_columns: list[str] | None = None) -> str:
    """Canonical string form of a DataFrame, for golden-string equality:
    key columns first then remaining columns alphabetically; rows sorted
    by the key columns (then by all columns, for full determinism)."""
    keys = [k for k in (key_columns or []) if k in df.columns]
    rest = sorted(c for c in df.columns if c not in keys)
    cols = keys + rest
    rows = df.select(*cols).collect()

    def sort_key(r):
        # ORDER BY key columns on raw values (nulls last), then the
        # formatted row for full determinism
        return (
            [(v is None, v) for v in (r[k] for k in keys)],
            tuple(_fmt(r[c]) for c in cols),
        )

    body = [tuple(_fmt(r[c]) for c in cols) for r in sorted(rows, key=sort_key)]
    lines = [";".join(_cell(c) for c in cols)]
    lines += [";".join(_cell(v) for v in row) for row in body]
    return "\n".join(lines) + "\n"


# ------------------------------------------------------- oracle differ


def canon_rows(rows: list[dict], cols: list[str]) -> list[str]:
    """Order-insensitive canonical form shared with tools/check_oracle:
    floats via repr (NaN pinned), bytes as hex, everything else str."""
    import math

    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            elif isinstance(v, (bytes, bytearray)):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def assert_matches_oracle(spark, duck_con, fn, oracle_sql: str, sf_dir: str, name: str = "?"):
    """Run one queries()-style callable and its DuckDB oracle over the
    same data and assert row count + sorted schema + canonical values —
    the driver's gate, reusable against ANY corpus directory."""
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    spark.catalog.clearCache()
    rel = duck_con.execute(oracle_sql)
    ocols_full = [d[0] for d in rel.description]
    orows = [dict(zip(ocols_full, row)) for row in rel.fetchall()]
    assert scols == sorted(ocols_full), f"{name}: cols {scols} != {sorted(ocols_full)}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} != {len(orows)}"
    sc = canon_rows(srows, scols)
    oc = canon_rows(orows, scols)
    if sc != oc:
        diff = [(a, b) for a, b in zip(sc, oc) if a != b]
        raise AssertionError(f"{name}: {len(diff)}/{len(sc)} values differ, e.g. {diff[:2]}")
