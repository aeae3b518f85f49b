"""JSON source: array-of-objects (multiLine) or object-per-line, optional
dataPath into a nested sub-array, optional JSON-schema validation.

Reference: dataprovider/JsonDataProvider.java:186-322 (dataPath :305-311,
schema validation :286-302). JSON5 inputs (the reference reads all JSON
through a JSON5-tolerant reader) are accepted via a driver-side pre-pass
(sources/json5.py) gated on a strict-parse probe, so well-formed JSON
keeps the splittable JVM-side scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.operators.order import with_src_order


def _resolve_json5(spark: SparkSession, path: str, accept_json5: bool) -> str:
    """Probe each matched file; if any needs the JSON5 pre-pass, convert
    driver-side into a temp dir and return that dir as the read path."""
    if not accept_json5:
        return path
    import glob as _glob
    import os as _os
    import tempfile as _tempfile

    from dbimport_spark.sources.json5 import maybe_convert_file

    files = sorted(_glob.glob(path)) or [path]
    converted = {f: maybe_convert_file(f) for f in files}
    if not any(v is not None for v in converted.values()):
        return path
    tmpdir = _tempfile.mkdtemp(prefix="dbimport_json5_")
    for f, text in converted.items():
        out = _os.path.join(tmpdir, _os.path.basename(f))
        if text is None:
            with open(f, encoding="utf-8") as fh:
                text = fh.read()
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(text)
    return tmpdir


def read_json(
    spark: SparkSession,
    path: str,
    data_path: str | None = None,
    multi_line: bool = True,
    json_schema: dict | None = None,
    with_order: bool = True,
    accept_json5: bool = True,
) -> DataFrame:
    """data_path is the reference's `-dp`: a path to the array to import,
    e.g. ``payload/items`` selects obj.payload.items[*]."""
    df = spark.read.option("multiLine", multi_line).json(
        _resolve_json5(spark, path, accept_json5)
    )
    if data_path:
        dotted = data_path.strip("/").replace("/", ".")
        df = df.select(F.explode(F.col(dotted)).alias("__row")).select("__row.*")
    if json_schema is not None:
        _validate_json_schema(spark, path, json_schema)
    if with_order:
        df = with_src_order(df)
    return df


def _validate_json_schema(spark: SparkSession, path: str, schema: dict) -> None:
    """Pre-pass JSON-schema validation (reference validates the whole
    document before import; a violation aborts). Driver-side full-document
    check — schema-validated imports are configuration-sized in practice."""
    try:
        import jsonschema
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("jsonschema not installed") from e
    import glob as _glob
    import json as _json

    for f in sorted(_glob.glob(path)):
        with open(f, encoding="utf-8") as fh:
            jsonschema.validate(_json.load(fh), schema)
