"""JSON source: array-of-objects (multiLine) or object-per-line, optional
dataPath into a nested sub-array, optional JSON-schema validation.

Reference: dataprovider/JsonDataProvider.java:186-322 (dataPath :305-311,
schema validation :286-302). JSON5 inputs are NOT supported (the reference
accepts them; Spark's reader is strict JSON — documented deviation,
gate-able behind a per-file python json5 pre-pass if ever needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.operators.order import with_src_order


def read_json(
    spark: SparkSession,
    path: str,
    data_path: str | None = None,
    multi_line: bool = True,
    json_schema: dict | None = None,
    with_order: bool = True,
) -> DataFrame:
    """data_path is the reference's `-dp`: a path to the array to import,
    e.g. ``payload/items`` selects obj.payload.items[*]."""
    df = spark.read.option("multiLine", multi_line).json(path)
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
