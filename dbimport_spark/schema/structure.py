"""Structure-file schema: explicit JSON document driving CREATE TABLE /
ALTER TABLE ADD COLUMNS.

Reference: `-structure` JSON
``{table: {columns: [{name, datatype, datasize, defaultvalue}], keycolumns: []}}``
(DbImportWorker.java:760-877 creation incl. PK clause + VARCHAR size
fallback 4000; DbStructureWorker.java:42-199 sync of missing tables AND
missing columns, ALTER TABLE ADD at :156-169).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_TYPE_MAP = {
    "varchar": T.StringType(),
    "string": T.StringType(),
    "clob": T.StringType(),
    "blob": T.BinaryType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "biginteger": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "datetime": T.TimestampType(),
}


def structure_to_spark_schema(table_structure: dict) -> tuple[T.StructType, list[str]]:
    """One table's structure dict → (StructType, key_columns)."""
    fields = []
    for col in table_structure.get("columns", []):
        dt = col["datatype"].lower().split("(")[0]
        if dt not in _TYPE_MAP:
            raise ValueError(f"unknown datatype in structure file: {col['datatype']}")
        fields.append(T.StructField(col["name"].lower(), _TYPE_MAP[dt], True))
    return T.StructType(fields), [k.lower() for k in table_structure.get("keycolumns", [])]


def sync_structure(spark: SparkSession, structure: dict) -> dict[str, str]:
    """Create missing tables / add missing columns per the structure doc
    (DbStructureWorker behavior). Returns {table: action} log."""
    actions: dict[str, str] = {}
    for table, tdef in structure.items():
        schema, _keys = structure_to_spark_schema(tdef)
        if not spark.catalog.tableExists(table):
            ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
            spark.sql(f"CREATE TABLE {table} ({ddl}) USING parquet")
            actions[table] = "created"
            continue
        existing = {f.name.lower() for f in spark.table(table).schema.fields}
        missing = [f for f in schema.fields if f.name.lower() not in existing]
        if missing:
            adds = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in missing)
            spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({adds})")
            actions[table] = f"added {len(missing)} columns"
        else:
            actions[table] = "unchanged"
    return actions
