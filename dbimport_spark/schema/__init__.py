"""Schema layer: data-driven type inference, structure files, automapping."""

from dbimport_spark.schema.infer import infer_schema
from dbimport_spark.schema.mapping import automap, check_mapping
from dbimport_spark.schema.structure import structure_to_spark_schema

__all__ = ["infer_schema", "automap", "check_mapping", "structure_to_spark_schema"]
