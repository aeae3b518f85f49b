"""Query registry: named (spark_callable, oracle_sql) pairs for the driver.

Each query is an operator demonstration from SURVEY.md §2 (or a
scale-pipeline operator: dedup/similarity/text analysis). The spark
callable takes (spark, sf_dir) and returns a DataFrame whose column names
and types match the DuckDB oracle SQL exactly (the driver sorts columns by
name and value-hashes, so every computed column is aliased identically on
both sides).
"""

from dbimport_spark.plans.registry import ORACLES, QUERIES, register

# import for registration side effects
from dbimport_spark.plans import merge_queries  # noqa: E402,F401
from dbimport_spark.plans import coerce_queries  # noqa: E402,F401
from dbimport_spark.plans import analytics_queries  # noqa: E402,F401
from dbimport_spark.plans import text_queries  # noqa: E402,F401
from dbimport_spark.plans import vector_queries  # noqa: E402,F401
from dbimport_spark.plans import scale_queries  # noqa: E402,F401
from dbimport_spark.plans import source_queries  # noqa: E402,F401
from dbimport_spark.plans import streaming_queries  # noqa: E402,F401
from dbimport_spark.plans import curation_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
