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
from dbimport_spark.plans import relational_queries  # noqa: E402,F401
from dbimport_spark.plans import learned_queries  # noqa: E402,F401
from dbimport_spark.plans import warc_queries  # noqa: E402,F401  (r6 additions keep LAST: append-only driver order)
from dbimport_spark.plans import tws_queries  # noqa: E402,F401

# Re-key both dicts into the driver-rotation-stable order: the round-2
# snapshot order first (plans/_order.py), then any later additions in
# first-registration order. Keeps the driver's rotating correctness
# subset aligned across rounds even when a query moves between modules.
from dbimport_spark.plans._order import KNOWN_ORDER  # noqa: E402

_ordered = [n for n in KNOWN_ORDER if n in QUERIES] + [
    n for n in QUERIES if n not in KNOWN_ORDER
]
_q = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_q)
_o = {n: ORACLES[n] for n in _ordered if n in ORACLES}
ORACLES.clear()
ORACLES.update(_o)

__all__ = ["QUERIES", "ORACLES", "register"]
