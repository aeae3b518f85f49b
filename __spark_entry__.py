"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship UPSERT merge at sf0.001 (SURVEY.md §7 M0).
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the scale-pipeline family; see dbimport_spark/plans/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbimport_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: dedup the F3-shaped updates
    source (join-duplicates, last-wins) and UPSERT it into customer."""
    return QUERIES["merge_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
