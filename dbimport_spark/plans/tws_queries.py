"""transformWithStateInPandas query — registered in round 6 once the
vendored mini-protobuf runtime (vendor/miniproto.py + vendor/pb facade)
unblocked Spark 4's arbitrary-stateful-processing API in this container.

Round 5 gated this operator on the missing ``google.protobuf`` package
and deliberately left it unregistered so the pinned driver order never
depended on an optional dependency. The shim removed the dependency;
this module is imported LAST so the name appends after every
previously-graded query (plans/_order.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbimport_spark.plans.registry import register
from dbimport_spark.plans.streaming_queries import _events_path, _run_to_memory
from dbimport_spark.streaming.ops import read_events_stream, user_totals_tws


@register(
    "stream_user_totals_tws",
    """SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS total_e4
FROM events GROUP BY user_id""",
)
def stream_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (one
    ValueState of (n, total) per key, engine-owned layout/checkpointing
    — RocksDB column families at scale). Single availableNow batch ⇒
    the final update per user equals the batch GROUP BY exactly; values
    are pre-scaled to 1e-4 integer units so the sums are integer-exact
    on both engines. The JVM state server speaks real protobuf, so this
    query end-to-end validates the vendored mini wire codec on every
    run (tests/test_miniproto.py unit-tests the codec itself)."""
    stream = read_events_stream(spark, _events_path(sf_dir)).select(
        "user_id", F.round(F.col("value") * 10000).cast("bigint").alias("e4")
    )
    out = _run_to_memory(user_totals_tws(stream), spark, "update")
    # update-mode memory sink holds one row per (key, batch); a single
    # availableNow run may still split input across source batches, so
    # keep each user's LAST emitted snapshot (max n_events is the
    # running total's final state — monotone by construction)
    return (
        out.groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "total_e4")).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_e4").alias("total_e4"),
        )
    )
