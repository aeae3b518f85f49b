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


@register(
    "stream_sessionize_tws",
    """WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM g
),
per_sess AS (
  SELECT user_id, session_id, count(*) AS n
  FROM s GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id""",
)
def stream_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap, the events_sessionize
    convention) through transformWithStateInPandas LIST state — the
    engine owns the per-user event history (RocksDB column family +
    optional TTL at scale). Final running snapshot per user equals the
    batch window computation; summary counts are integers, so the
    comparison is exact."""
    stream = read_events_stream(spark, _events_path(sf_dir)).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    from dbimport_spark.streaming.ops import sessionize_tws

    out = _run_to_memory(sessionize_tws(stream), spark, "update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max(
                F.struct("n_events", "n_sessions", "max_session_events")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_sessions").alias("n_sessions"),
            F.col("s.n_events").alias("n_events"),
            F.col("s.max_session_events").alias("max_session_events"),
        )
    )


@register(
    "stream_type_totals_tws",
    """SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS total_e4
FROM events GROUP BY user_id, event_type""",
)
def stream_type_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-event-type running totals through
    transformWithStateInPandas MAP state (streaming/ops.type_totals_tws;
    timer wire surface pinned by the trigger-once checkpoint test — see
    the operator docstring). State traffic is one RPC per
    distinct type per user per batch (batches pre-aggregated pandas-
    side); values are pre-scaled 1e-4 integer units, so the final
    snapshot equals the batch GROUP BY bit-for-bit."""
    stream = read_events_stream(spark, _events_path(sf_dir)).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 10000).cast("bigint").alias("e4"),
    )
    from dbimport_spark.streaming.ops import type_totals_tws

    out = _run_to_memory(type_totals_tws(stream), spark, "update")
    return (
        out.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("n_events", "total_e4")).alias("s"))
        .select(
            "user_id",
            "event_type",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_e4").alias("total_e4"),
        )
    )
