"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.8) — its "streaming" is IO
streaming. This module is the beyond-parity streaming path for the same
operators: the event-time windowed aggregation twin of
plans/analytics_queries.events_window_agg, watermarked streaming dedup
(the streaming twin of the dedup family), and a foreachBatch upsert sink
that runs the SAME merge library per micro-batch.
"""

from dbimport_spark.streaming.ops import (
    read_events_stream,
    stream_dedup,
    stream_upsert_sink,
    windowed_event_agg,
)

__all__ = [
    "read_events_stream",
    "stream_dedup",
    "stream_upsert_sink",
    "windowed_event_agg",
]
