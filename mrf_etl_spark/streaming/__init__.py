"""Structured Streaming surface.

The reference has NO streaming engine (SURVEY §2.10) — it achieves
*incremental, idempotent* ingest with deterministic uids +
append-unique/upsert. This package carries those exact semantics into
`readStream`/`foreachBatch`, plus the event-time operators (watermarked
windowed aggregation, stateful sessionization) a training-data pipeline
needs at scale.
"""

from mrf_etl_spark.streaming.ingest import (
    dedup_stream,
    interval_join_streams,
    sessionize_events,
    stateful_running_totals,
    stream_dedup_ingest,
    stream_incremental_rollup,
    stream_scd2_ingest,
    stream_upsert_ingest,
    windowed_event_counts,
)

__all__ = [
    "stream_upsert_ingest",
    "windowed_event_counts",
    "sessionize_events",
    "stateful_running_totals",
    "dedup_stream",
    "stream_dedup_ingest",
    "stream_incremental_rollup",
    "stream_scd2_ingest",
    "interval_join_streams",
]
