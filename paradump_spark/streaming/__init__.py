"""Structured Streaming surface (beyond-reference; SURVEY §2.10).

The reference has no streaming; its closest notion is re-running parasync
to re-converge a destination.  Here that becomes a real continuous
pipeline: ``readStream`` over an append-only table/directory, watermarked
windowed aggregations for late data, ``applyInPandasWithState`` for custom
stateful operators, and ``foreachBatch`` micro-batch diff-apply for
CDC-style continuous sync.
"""

from paradump_spark.streaming.documents import (
    pii_monitor_stream,
    read_document_stream,
    scrub_document_stream,
    stream_incremental_dedup,
)
from paradump_spark.streaming.events import (
    dedup_event_stream,
    hourly_event_counts,
    purchase_click_stream_join,
    read_event_stream,
    running_user_totals,
    session_rollup_stream,
    stream_sync_to_sink,
)

__all__ = [
    "read_event_stream",
    "hourly_event_counts",
    "running_user_totals",
    "stream_sync_to_sink",
    "dedup_event_stream",
    "purchase_click_stream_join",
    "session_rollup_stream",
    "read_document_stream",
    "scrub_document_stream",
    "pii_monitor_stream",
    "stream_incremental_dedup",
]
