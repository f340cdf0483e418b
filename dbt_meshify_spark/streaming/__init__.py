"""Structured Streaming surface (SURVEY.md §2.6 N6-N8).

The reference has no streaming plane (nothing in /root/reference/dbt_meshify/
touches streams — SURVEY §2.6 N6); this package supplies the
batch-equivalent-checked streaming semantics the north star requires:
event-time windows, watermark late-data policy, and a custom stateful
operator via applyInPandasWithState.
"""

from dbt_meshify_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_window_stats,
    sliding_window_counts,
    stateful_user_totals,
    stream_stream_join_clicks_to_purchases,
    stream_to_incremental,
    tumbling_window_counts,
    with_watermark,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "stateful_user_totals",
    "stream_stream_join_clicks_to_purchases",
    "stream_to_incremental",
    "with_watermark",
    "run_to_memory",
]
