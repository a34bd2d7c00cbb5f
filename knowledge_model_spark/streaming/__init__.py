"""Structured Streaming operators (engine extension; SURVEY.md §2.9).

The reference has no streaming runtime — incrementality is cron +
filesystem state (reference: deployments/nas_daily.py:19-32,
pipelines/tasks/fetch_clean.py:35-53).  This package supplies the real
thing: file-source incremental ingest with Trigger.AvailableNow,
watermarked windowed aggregations, stateful dedup, and session windows.
"""

from knowledge_model_spark.streaming.windows import (
    ohlc_stream,
    sessionized_stream,
    sliding_counts,
    stateful_capped_sessions,
    stateful_running_totals_tws,
    stream_stream_interval_join,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "tumbling_counts",
    "ohlc_stream",
    "sliding_counts",
    "sessionized_stream",
    "stateful_capped_sessions",
    "stateful_running_totals_tws",
    "stream_stream_interval_join",
    "streaming_dedup",
]
