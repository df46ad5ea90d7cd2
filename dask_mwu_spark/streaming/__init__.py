from dask_mwu_spark.streaming.events import (
    EVENTS_SCHEMA,
    GAP_US_DEFAULT,
    dedup_stream,
    event_time,
    interval_join_events,
    sessionize_batch,
    sessionize_stream,
    stream_events,
    windowed_event_stats,
)

__all__ = [
    "EVENTS_SCHEMA",
    "GAP_US_DEFAULT",
    "dedup_stream",
    "event_time",
    "interval_join_events",
    "sessionize_batch",
    "sessionize_stream",
    "stream_events",
    "windowed_event_stats",
]
