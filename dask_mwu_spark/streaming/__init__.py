from dask_mwu_spark.streaming.events import (
    ANOMALY_SCHEMA,
    EVENTS_SCHEMA,
    GAP_US_DEFAULT,
    anomaly_batch,
    anomaly_stream,
    dedup_stream,
    event_time,
    interval_join_events,
    sessionize_batch,
    sessionize_stream,
    stream_events,
    windowed_event_stats,
)

__all__ = [
    "ANOMALY_SCHEMA",
    "EVENTS_SCHEMA",
    "GAP_US_DEFAULT",
    "anomaly_batch",
    "anomaly_stream",
    "dedup_stream",
    "event_time",
    "interval_join_events",
    "sessionize_batch",
    "sessionize_stream",
    "stream_events",
    "windowed_event_stats",
]
