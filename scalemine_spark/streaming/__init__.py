from scalemine_spark.streaming.jobs import (
    run_stream_to_memory,
    session_windows_stream,
    stateful_user_counts,
    stream_dedup_count,
    stream_type_counts,
    streaming_edge_extraction,
    streaming_incremental_components,
    tumbling_window_counts,
)

__all__ = [
    "run_stream_to_memory",
    "stream_type_counts",
    "tumbling_window_counts",
    "session_windows_stream",
    "stream_dedup_count",
    "stateful_user_counts",
    "streaming_edge_extraction",
    "streaming_incremental_components",
]
