from monster_etl_spark.streaming.pipeline import (
    read_json_stream,
    session_paths_stream,
    sessionize_stream,
    stream_dedup,
    windowed_event_counts,
)

__all__ = [
    "read_json_stream",
    "windowed_event_counts",
    "stream_dedup",
    "sessionize_stream",
    "session_paths_stream",
]
