from warp_spark.streaming.windows import (
    hourly_rollup,
    read_event_stream,
    run_stream_to_memory,
    sessionize,
    windowed_rollup,
)

__all__ = [
    "windowed_rollup",
    "hourly_rollup",
    "sessionize",
    "read_event_stream",
    "run_stream_to_memory",
]
