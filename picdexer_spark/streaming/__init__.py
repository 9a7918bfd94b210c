from picdexer_spark.streaming.incremental import (
    build_incremental,
    compact,
    run_dropzone_stream,
)
from picdexer_spark.streaming.stateful import (
    first_seen_filter,
    streaming_date_histogram,
)

__all__ = [
    "build_incremental", "compact", "run_dropzone_stream",
    "first_seen_filter", "streaming_date_histogram",
]
