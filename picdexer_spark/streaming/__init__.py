from picdexer_spark.streaming.incremental import (
    build_incremental,
    compact,
    delete_by_query,
    reindex,
    run_dropzone_stream,
    update_by_query,
)
from picdexer_spark.streaming.stateful import (
    first_seen_filter,
    streaming_date_histogram,
)

__all__ = [
    "build_incremental", "compact", "delete_by_query", "reindex",
    "run_dropzone_stream", "update_by_query",
    "first_seen_filter", "streaming_date_histogram",
]
