from picdexer_spark.streaming.incremental import (
    build_incremental,
    run_dropzone_stream,
)

__all__ = ["build_incremental", "run_dropzone_stream"]
