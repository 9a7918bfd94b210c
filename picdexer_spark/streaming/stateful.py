"""Custom stateful streaming operators (applyInPandasWithState).

The reference's dropzone achieves at-most-once by DELETING consumed files
(cmd/dropzone.go:99-103); our incremental path (streaming/incremental.py)
achieves exactly-once per FILE via checkpointed snapshot sources. What
neither gives is exactly-once per ROW across batches when upstream re-sends
individual urls — the at-least-once delivery every real crawl feed has.
`first_seen_filter` is that operator: per-key state in the Spark state
store records which urls have already passed; re-deliveries are dropped
inside the stream, before the (expensive) index build ever sees them.

Scale notes (100 TB): state is partitioned by the group key (url) across
executors — the state store scales horizontally like any keyed shuffle;
an optional processing-time TTL expires keys so unbounded crawl feeds keep
bounded state (an expired key readmits its url — tune TTL to the upstream
redelivery window). `streaming_date_histogram` is the watermark + windowed
aggregation shape for late-arriving events (the dashboards' date histogram,
kibana.ndjson:3, expressed over an unbounded stream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_filter(
    stream: DataFrame,
    key_col: str,
    order_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen per key, across micro-batches and
    restarts (state lives in the checkpointed state store).

    Within a batch the earliest row by ``order_col`` wins (deterministic);
    later batches re-sending the key emit nothing. With ``ttl_minutes`` the
    key's state expires after that idle period (bounded state for unbounded
    feeds; an expired key readmits its url).
    """
    out_schema = stream.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes else GroupStateTimeout.NoTimeout
    )

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            return  # key already emitted in some earlier batch
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iat[0] < best[order_col].iat[0]:
                best = cand
        if best is not None:
            state.update((True,))
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            yield best

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_date_histogram(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "12 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """The dashboards' date histogram over an unbounded stream: watermarked
    event time + tumbling window counts. Rows later than ``watermark`` are
    dropped; everything else lands in its window even out of order."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
    )
