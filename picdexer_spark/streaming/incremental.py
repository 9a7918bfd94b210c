"""Incremental + streaming index builds, resumable from snapshot checkpoints.

The reference's `dropzone` mode polls a directory, waits for files to go
quiescent, runs the SAME batch pipeline over them, then deletes the inputs
(reference: cmd/dropzone.go:51-106, quiescence fileWatcher.go:45-71, delete
99-103 — at-most-once). Our analogue replaces destructive consume with
checkpointed snapshots (exactly-once): each micro-batch appends a child
snapshot whose manifest records its parent and its source ids; a crash
before commit leaves the previous manifest intact (the half-written
snapshot dir is garbage-collected by abort_uncommitted), and re-delivery of
an already-committed source is a no-op. That is the "resumable from Iceberg
snapshot checkpoints" contract of the north rule, expressed on the plain
parquet catalog (sources/catalog.py).

Append mechanics: new docs get doc_ids starting at the committed n_docs, so
their doc-range shards sit at or after the last committed shard and delta
posting blocks never overlap parent block ranges — the chained read
(catalog CHAINED_TABLES) IS the posting-list merge, no rewrite. BM25 global
stats (N, avgdl, per-term df) are re-merged per snapshot from parent stats
+ delta rollup, so queries against the child snapshot score with
whole-index statistics.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picdexer_spark.index.build import (
    BuildResult,
    IndexConfig,
    _write_small_table,
    build_index,
)
from picdexer_spark.sources.catalog import IndexCatalog


def build_incremental(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    source_id: str = "batch-0",
) -> BuildResult | None:
    """Append one batch of pages as a child snapshot.

    Returns None when `source_id` was already committed (idempotent
    re-delivery — the at-least-once streaming case). Rows whose url is
    already in the committed doc store are anti-joined away, so re-sent
    rows dedup (the content-addressed idempotency of the reference's md5
    FileID, common.go:44-63, elasticsearch.go:185-190).
    """
    cfg = cfg or IndexConfig()
    cat = IndexCatalog(index_dir)
    manifest = cat.read_manifest()
    if source_id in manifest["processed_sources"]:
        return None
    parent = manifest["current"]
    if parent is None:
        return build_index(spark, pages, index_dir, cfg, sources=[source_id])

    committed = cat.committed_stats(spark)
    n_committed = int(committed["n_docs"])

    existing_urls = cat.read(spark, "docs").select("url")
    fresh = pages.join(existing_urls, "url", "left_anti")

    delta_cfg = IndexConfig(
        shard_range=cfg.shard_range,
        block_size=cfg.block_size,
        import_id=cfg.import_id,
        id_offset=n_committed,
    )
    # write the delta snapshot WITHOUT committing, patch in whole-index
    # stats, then commit atomically with the parent pointer
    res = build_index(
        spark, fresh, index_dir, delta_cfg, sources=[source_id], commit=False
    )
    snap_dir = os.path.join(index_dir, "snapshots", res.snapshot_id)

    # term_stats: parent full + delta rollup -> full table for this snapshot
    parent_ts = cat.read(spark, "term_stats", parent)
    delta_ts = spark.read.parquet(os.path.join(snap_dir, "term_stats"))
    merged = (
        parent_ts.unionByName(delta_ts)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    tmp = os.path.join(snap_dir, "term_stats_merged")
    merged.write.mode("overwrite").parquet(tmp)
    final = os.path.join(snap_dir, "term_stats")
    shutil.rmtree(final)
    os.rename(tmp, final)

    # stats: parent + delta
    n_docs = n_committed + res.n_docs
    delta_stats = spark.read.parquet(os.path.join(snap_dir, "stats")).first()
    total_len = int(committed["total_len"]) + int(delta_stats["total_len"])
    dropped = int(committed["docs_dropped"]) + res.docs_dropped
    avgdl = (total_len / n_docs) if n_docs else 0.0
    shutil.rmtree(os.path.join(snap_dir, "stats"))
    _write_small_table(
        os.path.join(snap_dir, "stats"),
        {
            "n_docs": [n_docs],
            "total_len": [total_len],
            "avgdl": [float(avgdl)],
            "docs_dropped": [dropped],
            "import_id": [cfg.import_id],
        },
        schema=pa.schema(
            [("n_docs", pa.int64()), ("total_len", pa.int64()),
             ("avgdl", pa.float64()), ("docs_dropped", pa.int64()),
             ("import_id", pa.string())]
        ),
    )

    cat.commit(res.snapshot_id, [source_id], parent=parent)
    return BuildResult(res.snapshot_id, n_docs, res.n_postings_rows,
                       dropped, res.phase_secs)


def run_dropzone_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
    available_now: bool = True,
    processing_time: str = "5 seconds",
):
    """Streaming build: watch a pages directory, index each micro-batch.

    Structured Streaming's file source IS the quiescence/polling machinery
    the reference hand-rolls (fileWatcher.go:45-71): files are picked up
    once fully visible, offsets tracked in the checkpoint (vs the
    reference's delete-after-process, cmd/dropzone.go:99-103). foreachBatch
    applies the same incremental snapshot append as the batch path.
    Trigger.AvailableNow drains pending files and stops (test/e2e mode);
    ProcessingTime mirrors the reference's `period` config
    (cmd/dropzone.go:55-59).
    """
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        build_incremental(
            spark, batch_df, index_dir, cfg, source_id=f"epoch-{epoch_id}"
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime=processing_time).start()
    return q
