"""Stateful streaming: first-seen dedup with state-store persistence across
restarts, and watermarked windowed counts vs the batch oracle."""

import os

import pytest
from pyspark.sql import functions as F

from picdexer_spark.streaming.stateful import (
    first_seen_filter,
    streaming_date_histogram,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, text string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_once(spark, input_dir, checkpoint, out_dir):
    # file sink (not memory): the memory sink cannot recover from a
    # checkpoint, and state-store recovery across restarts is the point
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    dedup = first_seen_filter(stream, "url", "warc_ts")
    q = (
        dedup.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["url"]: r for r in spark.read.parquet(out_dir).collect()}


def test_first_seen_filter_across_restarts(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    checkpoint = str(tmp_path / "ckpt")
    ts = "2024-01-01 00:00:{:02d}"

    # batch A: u0..u9, with u3 re-sent inside the batch at a later ts
    rows_a = [(f"u{i}", ts.format(i), f"text {i}") for i in range(10)]
    rows_a.append(("u3", ts.format(50), "late duplicate"))
    _write_batch(spark, input_dir, [
        (u, __import__("datetime").datetime.fromisoformat(t), x)
        for u, t, x in rows_a
    ])
    out_dir = str(tmp_path / "out")
    got_a = _run_once(spark, input_dir, checkpoint, out_dir)
    assert set(got_a) == {f"u{i}" for i in range(10)}
    # in-batch redelivery: the EARLIEST row won
    assert got_a["u3"]["text"] == "text 3"

    # batch B after restart: u5..u14 — only the 5 new urls pass (state
    # for u5..u9 was recovered from the checkpointed state store)
    rows_b = [(f"u{i}", ts.format(i + 20), f"again {i}") for i in range(5, 15)]
    _write_batch(spark, input_dir, [
        (u, __import__("datetime").datetime.fromisoformat(t), x)
        for u, t, x in rows_b
    ])
    got_b = _run_once(spark, input_dir, checkpoint, out_dir)
    # output dir accumulates: originals for u0..u9 (run 1) + the 5 new urls
    assert set(got_b) == {f"u{i}" for i in range(15)}
    for i in range(5, 10):  # re-sent urls did NOT re-emit
        assert got_b[f"u{i}"]["text"] == f"text {i}"
    for i in range(10, 15):
        assert got_b[f"u{i}"]["text"] == f"again {i}"


def test_streaming_date_histogram_matches_batch(spark, tmp_path):
    import datetime as dt

    input_dir = str(tmp_path / "ev")
    rows = [
        (f"u{i}", dt.datetime(2024, 1, 1 + i % 3, (i * 5) % 24, 0, 0), "x")
        for i in range(40)
    ]
    _write_batch(spark, input_dir, rows)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    hist = streaming_date_histogram(stream, "warc_ts", "12 hours", "1 day")
    q = (
        hist.writeStream.format("memory")
        .queryName("hist_s")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["bucket"]: r["n"]
        for r in spark.sql("SELECT * FROM hist_s").collect()
    }

    batch = spark.createDataFrame(rows, PAGES_SCHEMA)
    expect = {
        r["bucket"]: r["n"]
        for r in batch.groupBy(
            F.window("warc_ts", "12 hours").alias("w")
        ).agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
        .collect()
    }
    assert got == expect
