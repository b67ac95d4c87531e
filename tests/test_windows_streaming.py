"""Watermarked event-time windows: stream output equals batch oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from biocurator_mapper_spark.streaming.windows import windowed_crawl_stats
from biocurator_mapper_spark.testdata import PAGES_SCHEMA, generate_pages_rows


def test_windowed_stats_stream_matches_batch(spark, tmp_path):
    landing = tmp_path / "in"
    landing.mkdir()
    rows = generate_pages_rows(["x"], n_pages=60, seed=11, include_edge_rows=False)
    # two files processed as two micro-batches (maxFilesPerTrigger=1) so the
    # watermark advances after the first and closes windows during the second
    # ONE part file per batch dir: every part file is its own micro-batch
    # under maxFilesPerTrigger=1, and same-mtime part files order
    # arbitrarily — multiple parts per dir would make in-dir rows late
    spark.createDataFrame(rows[:55], PAGES_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b0")
    )
    spark.createDataFrame(rows[55:], PAGES_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b1")
    )
    # FileStreamSource orders by modification time — pin it so b0 (earlier
    # event times) is processed first and nothing is late
    import os
    import time as _t

    now = _t.time()
    for i, d in enumerate(["b0", "b1"]):
        for p in (landing / d).rglob("*"):
            os.utime(p, (now - 100 + i * 50, now - 100 + i * 50))
        os.utime(landing / d, (now - 100 + i * 50, now - 100 + i * 50))

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        windowed_crawl_stats(stream, window_duration="10 minutes", watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("win_stats_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = windowed_crawl_stats(
        spark.createDataFrame(rows, PAGES_SCHEMA), window_duration="10 minutes"
    )
    want = {
        (r.window_start, r.host): (r.n_pages, r.n_bytes) for r in batch.collect()
    }
    got_rows = spark.sql("select * from win_stats_t").collect()
    got = {(r.window_start, r.host): (r.n_pages, r.n_bytes) for r in got_rows}
    # append mode only emits windows the watermark closed; every emitted
    # window must match the batch oracle exactly
    assert got, "stream emitted no closed windows"
    for k, v in got.items():
        assert want[k] == v
    # rows are ordered in event time (61 s apart): the first micro-batch
    # spans ~56 min, so most 10-min windows close during the second batch;
    # only windows near the stream tail stay open
    closed_windows = {k[0] for k in got}
    assert len(closed_windows) >= 3
