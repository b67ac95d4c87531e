"""Streaming dedup: within-watermark exact dedup + stateless SimHash marks
agree with their batch twins."""

from __future__ import annotations

import os
import time as _t

from pyspark.sql import functions as F

from biocurator_mapper_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_simhash_marks,
)
from biocurator_mapper_spark.testdata import PAGES_SCHEMA, generate_pages_rows


def _land_two_batches(spark, landing, rows_a, rows_b):
    spark.createDataFrame(rows_a, PAGES_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b0")
    )
    spark.createDataFrame(rows_b, PAGES_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b1")
    )
    now = _t.time()
    for i, d in enumerate(["b0", "b1"]):
        for p in (landing / d).rglob("*"):
            os.utime(p, (now - 100 + i * 50, now - 100 + i * 50))
        os.utime(landing / d, (now - 100 + i * 50, now - 100 + i * 50))


def test_streaming_exact_dedup_drops_within_watermark(spark, tmp_path):
    landing = tmp_path / "in"
    landing.mkdir()
    rows = generate_pages_rows(["x"], n_pages=30, seed=3, include_edge_rows=False)
    # duplicates: re-land the first 10 pages under new urls in batch 2 —
    # same text → same fingerprint → must be dropped by the stream
    dups = [
        (r[0] + "#dup", r[1], r[2], r[3], r[4]) for r in rows[:10]
    ]
    _land_two_batches(spark, landing, rows[:20], rows[20:] + dups)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_exact_dedup(stream, watermark="2 days")
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, fingerprint from dedup_stream_t").collect()
    urls = {r.url for r in got}
    # batch oracle: one survivor per distinct fingerprint over ALL landed
    # rows (the generator itself reuses templates, so originals may
    # collide too — the stream must keep exactly the distinct set)
    from biocurator_mapper_spark.functions.text import doc_fingerprint

    all_landed = spark.createDataFrame(rows[:20] + rows[20:] + dups, PAGES_SCHEMA)
    n_distinct = (
        all_landed.select(doc_fingerprint(F.col("text")).alias("f"))
        .distinct()
        .count()
    )
    assert len(got) == n_distinct
    assert n_distinct < 40  # the planted #dup rows really were duplicates
    assert not {u for u in urls if u.endswith("#dup")}
    assert len({r.fingerprint for r in got}) == n_distinct


def test_streaming_simhash_marks_match_batch(spark, tmp_path):
    from biocurator_mapper_spark.operators.dedup import simhash_expr

    landing = tmp_path / "in2"
    landing.mkdir()
    rows = generate_pages_rows(["x"], n_pages=12, seed=5, include_edge_rows=False)
    _land_two_batches(spark, landing, rows[:6], rows[6:])

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_simhash_marks(stream)
        .writeStream.format("memory")
        .queryName("simhash_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url: r.simhash for r in spark.sql("select url, simhash from simhash_stream_t").collect()}
    batch = {
        r.url: r.simhash
        for r in spark.createDataFrame(rows, PAGES_SCHEMA)
        .select("url", simhash_expr(F.col("text")).alias("simhash"))
        .collect()
    }
    assert got == batch
