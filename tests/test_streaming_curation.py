"""Streaming curation funnel: gate+dedup stream output equals the batch
funnel's survivor set, and windowed gate counts match the batch tallies."""

from __future__ import annotations

import os
import time as _t

from pyspark.sql import functions as F

from biocurator_mapper_spark.pipeline.curation import curate, curation_gates
from biocurator_mapper_spark.streaming.curation import (
    streaming_curate,
    streaming_curation_counts,
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


def _mixed_rows():
    rows = generate_pages_rows(["x"], n_pages=24, seed=11, include_edge_rows=False)
    bad = [
        ("u://short", rows[0][1], None, "tiny", "en"),          # too_short
        ("u://de", rows[1][1], None, rows[1][3], "de"),          # wrong_language
        ("u://dup", rows[2][1], None, rows[2][3], rows[2][4]),   # duplicate of row 2
    ]
    return rows, bad


def test_streaming_curate_matches_batch_survivors(spark, tmp_path):
    landing = tmp_path / "in"
    landing.mkdir()
    rows, bad = _mixed_rows()
    all_rows = rows + bad
    _land_two_batches(spark, landing, all_rows[:15], all_rows[15:])

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_curate(stream, watermark="2 days", min_chars=40, min_tokens=5)
        .writeStream.format("memory")
        .queryName("cur_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, fingerprint from cur_stream_t").collect()

    batch = curate(
        spark.createDataFrame(all_rows, PAGES_SCHEMA),
        id_col="url",
        min_chars=40,
        min_tokens=5,
    )
    kept_fps = {
        r.fingerprint
        for r in batch.where(F.col("curation_stage") == "kept").collect()
    }
    # the streaming funnel keeps exactly one representative per surviving
    # fingerprint (first arrival; batch picks min id — same set, possibly
    # different representative urls)
    assert {r.fingerprint for r in got} == kept_fps
    assert len(got) == len(kept_fps)
    # gate-rejected rows never reach the sink
    assert "u://short" not in {r.url for r in got}
    assert "u://de" not in {r.url for r in got}


def test_null_text_rejected_identically_in_batch_and_stream(spark, tmp_path):
    """NULL-text pages (html landed, extraction pending) must FAIL a gate in
    both paths: previously all gate predicates evaluated to NULL, the NULL
    curation_gate read as kept, and the streaming dedup collapsed every
    NULL-fingerprint page into ONE surviving row (NULL keys compare equal in
    dropDuplicatesWithinWatermark) while batch kept them all — silent data
    loss on the stream and batch/stream drift. Now both reject as
    too_short."""
    import datetime as dt

    rows = generate_pages_rows(["x"], n_pages=6, seed=3, include_edge_rows=False)
    ts = dt.datetime(2025, 1, 1, 12, 0, 0)
    nulls = [
        ("u://null1", ts, b"<p>pending</p>", None, "en"),
        ("u://null2", ts, b"<p>pending2</p>", None, "en"),
    ]
    all_rows = rows + nulls

    # batch: both NULL-text pages are gate-rejected (not kept, not collapsed)
    gated = curation_gates(
        spark.createDataFrame(all_rows, PAGES_SCHEMA), min_chars=40, min_tokens=5
    )
    by_url = {r.url: r.curation_gate for r in gated.collect()}
    assert by_url["u://null1"] == "too_short"
    assert by_url["u://null2"] == "too_short"

    # stream: neither reaches the sink (they fail the gate BEFORE dedup, so
    # no NULL-fingerprint collapse can occur)
    landing = tmp_path / "in_nulls"
    landing.mkdir()
    _land_two_batches(spark, landing, all_rows[:4], all_rows[4:])
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_curate(stream, watermark="2 days", min_chars=40, min_tokens=5)
        .writeStream.format("memory")
        .queryName("cur_stream_nulls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    urls = {r.url for r in spark.sql("select url from cur_stream_nulls").collect()}
    assert "u://null1" not in urls and "u://null2" not in urls
    assert urls  # the real pages still flow


def test_streaming_curate_lm_gate(spark, tmp_path):
    """The char-LM gate on the stream: a pre-trained static model drops
    noise pages the heuristic gates pass, keeps prose — and requiring the
    model (no self-training on an unbounded stream) is enforced."""
    import pytest

    from biocurator_mapper_spark.operators.lm_quality import train_char_lm

    landing = tmp_path / "in"
    landing.mkdir()
    rows, _ = _mixed_rows()
    prose = rows[0][3]
    noise_text = "the " + " ".join(f"xq{i}zvkj qwz{i}jxv" for i in range(12)) + " and so xz"
    noise = [("u://noise", rows[0][1], None, noise_text, "en")]
    _land_two_batches(spark, landing, rows[:12], rows[12:] + noise)
    model = train_char_lm(
        spark.createDataFrame(
            [(i, prose) for i in range(50)], "doc_id long, text string"
        ),
        "text",
    )
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_curate(
            stream,
            watermark="2 days",
            min_chars=40,
            min_tokens=5,
            min_lm_score=0.05,
            lm_model=model,
        )
        .writeStream.format("memory")
        .queryName("cur_lm_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    urls = {r.url for r in spark.sql("select url from cur_lm_t").collect()}
    assert urls and "u://noise" not in urls
    with pytest.raises(ValueError, match="pre-trained lm_model"):
        streaming_curate(stream, min_lm_score=0.05)


def test_streaming_curation_counts_match_batch_gates(spark, tmp_path):
    landing = tmp_path / "in"
    landing.mkdir()
    rows, bad = _mixed_rows()
    all_rows = rows + bad
    # spread event times so the watermark closes most windows during batch 2
    _land_two_batches(spark, landing, all_rows[:15], all_rows[15:])

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = (
        streaming_curation_counts(
            stream,
            window="10 minutes",
            watermark="5 minutes",
            min_chars=40,
            min_tokens=5,
        )
        .writeStream.format("memory")
        .queryName("cur_counts_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select window.start as ws, stage, n_pages from cur_counts_t"
    ).collect()
    assert got, "stream emitted no closed windows"
    batch = (
        curation_gates(
            spark.createDataFrame(all_rows, PAGES_SCHEMA),
            min_chars=40,
            min_tokens=5,
        )
        .groupBy(
            F.window(F.col("warc_ts"), "10 minutes").alias("w"),
            F.coalesce(F.col("curation_gate"), F.lit("kept")).alias("stage"),
        )
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .collect()
    )
    oracle = {(r.w.start, r.stage): r.n_pages for r in batch}
    for r in got:
        assert oracle[(r.ws, r.stage)] == r.n_pages
