"""Streaming URL latest-capture sink: cross-batch latest-wins with durable
catalog state, stale-capture rejection, replay convergence."""

from __future__ import annotations

import os
import time as _t

from pyspark.sql import functions as F

CAP_SCHEMA = "url string, warc_ts long, text string"


def _land(spark, landing, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, CAP_SCHEMA).coalesce(1).write.parquet(
            str(landing / f"b{i}")
        )
    now = _t.time()
    for i in range(len(batches)):
        d = landing / f"b{i}"
        for p in d.rglob("*"):
            os.utime(p, (now - 100 + i * 40, now - 100 + i * 40))
        os.utime(d, (now - 100 + i * 40, now - 100 + i * 40))


def _run(spark, landing, catalog, table, ckpt):
    from biocurator_mapper_spark.streaming.urls import streaming_url_latest_sink

    stream = (
        spark.readStream.schema(CAP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = streaming_url_latest_sink(
        stream,
        catalog,
        table,
        checkpoint_dir=str(ckpt),
        url_col="url",
        ts_col="warc_ts",
        tiebreak_col="url",
        payload_cols=["text"],
        n_buckets=4,
    )
    q.awaitTermination(180)


def test_streaming_url_latest_cross_batch_and_replay(spark, tmp_path):
    from biocurator_mapper_spark.sources.catalog import ParquetCatalog

    landing = tmp_path / "in"
    landing.mkdir()
    # canonical page A appears under trivially different urls; batch 2
    # carries a STALE capture of A (ts 15 < stored 20) that must not
    # regress the table, a newer B, and a brand-new C
    b0 = [
        ("HTTP://A.com:80/p?utm_source=x", 10, "a-old"),
        ("http://a.com/p", 20, "a-new"),
        ("http://b.com/", 5, "b-old"),
    ]
    b1 = [
        ("http://a.com/p#frag", 15, "a-stale-late"),
        ("http://B.com", 30, "b-new"),
        ("http://c.com/x", 1, "c-only"),
    ]
    _land(spark, landing, [b0, b1])

    catalog = ParquetCatalog(spark, str(tmp_path / "wh"))
    _run(spark, landing, catalog, "captures", tmp_path / "ck1")

    got = {
        r.url_norm: (r.warc_ts, r.text)
        for r in catalog.read("captures").collect()
    }
    assert got == {
        "http://a.com/p": (20, "a-new"),
        "http://b.com/": (30, "b-new"),
        "http://c.com/x": (1, "c-only"),
    }

    # full replay from a fresh checkpoint converges to identical content
    _run(spark, landing, catalog, "captures", tmp_path / "ck2")
    again = {
        r.url_norm: (r.warc_ts, r.text)
        for r in catalog.read("captures").collect()
    }
    assert again == got

    # batch twin over ALL captures agrees (the two tiers share one schema)
    from biocurator_mapper_spark.operators.urls import dedup_url_latest

    allcap = spark.createDataFrame(b0 + b1, CAP_SCHEMA)
    batch = {
        r.url_norm: (r.warc_ts, r.text)
        for r in dedup_url_latest(
            allcap, "url", "warc_ts", "url", ["text"]
        ).collect()
    }
    assert batch == {k: v for k, v in got.items()}
