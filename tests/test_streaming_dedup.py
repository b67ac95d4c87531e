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


def test_streaming_neardup_sink_cross_batch_and_replay(spark, tmp_path):
    """Near-dup dedup with durable catalog state: batch-2 near-duplicates of
    batch-1 docs are dropped even though the exact fingerprints differ (no
    watermark horizon — state lives in the catalog); a full replay of the
    same input converges to the identical tables (keyed MERGEs + docs
    verifying against their own stored signatures)."""
    from biocurator_mapper_spark.sources.catalog import ParquetCatalog
    from biocurator_mapper_spark.streaming.dedup import streaming_neardup_sink

    import datetime as dt

    ts = dt.datetime(2025, 3, 1, 8, 0, 0)
    texts = [
        "the quick brown fox jumps over the lazy dog while the rain falls slowly tonight",
        "spark executors exchange shuffle blocks across the cluster network fabric every stage",
        "ontology terms map surface mentions to canonical curies through synonym tables",
        "streaming watermarks bound state growth for windowed aggregations over event time",
        "columnar parquet files carry footer statistics that prune row groups at scan time",
        "broadcast hash joins avoid shuffling the large fact side entirely when dims are small",
    ]
    b0 = [(f"u://a{i}", ts, None, t, "en") for i, t in enumerate(texts)]
    base = texts[0]
    # batch 2: one near-dup of a0 (one word appended), one exact dup text of
    # a1 under a new url, one genuinely new doc, plus an intra-batch pair
    fresh = (
        "completely different content about spark shuffles and broadcast "
        "joins at terabyte scale with adaptive execution"
    )
    b1 = [
        ("u://neardup-a0", ts, None, base + " appended", "en"),
        ("u://exactdup-a1", ts, None, texts[1], "en"),
        ("u://fresh", ts, None, fresh, "en"),
        ("u://fresh-twin", ts, None, fresh + " extra", "en"),
    ]

    def run(tag):
        landing = tmp_path / f"in_{tag}"
        landing.mkdir()
        _land_two_batches(spark, landing, b0, b1)
        cat = ParquetCatalog(spark, str(tmp_path / "wh_nd"))
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing) + "/*")
        )
        q = streaming_neardup_sink(
            stream, cat, "docs_nd", "state_nd",
            str(tmp_path / f"ckpt_{tag}"), n_buckets=8,
        )
        q.awaitTermination(180)
        return cat

    cat = run("one")
    urls = {r.url for r in cat.read("docs_nd").select("url").collect()}
    assert {f"u://a{i}" for i in range(6)} <= urls        # batch 1 all kept
    assert "u://fresh" in urls                            # new content kept
    assert "u://neardup-a0" not in urls                   # near-dup dropped
    assert "u://exactdup-a1" not in urls                  # exact dup dropped
    assert "u://fresh-twin" not in urls                   # intra-batch near-dup
    state_urls = {r.url for r in cat.read("state_nd").select("url").collect()}
    assert state_urls == urls                             # state == kept docs

    # REPLAY the identical input through a fresh stream/checkpoint into the
    # SAME catalog: everything now collides with its own stored signatures,
    # so both tables are unchanged
    cat2 = run("two")
    assert {r.url for r in cat2.read("docs_nd").select("url").collect()} == urls
    assert {r.url for r in cat2.read("state_nd").select("url").collect()} == urls


def test_streaming_neardup_sink_survives_duplicate_ids_in_batch(
    spark, tmp_path
):
    """An id repeated WITHIN one micro-batch (crawler revisit, two part
    files in a trigger) must not kill the stream: the batch pre-dedups per
    key before the keyed MERGEs (previously merge_upsert raised on the
    duplicate-key source and the query died)."""
    import datetime as dt

    from biocurator_mapper_spark.sources.catalog import ParquetCatalog
    from biocurator_mapper_spark.streaming.dedup import streaming_neardup_sink

    ts = dt.datetime(2025, 3, 2, 9, 0, 0)
    rows = [
        ("u://same", ts, None, "completely different content about spark shuffles at scale", "en"),
        ("u://same", ts, None, "completely different content about spark shuffles at scale", "en"),
        ("u://other", ts, None, "ontology terms map surface mentions to canonical curies via synonyms", "en"),
    ]
    landing = tmp_path / "in_dupid"
    landing.mkdir()
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.parquet(
        str(landing / "b0")
    )
    cat = ParquetCatalog(spark, str(tmp_path / "wh_dupid"))
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    q = streaming_neardup_sink(
        stream, cat, "docs_di", "state_di", str(tmp_path / "ckpt_dupid"),
        n_buckets=4,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {r.url for r in cat.read("docs_di").select("url").collect()}
    assert got == {"u://same", "u://other"}


def test_streaming_exactsubstr_sink_cross_batch_and_replay(spark, tmp_path):
    """Streaming ExactSubstr vs durable gram state: a passage lifted in a
    later batch is cut (first occurrence kept); a full replay from a fresh
    checkpoint converges to identical tables (first-writer-wins state +
    own-contributor skip)."""
    import os as _os
    import time as _t

    from biocurator_mapper_spark.operators.exactsubstr import (
        cut_spans_by_range,
        exact_substring_spans,
    )
    from biocurator_mapper_spark.sources.catalog import ParquetCatalog
    from biocurator_mapper_spark.streaming.dedup import streaming_exactsubstr_sink

    passage = (
        "gaps and islands windows merge covered positions into maximal "
        "spans across the whole corpus deterministically"
    )
    b0 = [
        (1, f"original document carries the passage {passage} first"),
        (2, "unrelated clean document with entirely original words"),
    ]
    b1 = [
        (3, f"later lift of {passage} plus trailing commentary"),
        (4, "another clean late arrival with its own content"),
    ]
    landing = tmp_path / "in_es"
    landing.mkdir()
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            str(landing / f"b{i}")
        )
    now = _t.time()
    for i in range(2):
        d = landing / f"b{i}"
        for p in d.rglob("*"):
            _os.utime(p, (now - 100 + i * 40, now - 100 + i * 40))
        _os.utime(d, (now - 100 + i * 40, now - 100 + i * 40))

    catalog = ParquetCatalog(spark, str(tmp_path / "wh_es"))

    def _run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing) + "/*")
        )
        q = streaming_exactsubstr_sink(
            stream, catalog, "docs_cut", "grams", checkpoint_dir=str(ckpt),
            id_col="doc_id", text_col="text", length=50, n_buckets=4,
        )
        q.awaitTermination(180)

    _run(tmp_path / "ck_es1")
    got = {r.doc_id: (r.text_cut, r.n_cut_chars) for r in catalog.read("docs_cut").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1][1] == 0 and "gaps and islands" in got[1][0]  # first kept
    assert got[3][1] > 0 and "gaps and islands" not in got[3][0]  # lift cut
    assert got[2][1] == 0 and got[4][1] == 0

    # batch twin under monotone ingestion: same cut text per doc
    full = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    spans = exact_substring_spans(full, "doc_id", "text", length=50)
    batch = {
        r.doc_id: (r.text_cut, r.n_cut_chars)
        for r in cut_spans_by_range(full, spans, "doc_id", "text").collect()
    }
    assert batch == got

    # full replay from a fresh checkpoint: identical content
    _run(tmp_path / "ck_es2")
    again = {r.doc_id: (r.text_cut, r.n_cut_chars) for r in catalog.read("docs_cut").collect()}
    assert again == got
    # and the state kept its original first contributors (insert-only)
    st = catalog.read("grams")
    assert st.where("first_i = 3").count() < st.count()
