"""Event-time windowed aggregation with watermarks (late-data handling).

The reference's only 'late data' concept is a whole new ontology version
(SURVEY §2 streaming note); for continuously crawled PAGES the engine also
offers standard event-time analytics: tumbling-window page/host counts on
``warc_ts`` with a watermark bounding state. Late pages within the
watermark still update their window; older ones are dropped — exactly
Structured Streaming semantics, state is bounded by (watermark ÷ window)
windows per host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import with_url_host


def windowed_crawl_stats(
    pages: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """pages(stream or batch) → per (window, host) page counts + bytes.

    Works identically on a batch DataFrame (no watermark applied) and a
    stream (watermark bounds state) — one definition, two execution modes.
    """
    df = pages
    if df.isStreaming:
        df = df.withWatermark("warc_ts", watermark)
    return (
        df.select(
            F.col("warc_ts"),
            with_url_host(F.col("url")).alias("host"),
            F.coalesce(
                F.length(F.col("html")).cast("long"),
                F.length(F.col("text")).cast("long"),
                F.lit(0).cast("long"),
            ).alias("page_bytes"),
        )
        .groupBy(F.window("warc_ts", window_duration).alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("page_bytes").alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
            "n_bytes",
        )
    )
