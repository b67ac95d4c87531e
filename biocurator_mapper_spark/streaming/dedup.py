"""Streaming deduplication over continuously arriving documents.

The batch dedup family (operators/dedup.py) has a streaming twin for the
ingest path of a training-data pipeline: drop exact/near duplicates AS
pages land, before they ever hit storage.

Two tiers:

- ``streaming_exact_dedup``: content-fingerprint dedup with
  ``dropDuplicatesWithinWatermark`` — state is bounded by the watermark
  horizon (an unbounded ``dropDuplicates`` would grow state forever at
  100 TB/day; within-watermark is the production form: duplicates of a
  document almost always arrive within hours — crawler retries, mirror
  fetches — so a 1-day horizon removes ~all of them with finite state);
- ``streaming_simhash_marks``: stateless near-dup ANNOTATION — computes the
  48-bit SimHash sketch per incoming page (pure codegen expressions, no
  state) so a periodic batch job (``simhash_near_dup_pairs``) can sweep
  cross-horizon near-duplicates offline. Splitting "mark online, pair
  offline" keeps the stream narrow and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint
from ..operators.dedup import simhash_expr


def streaming_exact_dedup(
    pages_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 day",
) -> DataFrame:
    """stream → stream with exact-content duplicates dropped within the
    watermark horizon. Keyed by the normalized-content fingerprint (the
    same md5 the batch ``fingerprint_dedup`` groups by), so case/spacing
    variants collapse too."""
    # NULL text → NULL fingerprint, and dropDuplicatesWithinWatermark
    # treats NULL keys as EQUAL — all not-yet-extracted (html-only) pages
    # would collapse to one. Key such rows by their unique url instead so
    # they pass through for later extraction. concat() null-propagates, so
    # a NULL-text/NULL-url row needs one more fallback (its event time) or
    # all such rows would still collapse under NULL-equal semantics.
    return (
        pages_stream.withColumn(
            "fingerprint",
            F.coalesce(
                doc_fingerprint(F.col(text_col)),
                F.concat(F.lit("nullarmor:"), F.col("url")),
                F.concat(F.lit("nullrow:"), F.col(ts_col).cast("string")),
            ),
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_simhash_marks(
    pages_stream: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """+ 48-bit SimHash sketch per page — stateless, codegen-only; feeds the
    offline block-permutation pairing sweep."""
    return pages_stream.withColumn(out_col, simhash_expr(F.col(text_col)))
