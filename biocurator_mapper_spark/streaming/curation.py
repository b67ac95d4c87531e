"""Streaming curation: the quality → language → dedup funnel on the
ingest path, so rejected/duplicate pages are dropped AS they land instead
of in a later batch sweep.

Built from the SAME gate stage as the batch funnel
(``pipeline/curation.py::curation_gates`` — one fused-signal projection,
zero state), plus the streaming-native dedup tier:

- gates are stateless per-row expressions → run unchanged on a stream;
- exact dedup uses ``dropDuplicatesWithinWatermark`` keyed on the content
  fingerprint (bounded state, same horizon argument as
  ``streaming/dedup.py``);
- the funnel report becomes an event-time-windowed per-gate count (a
  streaming aggregate with a watermark, emitting append-mode rows as
  windows close).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.curation import curation_gates


def streaming_curate(
    pages_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 day",
    lang_col: str | None = "lang",
    min_lm_score: float | None = None,
    lm_model: DataFrame | None = None,
    **gate_kwargs,
) -> DataFrame:
    """stream → stream of pages that survive every gate AND are the first
    occurrence of their content fingerprint within the watermark horizon.
    Rejected rows are dropped; use :func:`streaming_curation_counts` (or
    ``curation_gates`` directly) for the reject-side accounting.

    ``min_lm_score`` + ``lm_model`` add the char-LM quality gate: the
    PRE-TRAINED model (a static dimension-sized DataFrame) broadcast-joins
    against the stream's trigrams — a stream-static join, fully
    stream-compatible. Unlike the batch funnel the model cannot default to
    self-training (that would aggregate the unbounded stream), so both
    arguments are required together."""
    gated = curation_gates(
        pages_stream, text_col=text_col, lang_col=lang_col, **gate_kwargs
    )
    kept = gated.where(F.col("curation_gate").isNull()).drop("curation_gate")
    if min_lm_score is not None:
        if lm_model is None:
            raise ValueError(
                "streaming LM gating needs a pre-trained lm_model "
                "(train_char_lm on a static reference corpus)"
            )
        from ..operators.lm_quality import score_with_model

        kept = score_with_model(kept, text_col, lm_model).where(
            F.col("lm_score") >= min_lm_score
        ).drop("lm_score", "n_trigrams")
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def streaming_curation_counts(
    pages_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "1 day",
    lang_col: str | None = "lang",
    **gate_kwargs,
) -> DataFrame:
    """Event-time-windowed funnel report: one row per (window, stage) with
    the page count, where stage is the first failed gate or 'kept'
    (pre-dedup — duplicate counting needs the dedup state and belongs to
    the kept stream's consumer). Append-mode emission as windows close."""
    gated = curation_gates(
        pages_stream, text_col=text_col, lang_col=lang_col, **gate_kwargs
    )
    return (
        gated.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("window"),
            F.coalesce(F.col("curation_gate"), F.lit("kept")).alias("stage"),
        )
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
