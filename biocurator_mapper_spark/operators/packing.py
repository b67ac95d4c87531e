"""Sequence packing: concatenate documents (in id order) into fixed-length
training sequences — the GPT-style "pack the token stream into ctx_len
windows" step every LLM pretraining pipeline runs after curation.

Semantics: documents are concatenated into one virtual token stream ordered
by ``id_col``; training sequence k owns tokens [k·ctx_len, (k+1)·ctx_len).
Each document reports where its tokens land:

- ``cum_before`` — exclusive prefix sum of token counts (stream position),
- ``seq_id``     — the sequence its FIRST token falls in,
- ``seq_offset`` — position of that first token within the sequence,
- ``end_seq_id`` — the sequence its LAST token falls in (documents may span
  sequence boundaries, exactly like GPT-2/3 packing; empty docs collapse to
  ``seq_id`` so the pair is always well-ordered).

The interesting part at scale is the prefix sum: the naive window
(``ORDER BY id`` with no PARTITION BY) collapses the whole corpus into ONE
task. This implementation is the classic two-level distributed scan:

1. ``repartitionByRange(id)`` puts disjoint, ordered id ranges in each
   partition (range boundaries come from Spark's sampler; they affect only
   placement, never the result);
2. a window partitioned by ``spark_partition_id()`` computes LOCAL prefix
   sums in parallel (one balanced hash exchange of (id, n) pairs);
3. per-range totals — one tiny row per partition — get their own exclusive
   prefix sum (hundreds of rows, driver-scale window) and broadcast-join
   back as range offsets.

Two narrow-row corpus shuffles total, both balanced; nothing driver-side
except the per-range totals. AQE partition coalescing merges only ADJACENT
ranges, so range-contiguity (what step 2's ordering relies on) survives.

Reference parity: no analog in the reference (row-at-a-time FastAPI app);
part of the training-data-pipeline extension surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    ctx_len: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """(id, n_tokens, cum_before, seq_id, seq_offset, end_seq_id) per doc.

    ``tokens_col`` is a column (or name) holding the per-doc token count —
    compose with ``functions.text.token_count`` / ``bpe_count_expr`` for
    text inputs. ``num_ranges`` defaults to the session's parallelism.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    spark = docs.sparkSession
    p = num_ranges or spark.sparkContext.defaultParallelism

    base = docs.select(
        F.col(id_col), tok.cast("bigint").alias("n_tokens")
    ).repartitionByRange(p, F.col(id_col))
    tagged = base.withColumn("_rg", F.spark_partition_id())

    w_local = (
        Window.partitionBy("_rg")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "_cum_local", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )

    # per-range totals aggregate the PRE-window relation (the window's sort
    # must not ride along into this tiny job); its own exclusive prefix sum
    # runs on one task over `p` rows — driver-scale by construction
    w_rg = (
        Window.orderBy("_rg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        tagged.groupBy("_rg")
        .agg(F.sum("n_tokens").alias("_rg_total"))
        .withColumn("_rg_offset", F.sum("_rg_total").over(w_rg) - F.col("_rg_total"))
        .select("_rg", "_rg_offset")
    )

    cum = F.col("_rg_offset") + F.col("_cum_local")
    out = local.join(F.broadcast(offsets), "_rg").select(
        F.col(id_col),
        F.col("n_tokens"),
        cum.alias("cum_before"),
        F.floor(cum / ctx_len).cast("bigint").alias("seq_id"),
        (cum % ctx_len).cast("bigint").alias("seq_offset"),
        F.floor(
            (cum + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / ctx_len
        )
        .cast("bigint")
        .alias("end_seq_id"),
    )
    return out
