"""Sequence packing + global-ordering primitives for training-data prep.

Semantics: documents are concatenated into one virtual token stream ordered
by ``id_col``; training sequence k owns tokens [k·ctx_len, (k+1)·ctx_len).
Each document reports where its tokens land (``pack_sequences``), and a
deterministic pseudo-random training order comes from the same machinery
(``shuffle_rank``).

The interesting part at scale is the global prefix sum / rank: the naive
window (``ORDER BY id`` with no PARTITION BY) collapses the whole corpus
into ONE task. ``ordered_prefix_sum`` is the classic two-level distributed
scan instead:

1. ``repartitionByRange(order_cols)`` puts disjoint, ordered key ranges in
   each partition (range boundaries come from Spark's sampler; they affect
   only placement, never the result);
2. a window partitioned by ``spark_partition_id()`` computes LOCAL prefix
   sums in parallel (one balanced hash exchange of narrow rows);
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


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """``df`` + ``cum_before`` — the EXCLUSIVE prefix sum of ``value_col``
    over the global ``order_cols`` ordering, computed with the two-level
    distributed scan above (no single-partition corpus window). Input
    columns pass through unchanged."""
    spark = df.sparkSession
    p = num_ranges or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]

    tagged = df.repartitionByRange(p, *cols).withColumn(
        "_rg", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_rg")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "_cum_local", F.sum(value_col).over(w_local) - F.col(value_col)
    )
    # per-range totals aggregate the PRE-window relation (the window's sort
    # must not ride along into this tiny job); its own exclusive prefix sum
    # runs on one task over `p` rows — driver-scale by construction
    w_rg = Window.orderBy("_rg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        tagged.groupBy("_rg")
        .agg(F.sum(value_col).alias("_rg_total"))
        .withColumn(
            "_rg_offset", F.sum("_rg_total").over(w_rg) - F.col("_rg_total")
        )
        .select("_rg", "_rg_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_rg")
        .withColumn("cum_before", F.col("_rg_offset") + F.col("_cum_local"))
        .drop("_rg", "_cum_local", "_rg_offset")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    ctx_len: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """(id, n_tokens, cum_before, seq_id, seq_offset, end_seq_id) per doc —
    GPT-style packing of the id-ordered token stream into ``ctx_len``
    windows. Documents may SPAN sequence boundaries (``end_seq_id`` >
    ``seq_id``), exactly like GPT-2/3 packing; empty docs collapse to their
    start sequence so the pair is always well-ordered.

    ``tokens_col`` is a column (or name) holding the per-doc token count —
    compose with ``functions.text.token_count`` / ``bpe_count_expr`` for
    text inputs. ``num_ranges`` defaults to the session's parallelism.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = docs.select(F.col(id_col), tok.cast("bigint").alias("n_tokens"))
    cum = F.col("cum_before")
    return ordered_prefix_sum(base, [id_col], "n_tokens", num_ranges).select(
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


def shuffle_rank(
    docs: DataFrame,
    id_col: str,
    seed: str = "0",
    num_ranges: int | None = None,
) -> DataFrame:
    """(id, shuffle_rank) — a deterministic pseudo-random GLOBAL training
    order: rank 0..n-1 by (md5(seed ‖ id), id). Epoch reshuffles = new
    ``seed``; the same seed reproduces the same order on every engine and
    every run (resume-stable). Rank is the prefix count over the hash
    ordering — the same distributed scan as packing, value 1 per row; the
    id tiebreak makes the order total even under hash collisions."""
    hashed = docs.select(
        F.col(id_col),
        F.md5(
            F.concat(
                F.lit(str(seed)),
                F.lit(":"),
                F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null")),
            )
        ).alias("_h"),
    ).withColumn("_one", F.lit(1).cast("bigint"))
    return ordered_prefix_sum(hashed, ["_h", id_col], "_one", num_ranges).select(
        F.col(id_col),
        F.col("cum_before").alias("shuffle_rank"),
    )


def materialize_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_arr: Column,
    ctx_len: int,
    num_ranges: int | None = None,
    sep: str = " ",
) -> DataFrame:
    """(seq_id, n_tokens, seq_text) — the actual packed training sequences:
    sequence k holds tokens [k·ctx_len, (k+1)·ctx_len) of the id-ordered
    concatenated token stream (the last sequence may be short). Documents
    spanning a boundary are SPLIT across sequences, GPT-style.

    ``tokens_arr`` is the tokenization expression (array<string>) — pass
    the same tokenizer the counting/packing used. Plan: prefix sum over
    token counts (the distributed scan), one explode of each doc's
    (start_seq..end_seq) span — ≤ n_tokens/ctx_len + 1 rows per doc, so
    total explode output ≈ corpus tokens / ctx_len + n_docs — then ONE
    shuffle keyed on seq_id (balanced: every sequence is the same size by
    construction) to assemble fragments in stream order."""
    frags = _sequence_fragments(docs, id_col, tokens_arr, ctx_len, num_ranges)
    return (
        frags.groupBy("seq_id")
        .agg(
            F.sum(F.size("_frag")).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_cum", "_frag"))),
                        lambda x: x["_frag"],
                    )
                ),
                sep,
            ).alias("seq_text"),
        )
        .select("seq_id", "n_tokens", "seq_text")
    )


def materialize_id_sequences(
    docs: DataFrame,
    id_col: str,
    ids_arr: Column,
    ctx_len: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """(seq_id, n_tokens, seq_ids) — :func:`materialize_sequences` for REAL
    tokenizer ids: ``ids_arr`` is an ``array<int>`` expression (compose with
    ``functions.bpe.bpe_encode_expr``) and sequence k holds ids
    [k·ctx_len, (k+1)·ctx_len) of the id-ordered concatenated id stream —
    ctx-length windows of actual BPE ids, the tensor-ready training input.
    Same distributed plan: prefix scan, bounded span explode, one balanced
    seq_id shuffle; fragments reassemble in stream order via the
    ``_cum``-sorted struct list."""
    frags = _sequence_fragments(docs, id_col, ids_arr, ctx_len, num_ranges)
    return (
        frags.groupBy("seq_id")
        .agg(
            F.sum(F.size("_frag")).cast("bigint").alias("n_tokens"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_cum", "_frag"))),
                    lambda x: x["_frag"],
                )
            ).alias("seq_ids"),
        )
        .select("seq_id", "n_tokens", "seq_ids")
    )


def _sequence_fragments(
    docs: DataFrame,
    id_col: str,
    tokens_arr: Column,
    ctx_len: int,
    num_ranges: int | None,
) -> DataFrame:
    """Shared (seq_id, _cum, _frag) fragment relation for the two
    materializers: each row is the slice of one doc's token array that
    falls inside one ctx-window (element type passes through untouched)."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    base = docs.select(
        F.col(id_col), tokens_arr.alias("_toks")
    ).withColumn("_nt", F.size("_toks").cast("bigint"))
    pre = ordered_prefix_sum(
        base.where(F.col("_nt") > 0), [id_col], "_nt", num_ranges
    )
    cum = F.col("cum_before")
    start_seq = F.floor(cum / ctx_len).cast("bigint")
    end_seq = F.floor((cum + F.col("_nt") - 1) / ctx_len).cast("bigint")
    spans = pre.select(
        cum.alias("_cum"),
        "_toks",
        "_nt",
        F.explode(F.sequence(start_seq, end_seq)).alias("seq_id"),
    )
    # fragment of this doc's tokens that falls inside seq_id (0-based
    # offsets within the doc; F.slice is 1-based)
    frag_start = F.greatest(
        F.col("seq_id") * ctx_len - F.col("_cum"), F.lit(0).cast("bigint")
    )
    frag_end = F.least(
        F.col("_nt"), (F.col("seq_id") + 1) * ctx_len - F.col("_cum")
    )
    return spans.select(
        "seq_id",
        "_cum",
        F.slice(
            "_toks",
            (frag_start + 1).cast("int"),
            (frag_end - frag_start).cast("int"),
        ).alias("_frag"),
    )
