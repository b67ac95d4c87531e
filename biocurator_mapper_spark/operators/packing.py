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

1. range-bucket ids come from DETERMINISTIC quantile boundaries sampled
   off a NARROW key-only projection (see ``_range_bounds``), assigned with
   an O(log p) binary when-tree — boundaries affect only placement, never
   the result;
2. a window partitioned by the bucket id computes LOCAL prefix sums in
   parallel above ONE hash exchange of the payload;
3. per-bucket totals — one tiny row per bucket — get their own exclusive
   prefix sum (hundreds of rows, driver-scale window) and broadcast-join
   back as bucket offsets.

One payload shuffle total; nothing driver-side except the boundary sample
and per-bucket totals. The deliberate difference from the obvious
``repartitionByRange`` + ``spark_partition_id()`` formulation: partition
id is NONDETERMINISTIC to Catalyst, which disqualifies the exchange from
ReusedExchange, so the two consumers (local window + bucket totals) would
re-execute the whole child — including its range-boundary sampling pass —
doubling (with the sampler, tripling) every expensive upstream stage
(measured 4 ArrowEvalPython evaluations of the BPE encoder per
materialize run). With deterministic bucket ids the child executes ONCE:
both consumers read the same exchange, and the boundary sample never
touches the payload expressions (``key_source`` lets callers point it at
the raw column-pruned scan).

Reference parity: no analog in the reference (row-at-a-time FastAPI app);
part of the training-data-pipeline extension surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_BOUNDS_TARGET = 100_000  # driver-side sample cap for boundary estimation


def _range_bounds(
    key_source: DataFrame, key_col: str, p: int
) -> list:
    """p-1 (or fewer) sorted, distinct range boundaries for ``key_col``,
    from a DETERMINISTIC hash-thresholded sample collected driver-side.
    Boundaries affect only bucket balance, never any result — any sorted
    list is correct — so the sample is advisory: capped at ~100k keys,
    xxhash64-selected (stable across runs and engines), column-pruned."""
    narrow = key_source.select(key_col).where(F.col(key_col).isNotNull())
    n = narrow.count()
    if n == 0 or p <= 1:
        return []
    target = max(p * 64, 1024)
    if n > target:
        # oversample 2x for selection variance; threshold on a stable hash
        thresh = min(int(2_000_000 * target / n) + 1, 1_000_000)
        narrow = narrow.where(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(1_000_000)) < thresh
        )
    keys = sorted(r[0] for r in narrow.limit(4 * target).collect())
    if not keys:
        return []
    bounds = sorted(
        {keys[min(round(i * len(keys) / p), len(keys) - 1)] for i in range(1, p)}
        - {keys[0]}  # a bound at the minimum only creates an empty bucket
    )
    return bounds


def _bucket_expr(key: Column, bounds: list) -> Column:
    """Number of boundaries <= key, as an O(log p) binary when-tree —
    monotone in the key ordering, so bucket ids are range-contiguous.
    NULL keys fall through every comparison into bucket 0 (consistent
    with NULLS FIRST ordering)."""

    def build(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(key >= F.lit(bounds[mid - 1]), build(mid, hi)).otherwise(
            build(lo, mid - 1)
        )

    return build(0, len(bounds)).cast("int")


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    num_ranges: int | None = None,
    key_source: DataFrame | None = None,
) -> DataFrame:
    """``df`` + ``cum_before`` — the EXCLUSIVE prefix sum of ``value_col``
    (a column name or an expression over ``df``'s columns) over the global
    ``order_cols`` ordering, computed with the two-level distributed scan
    above (no single-partition corpus window). Input columns pass through
    unchanged; ``order_cols`` must be a unique key (the contract every
    caller already needs for a well-defined global order).

    ``key_source``: optional cheap relation to sample range boundaries
    from — pass the raw column-pruned scan when ``df`` carries expensive
    computed columns (e.g. a tokenizer UDF) so the boundary sample never
    evaluates them. Must have the same distribution of
    ``order_cols[0]`` as ``df`` for good balance (correctness never
    depends on it). Buckets split on the FIRST order column only: ties on
    it stay in one bucket (fine for unique ids; a low-cardinality leading
    key degrades balance, not results).

    Sharing contract: BOTH consumers (the local window and the per-bucket
    totals) read the window stage, whose sort demands every order column —
    so when ``df`` carries only order + value columns, the two branch
    subtrees are column-identical down to the exchange and AQE reuses the
    materialized stage (the child, UDFs included, executes ONCE). Extra
    payload columns stay correct but can split the exchange via divergent
    column pruning — keep ``df`` minimal and join wide payloads back
    outside."""
    spark = df.sparkSession
    p = num_ranges or spark.sparkContext.defaultParallelism
    key0 = order_cols[0]
    bounds = _range_bounds(key_source or df, key0, p)
    val = F.col(value_col) if isinstance(value_col, str) else value_col

    tagged = df.withColumn("_rg", _bucket_expr(F.col(key0), bounds)).repartition(
        max(len(bounds) + 1, 1), F.col("_rg")
    )
    w_local = (
        Window.partitionBy("_rg")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # INCLUSIVE local cumsum: the bucket total is its value at the last
    # order position, so the totals branch can read the SAME window stage
    # instead of re-aggregating the exchange input (which column pruning
    # would specialize into a second, non-reusable exchange)
    local = tagged.withColumn("_cum_incl", F.sum(val).over(w_local))
    okey = F.struct(*[F.col(c) for c in order_cols])
    w_rg = Window.orderBy("_rg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        local.groupBy("_rg")
        .agg(F.max_by(F.col("_cum_incl"), okey).alias("_rg_total"))
        .withColumn(
            "_rg_offset", F.sum("_rg_total").over(w_rg) - F.col("_rg_total")
        )
        .select("_rg", "_rg_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_rg")
        .withColumn(
            "cum_before", F.col("_rg_offset") + F.col("_cum_incl") - val
        )
        .drop("_rg", "_cum_incl", "_rg_offset")
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
    return ordered_prefix_sum(
        base, [id_col], "n_tokens", num_ranges, key_source=docs.select(id_col)
    ).select(
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
    # tokenizer evaluated ONCE: the prefix-sum df carries ONLY (id, _toks)
    # with the count as an EXPRESSION (see ordered_prefix_sum's sharing
    # contract — extra materialized columns would split the exchange), and
    # the empties filter stays ABOVE the scan (a filter below it would be
    # alias-substituted under the exchange and re-evaluate the tokenizer;
    # empty docs contribute 0 to every cum sum, so filtering after is
    # result-identical)
    base = docs.select(F.col(id_col), tokens_arr.alias("_toks"))
    pre = (
        ordered_prefix_sum(
            base,
            [id_col],
            F.size("_toks").cast("bigint"),
            num_ranges,
            key_source=docs.select(id_col),
        )
        .withColumn("_nt", F.size("_toks").cast("bigint"))
        .where(F.col("_nt") > 0)
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
