"""Streaming capture-level dedup: the crawl table's snapshot view, live.

Batch twin: ``operators.urls.dedup_url_latest``. As captures stream in,
each micro-batch keeps its latest capture per CANONICAL url, drops
anything not strictly newer than what the catalog already holds, and
MERGEs the survivors — so ``out_table`` is always "one row per canonical
page, latest capture wins", with no state horizon (a recrawl arriving
months later still supersedes; a stale capture arriving late never
regresses the table).

Replay-idempotent without transactions: a replayed batch's winners compare
equal (not strictly greater) to their own previously-committed rows, the
strictly-newer filter drops them all, and the batch converges to a no-op.

Scale: the per-batch work is one canonicalization projection (pure
codegen), one struct-max hash agg over the batch, and one broadcast-sized
semi-comparison against ONLY the touched canonical urls (the catalog read
is key-joined; merge COW rewrites only the buckets containing batch
keys). Nothing corpus-sized shuffles per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_url_latest_sink(
    captures_stream: DataFrame,
    catalog,
    out_table: str,
    checkpoint_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str = "url",
    payload_cols: list[str] | None = None,
    n_buckets: int = 64,
    trigger: dict | None = None,
):
    """captures stream → ``out_table`` = latest capture per canonical url.

    Output columns: (url_norm, <ts_col>, <tiebreak_col>, *payload_cols) —
    the batch twin's schema, so the two tiers interoperate on one table.
    ``tiebreak_col`` makes the winner total when captures share a
    timestamp (any orderable column; the raw url works). Returns the
    started StreamingQuery (default trigger availableNow=True: drain and
    stop)."""
    from ..operators.urls import dedup_url_latest

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        win = dedup_url_latest(
            batch_df, url_col, ts_col, tiebreak_col, payload_cols
        )
        if catalog.exists(out_table):
            cur = catalog.read(out_table).select(
                "url_norm",
                F.col(ts_col).alias("_sts"),
                F.col(tiebreak_col).alias("_stb"),
            )
            newer = F.struct(F.col(ts_col), F.col(tiebreak_col)) > F.struct(
                F.col("_sts"), F.col("_stb")
            )
            win = (
                win.join(cur, "url_norm", "left")
                .where(F.col("_sts").isNull() | newer)
                .drop("_sts", "_stb")
            )
        if win.take(1):
            catalog.merge_upsert(win, out_table, ["url_norm"], n_buckets=n_buckets)

    return (
        captures_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
