"""Streaming MERGE sink: continuous upsert into a catalog table.

The streaming half of the Iceberg S9/J3 mapping: each micro-batch runs a
row-level MERGE (``ParquetCatalog.merge_upsert`` — matched keys updated,
new keys inserted, untouched buckets re-linked) and commits one atomic
snapshot. The same topology against a real lakehouse is
``foreachBatch(batch.writeTo(t).merge(...))`` / ``MERGE INTO`` per batch.

Delivery semantics: exactly-once at the TABLE level. The stream checkpoint
makes batch replay the only duplicate mode, and replaying a merge with the
same source rows is idempotent — the second merge updates the same keys to
the same values, producing a new snapshot with identical content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.catalog import ParquetCatalog


def merge_upsert_stream(
    stream_df: DataFrame,
    catalog: ParquetCatalog,
    table: str,
    key_cols: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
    n_buckets: int = 64,
    trigger: dict | None = None,
) -> StreamingQuery:
    """stream → one MERGE per micro-batch into ``catalog.<table>``.

    A micro-batch may carry several rows for one key (e.g. a page
    re-crawled within the batch window); MERGE requires unique source keys,
    so the batch is reduced to one row per key first — by max ``order_col``
    (latest wins, ties broken deterministically by the remaining sort)
    when given, else the struct-minimum row over the non-key columns
    (deterministic, so a replayed batch commits identical content).
    ``trigger`` is passed to ``writeStream.trigger`` — default
    ``{"availableNow": True}`` drains what exists and stops (batch-style
    catch-up); pass e.g. ``{"processingTime": "1 minute"}`` for a
    long-lived continuous sink. Returns the started query (caller awaits
    termination)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.desc(order_col), *[F.asc(c) for c in batch_df.columns]
            )
            src = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            # dropDuplicates picks a partitioning-dependent winner — a
            # replayed batch could commit different content. min over a
            # struct of the remaining columns is deterministic, keeping
            # merge replay idempotent (columns must be orderable).
            others = [c for c in batch_df.columns if c not in key_cols]
            src = (
                batch_df.groupBy(*key_cols)
                .agg(F.min(F.struct(*others)).alias("_row"))
                .select(*key_cols, "_row.*")
            )
        catalog.merge_upsert(src, table, key_cols, n_buckets=n_buckets)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
