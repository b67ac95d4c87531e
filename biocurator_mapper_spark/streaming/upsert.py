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


def _orderable(dt) -> bool:
    """True when a Spark SQL type participates in ORDER BY / struct-min —
    everything except MapType (recursively: an array of maps or a struct
    holding a map is just as unorderable)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


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
    (latest wins, ties broken deterministically by the ORDERABLE non-key
    columns) when given, else the row winning a deterministic sort over
    those same columns (so a replayed batch commits identical content).
    Non-orderable columns (maps, recursively) are excluded from direct
    sort keys — they would throw at runtime — but a final
    ``xxhash64(to_json(struct(payload)))`` tiebreak covers them, so the
    committed winner is always a pure function of row content.
    ``trigger`` is passed to ``writeStream.trigger`` — default
    ``{"availableNow": True}`` drains what exists and stops (batch-style
    catch-up); pass e.g. ``{"processingTime": "1 minute"}`` for a
    long-lived continuous sink. Returns the started query (caller awaits
    termination)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # dropDuplicates picks a partitioning-dependent winner — a
        # replayed batch could commit different content. A row_number
        # window over a deterministic sort keeps merge replay idempotent.
        # Sort keys must be ORDERABLE: a map column (recursively) throws,
        # so such columns ride along as payload instead of sort keys.
        tiebreak = [
            F.asc(f.name)
            for f in batch_df.schema.fields
            if f.name not in key_cols
            and f.name != order_col
            and _orderable(f.dataType)
        ]
        lead = [F.desc(order_col)] if order_col is not None else []
        # Final tiebreak: a content hash over ALL non-key payload columns
        # (to_json handles the map-typed ones sort keys must exclude), so
        # the winner is a function of row CONTENT, never of partition
        # order — a replayed micro-batch commits identical rows even when
        # every orderable column ties or the payload is all maps.
        non_key = [
            f.name for f in batch_df.schema.fields if f.name not in key_cols
        ]
        content_hash = (
            [F.asc(F.xxhash64(F.to_json(F.struct(*non_key))))] if non_key else []
        )
        # row_number requires ≥1 sort key; key-only tables fall back to the
        # (constant) keys — legal, and every row is identical anyway
        order = [*lead, *tiebreak, *content_hash] or [
            F.asc(c) for c in key_cols
        ]
        w = Window.partitionBy(*key_cols).orderBy(*order)
        src = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        catalog.merge_upsert(src, table, key_cols, n_buckets=n_buckets)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
