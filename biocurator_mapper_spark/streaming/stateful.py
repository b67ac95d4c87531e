"""Custom stateful streaming operator: per-host crawl accounting.

Demonstrates the engine's stateful-stream surface
(``applyInPandasWithState``): a running per-host page counter + byte total
maintained across micro-batches (the streaming analog of the reference's
in-memory progress stores, ``app/main.py:45-51`` — but partitioned,
fault-tolerant state instead of process memory).

State schema: (n_pages long, n_bytes long). Emits one row per host per
micro-batch with the UPDATED running totals. Timeouts are disabled — crawl
accounting never expires; a TTL variant would pass GroupStateTimeout
.ProcessingTimeTimeout and set state.setTimeoutDuration.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import with_url_host
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_pages", LongType()), StructField("n_bytes", LongType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("n_pages", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _update_host_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_pages, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_bytes += int(pdf["page_bytes"].sum())
    state.update((n_pages, n_bytes))
    yield pd.DataFrame({"host": [key[0]], "n_pages": [n_pages], "n_bytes": [n_bytes]})


def host_stats_stream(pages_stream: DataFrame) -> DataFrame:
    """pages stream → running (host, n_pages, n_bytes) updates.

    Input needs url + either html (bytes counted) or text. Head-domain skew
    is inherent here (the state key IS the host) — state for a hot host is
    one entry, not one row per page, so the skew cost is bounded by update
    traffic, which Spark hash-partitions across the cluster.
    """
    with_host = pages_stream.select(
        with_url_host(F.col("url")).alias("host"),
        F.coalesce(
            F.length(F.col("html")).cast("long"),
            F.length(F.col("text")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("page_bytes"),
    )
    return with_host.groupBy("host").applyInPandasWithState(
        _update_host_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
