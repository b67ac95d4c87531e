"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the triples table is joined against page-keyed tables (quality
scores, dedup verdicts, re-crawl diffs) over and over. Writing BOTH sides
bucketed by the join key (``bucketBy(N, key)`` + ``sortBy``) lets every
subsequent sort-merge join run with ZERO exchange — each task reads the
matching bucket file pair. The bucket count is fixed at write time, so
pick it for the LARGE side's target task size (SURVEY §6 sizing notes);
256 matches the triple sink's ``part_bucket`` width.

This is the Spark-native analog of the Iceberg ``bucket(256, url)``
partition transform named in SURVEY §2 S9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 256


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a session-catalog table bucketed (and sorted) by key.

    Bucketing metadata only survives through ``saveAsTable`` — a plain
    ``.parquet(path)`` write silently drops it.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst plans a
    sort-merge join with no Exchange on either side."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), key, how
    )
