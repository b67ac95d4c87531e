"""One-pass table profiling — the data-quality summary every ingest job
runs before trusting a new corpus drop (deequ/dbt-style): per column, the
row count, null count, exact distinct count, and min/max.

One aggregate job over the table: Spark compiles the N ``countDistinct``s
into a single EXPAND + hash-aggregate pass (each input row fans out once
per distinct-counted column — cost N× map rows, still one shuffle, partial
aggs intact). For 100 TB profiling where exact distinct is overkill, pass
``approx=True`` to swap in ``approx_count_distinct`` (HLL — constant
memory, not oracle-comparable across engines, so the contract query pins
the exact form).

The single wide result row is unpivoted driver-free (explode over an
inline struct array) into one tidy row per column. min/max are cast to
string AFTER aggregation so numeric ordering applies but the output schema
is column-type-agnostic.

Reference parity: none (the reference trusts its inputs); training-data
extension surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, computed in ONE aggregate pass."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            distinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.col(f"_nulls_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("_s")).select("_s.*")
