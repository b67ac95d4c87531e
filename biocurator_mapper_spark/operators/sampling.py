"""Deterministic sampling / data-mixing operators.

Training-data pipelines mix sources by recipe ("50% web, 25% news, …") and
cap runaway strata (head domains). Random sampling breaks resume-ability
(each run keeps different rows) and oracle checking; these operators hash
the ROW ID instead — the same rows are kept on every run, on every engine:

- ``stratified_sample``: per-stratum keep-fractions via an md5 threshold on
  the id (a pure filter — no shuffle, no RNG state);
- ``cap_per_stratum``: at most N rows per stratum, chosen by hash order
  (one window over the stratum — the cap for Zipfian head domains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 16  # first 4 md5 hex chars


def _id_hash(id_col: str):
    # NULL ids hash like a sentinel string instead of hashing to NULL —
    # md5(NULL) is NULL and a NULL threshold predicate silently DROPS the
    # row even from a fraction-1.0 stratum; the sentinel also makes the
    # per-stratum cap ordering deterministic for NULL-id rows
    return F.conv(
        F.substring(
            F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep ~fraction of each stratum, deterministically by id hash.
    Unlisted strata keep ``default_fraction``. A pure narrow filter."""
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.where(_id_hash(id_col) < frac * HASH_SPACE)


def cap_per_stratum(
    df: DataFrame, strata_col: str, cap: int, id_col: str
) -> DataFrame:
    """At most ``cap`` rows per stratum, selected by (id-hash, id) order —
    deterministic, resume-stable; the head-domain cap."""
    w = Window.partitionBy(strata_col).orderBy(
        _id_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )
