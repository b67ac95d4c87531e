"""Skew-aware aggregation and join helpers (north rule: head-domain skew).

Web corpora have Zipfian hosts: a handful of head domains own a huge share
of pages. A plain ``groupBy(host)`` sends every row of a head domain to one
reducer; these helpers spread that work:

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (key, salt ∈ [0, S)) so a hot key's rows land on S reducers; phase 2
  merges the S partials per key (tiny). For algebraic aggregates
  (count/sum/min/max) the result is identical to the direct groupBy.
  NOTE: Spark's hash aggregate already does map-side partial combine, which
  covers most skew for these aggregates — salting matters when phase-1
  cardinality explodes past what partial aggregation absorbs (e.g. many
  distinct groups per partition, or collect-type aggregates);
- ``salted_join``: replicate the small side S× with a salt column and salt
  the big side's key randomly — a hot join key spreads over S tasks. With
  AQE skew-join enabled this is rarely needed explicitly; kept for plans
  where AQE can't see the skew (e.g. pre-AQE checkpoints).

Salts derive from a deterministic hash of the full row key (not rand()), so
re-runs partition identically — required for checkpoint/resume idempotency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[Column], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max}; count follows SQL COUNT(col) semantics (nulls
    skipped), matching the direct groupBy equivalent. The salt hashes
    ``salt_on`` (default: ALL columns — a hot key's rows spread unless they
    are fully identical, in which case collapsing them early is free).
    """
    mergers = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt_src = salt_on or list(df.columns)
    salted = df.withColumn(
        "_salt", deterministic_salt([F.col(c) for c in salt_src], n_salts)
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[
            getattr(F, fn)(F.col(src)).alias(f"_p_{out}")
            for out, (src, fn) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, mergers[fn])(F.col(f"_p_{out}")).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: the small side is replicated
    ``n_salts``× and the big side's rows scatter deterministically.

    Only inner/left are meaningful: right/full outer would surface each
    unmatched small-side key once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    big_salted = big.withColumn(
        "_salt", deterministic_salt([F.col(c) for c in big.columns], n_salts)
    )
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")
