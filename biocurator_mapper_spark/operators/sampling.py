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

from ..functions.dims import local_dim_df

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


DEFAULT_MAX_STRATA = 100_000


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    target_rows: int,
    max_strata: int = DEFAULT_MAX_STRATA,
) -> dict[str, int]:
    """Per-stratum integer hash thresholds for temperature-``alpha`` mixture
    sampling (XLM-R style): stratum s with n_s rows gets sampling mass
    q_s ∝ n_s^alpha, i.e. an expected ``target_rows · q_s`` keep budget,
    as a keep-fraction min(1, budget/n_s) quantized onto the 16-bit hash
    space. alpha=1 reproduces the corpus mixture; alpha→0 flattens toward
    uniform-over-strata (upsampling the tail is out of scope — fractions
    cap at 1).

    The stratum table is DIMENSION-sized (sources/domains, not rows):
    one corpus aggregate collapses to ≤``max_strata`` rows collected
    driver-side — the IVF-centroid pattern — so the thresholds are plain
    Python floats→ints and the engine-side filter is integer-exact
    (pow() never crosses an engine boundary; libm rounding can't flip a
    row)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .limit(max_strata + 1)
        .collect()
    )
    if len(counts) > max_strata:
        raise ValueError(
            f"more than {max_strata} strata — thresholds would not be "
            "dimension-sized; raise max_strata deliberately or pre-bucket"
        )
    # deterministic iteration order (hash-agg output order is not); NULL
    # strata sort first via the (is-None, value) key — a bare sorted()
    # would TypeError comparing None with str, and silently dropping the
    # NULL stratum would contradict _id_hash's explicit NULL handling
    n_by = sorted(
        ((r[strata_col], r["_n"]) for r in counts),
        key=lambda kv: (kv[0] is not None, kv[0] if kv[0] is not None else ""),
    )
    return thresholds_from_counts(n_by, alpha, target_rows)


def thresholds_from_counts(
    n_by: list[tuple[str, int]], alpha: float, target_rows: int
) -> dict[str, int]:
    """The pure threshold math, shared by the Spark path and the DuckDB
    oracle generator so the two can never drift (all floating point happens
    HERE, once, in one interpreter; engines only compare integers)."""
    weights = [(s, float(n) ** alpha) for s, n in n_by]
    total_w = sum(w for _, w in weights) or 1.0
    out: dict[str | None, int] = {}
    for (s, n), (_, w) in zip(n_by, weights):
        budget = target_rows * (w / total_w)
        frac = min(1.0, budget / n)
        out[s] = int(frac * HASH_SPACE + 0.5)
    return out


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float,
    target_rows: int,
    max_strata: int = DEFAULT_MAX_STRATA,
) -> DataFrame:
    """Deterministic temperature-mixture sample: rows whose id hash falls
    under their stratum's :func:`temperature_fractions` threshold. A pure
    narrow filter after one dimension-sized aggregate — same resume/oracle
    properties as :func:`stratified_sample`.

    Few strata inline as a CASE chain; past ``_MAX_CASE_STRATA`` the
    thresholds become a broadcast-joined table instead — a CASE tree
    thousands deep overflows Catalyst's analyzer stack and costs O(strata)
    per row, while the broadcast join is depth-1 at any stratum count.
    NULL strata get their own threshold (null-safe equality)."""
    thresholds = temperature_fractions(
        df, strata_col, alpha, target_rows, max_strata
    )
    items = sorted(
        thresholds.items(),
        key=lambda kv: (kv[0] is not None, kv[0] if kv[0] is not None else ""),
    )
    if len(items) <= _MAX_CASE_STRATA:
        thresh = F.lit(0)
        for s, t in items:
            cond = (
                F.col(strata_col).isNull()
                if s is None
                else F.col(strata_col) == s
            )
            thresh = F.when(cond, F.lit(t)).otherwise(thresh)
        return df.where(_id_hash(id_col) < thresh)
    spark = df.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    tdf = local_dim_df(
        spark,
        [(s, t) for s, t in items],
        StructType(
            [
                StructField(strata_col, df.schema[strata_col].dataType),
                StructField("_thresh", LongType()),
            ]
        ),
    )
    return (
        df.join(
            F.broadcast(tdf),
            df[strata_col].eqNullSafe(tdf[strata_col]),
            "inner",
        )
        .where(_id_hash(id_col) < F.col("_thresh"))
        .drop(tdf[strata_col])
        .drop("_thresh")
    )


_MAX_CASE_STRATA = 64


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


def quality_buckets(
    df: DataFrame,
    strata_col: str,
    score_col: str,
    id_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-stratum quality bucketing: within each stratum
    (language / source), rows split into ``n_buckets`` equal-count tiers
    by ``score_col`` — bucket 1 = best. CCNet keeps head+middle and drops
    (or down-weights) the tail; the bucket column feeds that policy and
    per-bucket mixture weights.

    ``score_col`` should be an INTEGER quality score (float scores make
    tile boundaries order-dependent across engines); ties break on id, so
    the assignment is fully deterministic and resume-stable. HIGHER score
    = better = lower bucket number.

    Physical shape: one window (ntile) per stratum — the same per-stratum
    sort CCNet itself pays (its buckets are perplexity-ORDER statistics,
    not fixed thresholds). Strata are language×source shards, so the
    partitions are many and bounded; a skewed mega-stratum is the caller's
    cue to bucket on a coarser integer score histogram instead.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return df.withColumn("quality_bucket", F.ntile(n_buckets).over(w))
