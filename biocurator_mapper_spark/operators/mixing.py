"""Token-budget mixture planning — how many epochs of each source a
training run takes.

Given per-source corpus sizes (token counts), relative mixture weights,
and a total token budget, compute the per-source plan a dataloader
executes: ``target_tokens`` (the source's share of the budget),
``full_epochs`` (whole passes over the source), and ``remainder_tokens``
(the partial final pass, drawn as a deterministic sample). This is the
LLaMA/Dolma-style "data mixing" arithmetic, kept ENTIRELY in integers —
weights are relative integer parts and shares use floor division, so any
engine reproduces the plan bit-for-bit (no float epoch fractions).

Physical shape (100 TB): ONE map-side-combined aggregation over the
corpus (sum of a token-count column per source) joined against a
weights relation of |sources| rows — the plan itself is dimension-sized.
The corpus is touched once, for the sum.

Reference parity: the reference processes one ontology at a time and has
no mixture surface (/root/reference/app/config.py); this extends the
training-data tier (SURVEY.md §2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dims import local_dim_df


def epoch_plan(
    df: DataFrame,
    source_col: str,
    token_count_col: str,
    weights: dict[str, int],
    token_budget: int,
) -> DataFrame:
    """One row per source in ``weights``:

    (source, n_docs, n_tokens, weight, target_tokens, full_epochs,
    remainder_tokens)

    where ``target_tokens = token_budget * weight // sum(weights)``,
    ``full_epochs = target_tokens // n_tokens`` and ``remainder_tokens =
    target_tokens % n_tokens`` (0 epochs + remainder = subsample; >1 = the
    source repeats). Sources present in the corpus but absent from
    ``weights`` get weight 0 (excluded but still reported); weighted
    sources missing from the corpus surface with n_tokens 0 so a typo'd
    mixture fails loudly rather than silently dropping its share.
    """
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("sum of weights must be > 0")

    spark = df.sparkSession
    wdf = local_dim_df(
        spark, [(s, int(w)) for s, w in weights.items()], "source string, weight long"
    )
    sums = (
        df.select(
            F.col(source_col).alias("source"),
            F.col(token_count_col).cast("long").alias("_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
    )
    # full outer: corpus-only sources report weight 0; weight-only sources
    # report n_tokens 0 (their target still computes — the loud failure)
    j = sums.join(F.broadcast(wdf), "source", "full_outer").select(
        "source",
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("weight"), F.lit(0)).cast("long").alias("weight"),
    )
    # integer DIV keeps the arithmetic exact on BIGINTs (double division
    # would drift for petabyte-scale budgets); requires
    # token_budget * max(weight) < 2^63 — assert the cheap driver-side form
    if int(token_budget) * max(weights.values(), default=0) >= 1 << 63:
        raise ValueError("token_budget * max(weight) must stay below 2^63")
    j = j.withColumn(
        "target_tokens",
        F.expr(f"CAST(({int(token_budget)} * weight) DIV {wsum} AS BIGINT)"),
    )
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        "target_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("target_tokens DIV n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("full_epochs"),
        F.when(
            F.col("n_tokens") > 0, F.col("target_tokens") % F.col("n_tokens")
        )
        .otherwise(F.col("target_tokens"))
        .cast("long")
        .alias("remainder_tokens"),
    )
