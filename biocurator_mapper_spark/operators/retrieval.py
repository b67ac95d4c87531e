"""Lexical retrieval: BM25 scoring over the document corpus.

Entity linking at web scale wants a cheap lexical candidate generator next
to the vector path (J5) and the dictionary scan (J6); BM25 is the standard
one. Design for oracle-exactness and scale:

- corpus statistics (N, average doc length, per-term document frequencies)
  are computed in ONE aggregate job and inlined into the scoring
  expression as literals — the idf logs are taken DRIVER-side in Python so
  no engine's ``ln`` implementation enters the comparison;
- the score is a FIXED left-to-right chain of double ops per query term
  (query terms are a handful), so any engine evaluating the same tree gets
  bit-identical doubles;
- top-k is ``orderBy(score desc).limit(k)``, which Spark executes as
  TakeOrderedAndProject — a per-partition heap + driver merge, NOT a
  global sort.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    # the SAME tokenizer as the dedup/shingle family — imported, not
    # re-implemented, so the two can never drift
    from .dedup import tokens_expr

    return tokens_expr(text)


def bm25_stats(
    docs: DataFrame, text_col: str, query_terms: list[str]
) -> tuple[int, float, dict[str, int]]:
    """(N, avgdl, df-per-term) in one aggregate pass."""
    toks = _tokens(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(toks)).alias("_dl"),
        *[
            F.sum(
                F.when(F.array_contains(toks, F.lit(t)), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ]
    row = docs.agg(*aggs).collect()[0]
    n = int(row["_n"])
    # sum() over an all-NULL-text corpus aggregates to NULL → treat as 0
    avgdl = (int(row["_dl"] or 0) / n) if n else 0.0
    dfs = {t: int(row[f"_df_{i}"]) for i, t in enumerate(query_terms)}
    return n, avgdl, dfs


def bm25_idf(n: int, df: int) -> float:
    """Robertson-Sparck-Jones idf with the +1 floor (Lucene's form)."""
    return math.log((n - df + 0.5) / (df + 0.5) + 1.0)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by BM25.

    Returns (id, score) ordered score desc / id asc. The per-term
    contributions add in query-term order (fixed fold — oracle-exact).
    """
    n, avgdl, dfs = bm25_stats(docs, text_col, query_terms)
    toks = _tokens(F.col(text_col))
    dl = F.size(toks).cast("double")
    def _tf(term: str) -> Column:
        # NB: a two-arg filter lambda would receive (element, INDEX) — the
        # default-arg closure trick silently binds the index instead
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")

    score: Column = F.lit(0.0)
    for t in query_terms:
        idf = bm25_idf(n, dfs[t])
        tf = _tf(t)
        # avgdl can be 0 (rows exist but no ascii-alnum tokens) — ANSI
        # mode would abort the job with DIVIDE_BY_ZERO; with dl also 0 in
        # that case, any positive stand-in yields the same 0 tf term
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl or 1.0)
        )
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0) / denom)
    return (
        docs.select(F.col(id_col), score.alias("score"))
        .where(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
