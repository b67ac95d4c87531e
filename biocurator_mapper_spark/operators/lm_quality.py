"""Character-LM quality scoring — the CCNet-style "does this look like
language" signal for pretraining corpora.

A document's quality score is the average smoothed conditional
probability of its character trigrams, P(c₃ | c₁c₂) = count(c₁c₂c₃) /
(count(c₁c₂·) + V), under a model trained on a (reference) corpus with one
hash aggregate (V = 37, the [a-z0-9 ] charset — additive smoothing; raw
MLE would score any UNIQUE context 1.0, rewarding line noise for being
unlike everything else). Natural prose re-uses frequent trigrams in
frequent contexts and scores high; gibberish, binary spew and
wrong-charset text score low.
CCNet uses a 5-gram KenLM over wiki text for the same job; the trigram MLE
keeps the model dimension-sized (≤ ~50k rows over [a-z0-9 ] — broadcast at
any corpus scale) and every step SQL-expressible.

Engine-exactness (the oracle contract): per-trigram probabilities are
quantized to integers — floor(1e6 · tri/ctx + 0.5) — and SUMMED as
integers (order-independent), so the only floating-point steps are one
division and one multiply per distinct (tri, ctx) pair plus one final
division per doc: bit-identical in any IEEE engine, no fold-order terms.

Scale shape: model = one explode + one hash aggregate over the training
corpus (map-side combine); scoring = explode + broadcast join + one hash
aggregate keyed on the doc id. Nothing corpus-sized shuffles except
(id, trigram) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LM_QUANT = 1_000_000
LM_VOCAB = 37  # |[a-z0-9 ]| — the additive-smoothing denominator term


def _norm_text(text: Column) -> Column:
    """Lowercase, collapse every non-[a-z0-9] run to one space, and pad
    with one leading/trailing space so word boundaries carry signal."""
    collapsed = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.concat(F.lit(" "), collapsed, F.lit(" "))


def char_trigrams_expr(text: Column) -> Column:
    """All overlapping character trigrams of the normalized text, with
    multiplicity, in order; empty array for texts shorter than 3 chars.

    The normalized text is bound ONCE via ``let_expr``: a lambda body
    re-evaluates every captured outer subtree per element, so referencing
    ``_norm_text(text)`` directly inside the transform re-ran the
    lowercase+regex collapse over the WHOLE document once per trigram —
    O(n²) per doc (measured 4.2 s → 0.6 s for text_lm_score at sf0.01)."""
    from ..functions.exprs import let_expr

    def _build(s: Column) -> Column:
        n = F.length(s)
        return F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2), lambda i: s.substr(i, F.lit(3))
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let_expr(_norm_text(text), _build)


def train_char_lm(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(trigram, tri_n, ctx_n) — trigram counts and their 2-char-context
    totals over the training corpus. One explode + one aggregate + a
    window-free context join (the context table is an aggregate of the
    trigram table itself)."""
    tri = (
        corpus.select(
            F.explode_outer(char_trigrams_expr(F.col(text_col))).alias("trigram")
        )
        .where(F.col("trigram").isNotNull())
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("tri_n"))
    )
    ctx = (
        tri.groupBy(F.substring("trigram", 1, 2).alias("_ctx"))
        .agg(F.sum("tri_n").alias("ctx_n"))
    )
    return (
        tri.join(ctx, F.substring(tri.trigram, 1, 2) == ctx._ctx)
        .select("trigram", "tri_n", "ctx_n")
    )


def score_with_model(
    df: DataFrame, text_col: str, model: DataFrame
) -> DataFrame:
    """df + (n_trigrams, lm_score) columns — the STATELESS per-row scorer
    (no shuffle, no aggregate state): the dimension-sized model collects
    driver-side once and rides the closure of one Arrow-batched pandas UDF,
    so the same gate drops into a streaming plan (streaming_curate) or any
    narrow batch stage. Scores are bit-identical to ``lm_quality_score``
    (same quantized-integer arithmetic, float64 either way)."""
    import re

    import pandas as pd

    probs = {
        r.trigram: int(r.tri_n / (r.ctx_n + LM_VOCAB) * LM_QUANT + 0.5)
        for r in model.collect()
    }
    splitter = re.compile(r"[^a-z0-9]+")

    # no type hints: the Series → DataFrame (struct-returning scalar) shape
    # must be declared via returnType alone — the hint checker rejects it
    def _score(texts):
        ns, scores = [], []
        for t in texts:
            s = " " + splitter.sub(" ", (t or "").lower()).strip() + " "
            n = len(s) - 2
            if n <= 0:
                ns.append(0)
                scores.append(0.0)
                continue
            total = sum(probs.get(s[i : i + 3], 0) for i in range(n))
            ns.append(n)
            scores.append(total / (n * LM_QUANT))
        return pd.DataFrame({"n_trigrams": ns, "lm_score": scores})

    score_udf = F.pandas_udf(_score, "struct<n_trigrams: bigint, lm_score: double>")
    out = df.withColumn("_lm", score_udf(F.col(text_col)))
    return out.select(*df.columns, "_lm.n_trigrams", "_lm.lm_score")


def lm_quality_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
) -> DataFrame:
    """(id, n_trigrams, lm_score) per doc — lm_score is the mean quantized
    conditional trigram probability in [0, 1] (0 for empty/unscorable
    docs; unseen trigrams contribute 0, so out-of-domain text is penalized
    rather than dropped). ``model`` defaults to training on ``docs``
    itself (self-scoring: boilerplate and natural prose rank high,
    line-noise ranks low).

    When a PRE-TRAINED ``model`` is supplied the stateless broadcast scorer
    (:func:`score_with_model`) answers directly — zero corpus shuffles (the
    model rides a pandas-UDF closure; the plan is scan → project), vs the
    explode→broadcast-join→aggregate path the self-training case needs.
    The two paths are bit-identical per row (same quantized-integer
    arithmetic, pinned in tests).

    Contract note: ``id_col`` is expected unique (every caller keys docs by
    id). If duplicates exist, the model-supplied path emits one row PER
    INPUT ROW where the aggregate path merges duplicate ids into one row
    with summed trigram counts — callers joining on the id downstream
    (e.g. curate()) should dedup first either way."""
    if model is not None:
        return score_with_model(docs, text_col, model).select(
            id_col, "n_trigrams", "lm_score"
        )
    return lm_score_aggregate(docs, id_col, text_col, train_char_lm(docs, text_col))


def lm_score_aggregate(
    docs: DataFrame, id_col: str, text_col: str, model: DataFrame
) -> DataFrame:
    """The explode→broadcast-join→aggregate formulation of the score —
    the self-training path (the model is a fresh aggregate of ``docs``
    itself, so a corpus pass exists anyway) and the differential twin the
    stateless scorer is pinned bit-identical against in tests."""
    rows = docs.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(char_trigrams_expr(F.col(text_col))).alias("trigram"),
    )
    # quantized per-trigram probability: TWO fp ops (divide, multiply),
    # then integer floor — engine-exact; summed as integers so partial-agg
    # order can never shift the result
    q = F.floor(
        F.col("tri_n").cast("double")
        / (F.col("ctx_n") + F.lit(LM_VOCAB))
        * F.lit(float(LM_QUANT))
        + F.lit(0.5)
    ).cast("bigint")
    scored = rows.join(F.broadcast(model), "trigram", "left").select(
        "_id",
        F.col("trigram").isNotNull().cast("int").alias("_n"),
        F.coalesce(q, F.lit(0).cast("bigint")).alias("_q"),
    )
    return scored.groupBy("_id").agg(
        F.sum("_n").cast("bigint").alias("n_trigrams"),
        (
            F.when(
                F.sum("_n") > 0,
                F.sum("_q") / (F.sum("_n") * F.lit(float(LM_QUANT))),
            ).otherwise(F.lit(0.0))
        ).alias("lm_score"),
    ).select(F.col("_id").alias(id_col), "n_trigrams", "lm_score")
