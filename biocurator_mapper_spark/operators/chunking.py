"""Document chunking: token-window chunks with overlap.

The pre-embedding step of every large-scale retrieval / training pipeline
(the reference embeds whole ontology-term texts — ``do_embeddings.py``
truncates at 8000 chars; web pages need the sliding-window generalization):
split each document into ``chunk_tokens``-token windows advancing by
``chunk_tokens - overlap``, so consecutive chunks share ``overlap`` tokens
of context.

Scale shape: one narrow projection per row (tokenize once, slice per
window) followed by an explode — no shuffle at all; output size is bounded
by ``n_tokens / stride`` rows per doc. Chunk ids are (doc id, chunk_no), so
downstream embedding / ANN stages key on them without any global
coordination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_struct_array(
    text: Column, chunk_tokens: int = 256, overlap: int = 64
) -> Column:
    """array<struct<chunk_no, chunk_text, n_tokens>> for one document.

    Integer-exact window math (floor division, 1-based slice) so a SQL
    oracle reproduces it verbatim: ``n_chunks = 1 + max(0,
    ceil((n - chunk_tokens) / stride))`` and window *i* covers tokens
    ``[i*stride + 1, i*stride + chunk_tokens]`` (the last window may be
    shorter). Empty/whitespace-only text → empty array.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from ..functions.exprs import let_expr

    stride = chunk_tokens - overlap

    # the token array is bound once via let_expr: a lambda body re-runs
    # every captured outer subtree per element, so referencing the raw
    # tokenize chain inside the per-chunk lambda would re-split the text
    # once per WINDOW per row
    def _build(toks: Column) -> Column:
        n = F.size(toks)
        # integer ceil((n - chunk)/stride) without doubles
        extra = F.greatest(
            (n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride),
            F.lit(0),
        ).cast("int")
        n_chunks = F.when(n > 0, extra + 1).otherwise(F.lit(0))
        return F.when(
            n_chunks > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("bigint").alias("chunk_no"),
                    F.array_join(
                        F.slice(toks, i * stride + 1, chunk_tokens), " "
                    ).alias("chunk_text"),
                    F.least(F.lit(chunk_tokens), n - i * stride)
                    .cast("bigint")
                    .alias("n_tokens"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<chunk_no:bigint,chunk_text:string,n_tokens:bigint>>"
            )
        )

    return let_expr(F.filter(F.split(text, r"\s+"), lambda t: t != ""), _build)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """docs → (id, chunk_no, chunk_text, n_tokens) rows, one per window.

    The chunk array materializes in its own projection (single tokenize +
    slice pass per row) and explodes in the next — a narrow, shuffle-free
    plan that scales with input splits.
    """
    # explode_OUTER + isNotNull on the generated attribute: plain explode
    # triggers InferFiltersFromGenerate, whose size(arr)>0 filter
    # re-evaluates the whole tokenize/slice chain per row
    return (
        docs.withColumn(
            "_chunks", chunk_struct_array(F.col(text_col), chunk_tokens, overlap)
        )
        .select(F.col(id_col), F.explode_outer("_chunks").alias("_c"))
        .where(F.col("_c").isNotNull())
        .select(
            id_col,
            F.col("_c.chunk_no").alias("chunk_no"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
    )
