"""Batched model-call layer: retry, backoff, rate limiting, caching (M1–M7).

Reimplements the operational semantics of the reference's OpenAI client
(``app/openai_client.py``) inside the Arrow-batch UDF layer — the only place
they belong on a cluster (Spark task retries are too coarse: one flaky call
must not recompute a whole partition):

- batching: texts are embedded per Arrow batch
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` = the reference's
  batch_size 100, embeddings_config.yaml:11);
- retry/backoff: per-call retry with ``min(delay * 2**n, 60)`` exponential
  backoff (openai_client.py:183-187) and the reference's retryable-error
  classifier (rate limit / timeout / 5xx retry; auth / 4xx fail fast,
  openai_client.py:120-160);
- rate limiting: a per-executor token bucket (delay between calls,
  embeddings_config.yaml:60) — cluster-wide rate = executors × bucket rate;
- caching: an ``_embedding_cache`` table keyed by sha2(text) makes reruns
  free (the reference's version-hash memoization, generalized per text).

The default provider is the deterministic hash embedder; a real HTTP
provider plugs in via ``EMBED_PROVIDERS`` without changing plan shape.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.embed import EMBED_DIM, EMBED_MODEL_STUB, hash_embed_py
from ..sources.catalog import ParquetCatalog

RETRYABLE_MARKERS = (
    "rate limit", "429", "timeout", "timed out", "connection", "temporarily",
    "500", "502", "503", "504", "server error",
)
NON_RETRYABLE_MARKERS = ("invalid api key", "authentication", "401", "403", "400")


def is_retryable_error(message: str) -> bool:
    """Substring heuristics matching the reference's classifier
    (openai_client.py:120-160): auth/4xx fail fast, transient retries."""
    m = message.lower()
    if any(s in m for s in NON_RETRYABLE_MARKERS):
        return False
    return any(s in m for s in RETRYABLE_MARKERS)


def _stub_provider(texts: list[str]) -> list[list[float]]:
    return [hash_embed_py(t) for t in texts]


EMBED_PROVIDERS: dict[str, Callable[[list[str]], list[list[float]]]] = {
    EMBED_MODEL_STUB: _stub_provider,
}


class RetryingEmbedder:
    """Executor-side callable with retry/backoff/rate limiting."""

    def __init__(
        self,
        provider: str = EMBED_MODEL_STUB,
        max_retries: int = 3,
        base_delay: float = 0.1,
        max_delay: float = 60.0,
        rate_limit_delay: float = 0.0,
        provider_fn: Callable[[list[str]], list[list[float]]] | None = None,
    ):
        self.provider = provider
        # dynamically registered providers live in the DRIVER's registry;
        # executors run forked workers with a fresh module, so the resolved
        # callable must travel in the closure (provider_fn), not by name
        self.provider_fn = provider_fn
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.rate_limit_delay = rate_limit_delay
        self._last_call = 0.0
        self.retry_count = 0

    def __call__(self, texts: list[str]) -> list[list[float]]:
        fn = self.provider_fn or EMBED_PROVIDERS[self.provider]
        if self.rate_limit_delay > 0:
            wait = self._last_call + self.rate_limit_delay - time.monotonic()
            if wait > 0:
                time.sleep(wait)
        attempt = 0
        while True:
            try:
                self._last_call = time.monotonic()
                return fn(texts)
            except Exception as e:  # noqa: BLE001 — classified below
                if attempt >= self.max_retries or not is_retryable_error(str(e)):
                    raise
                delay = min(self.base_delay * (2**attempt), self.max_delay)
                time.sleep(delay)
                attempt += 1
                self.retry_count += 1


def preflight_check(provider: str = EMBED_MODEL_STUB) -> bool:
    """M7 health check: a 1-text probe on the driver before submitting
    stages (reference openai_client.py:97-118) — catches bad credentials /
    dead endpoints without burning cluster time."""
    try:
        out = EMBED_PROVIDERS[provider](["health check"])
        return bool(out) and len(out[0]) > 0
    except Exception:
        return False


EMBED_RESULT_SCHEMA_FIELDS = [
    StructField("embedding", ArrayType(FloatType())),
    StructField("token_count", IntegerType()),
    StructField("model", StringType()),
]


def embed_with_cache(
    df: DataFrame,
    text_col: str,
    catalog: ParquetCatalog | None = None,
    cache_table: str = "_embedding_cache",
    provider: str = EMBED_MODEL_STUB,
    out_col: str = "embedding",
) -> DataFrame:
    """+ embedding column, reusing cached vectors by sha2(text).

    Cache hits join in (broadcast if small); only misses reach the provider
    UDF; new vectors are appended back to the cache log. token_count is the
    whole-batch apportionment the reference performs
    (openai_client.py:276-284): tokens // len(texts) per text — whitespace
    token count in the stub.
    """
    # NULL text hashes like '' so the cache join key is never NULL (NULL
    # keys never equi-join → the embedded row would silently drop)
    df = df.withColumn(
        "_text_hash", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    cache = catalog.read_log(cache_table) if catalog is not None else None

    if cache is not None:
        # cache key is (text_hash, model): vectors embedded by a different
        # provider must never be served for the same text
        cache = cache.where(F.col("model") == provider).select(
            F.col("text_hash").alias("_text_hash"),
            F.col("embedding").alias("_cached_vec"),
        ).dropDuplicates(["_text_hash"])
        df = df.join(cache, "_text_hash", "left")
    else:
        df = df.withColumn("_cached_vec", F.lit(None).cast(ArrayType(FloatType())))

    misses = df.where(F.col("_cached_vec").isNull())
    hits = df.where(F.col("_cached_vec").isNotNull())

    out_schema = StructType(
        [StructField("_text_hash", StringType()), *EMBED_RESULT_SCHEMA_FIELDS]
    )

    provider_fn = EMBED_PROVIDERS[provider]  # resolve driver-side (see init)

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embedder = RetryingEmbedder(provider=provider, provider_fn=provider_fn)
        for pdf in batches:
            texts = ["" if t is None else t for t in pdf[text_col]]
            vecs = embedder(texts)
            total_tokens = sum(len(t.split()) for t in texts)
            per_text = total_tokens // max(len(texts), 1)
            yield pd.DataFrame(
                {
                    "_text_hash": pdf["_text_hash"],
                    "embedding": vecs,
                    "token_count": [per_text] * len(texts),
                    "model": [provider] * len(texts),
                }
            )

    fresh = (
        misses.select("_text_hash", text_col)
        .dropDuplicates(["_text_hash"])
        .mapInPandas(_embed, out_schema)
    )
    if catalog is not None:
        catalog.append(
            fresh.select(
                F.col("_text_hash").alias("text_hash"),
                "embedding",
                "token_count",
                "model",
            ).withColumn("cached_ts", F.current_timestamp()),
            cache_table,
        )
        # re-read so the plan below consumes materialized vectors, not a
        # second provider invocation
        cache_log = catalog.read_log(cache_table)
        if cache_log is None:
            # zero-row first call: the append wrote no files so there is no
            # cache to re-read — and with no prior cache every row was a
            # miss, so the output is empty (correct schema, zero rows)
            return (
                df.drop("_cached_vec")
                .withColumn(out_col, F.lit(None).cast(ArrayType(FloatType())))
                .drop("_text_hash")
                .where(F.lit(False))
            )
        fresh = (
            cache_log
            .where(F.col("model") == provider)
            .select(F.col("text_hash").alias("_text_hash"), "embedding")
            .dropDuplicates(["_text_hash"])
        )
    missed_joined = misses.drop("_cached_vec").join(
        fresh.select("_text_hash", F.col("embedding").alias("_new_vec")),
        "_text_hash",
        "left",
    ).withColumn(out_col, F.col("_new_vec")).drop("_new_vec")
    hit_joined = hits.withColumn(out_col, F.col("_cached_vec")).drop("_cached_vec")
    return missed_joined.unionByName(hit_joined).drop("_text_hash")
