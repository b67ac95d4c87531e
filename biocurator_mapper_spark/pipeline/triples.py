"""The flagship job: pages → (subj, pred, obj) triples.

Spark restatement of the reference's ``POST /resolve_biocurated_data`` path
(``app/main.py:68-88``; lifecycle SURVEY §3.1), one declarative chain:

    pages ─ extract (Arrow UDF) ─ mention detect (broadcast Aho-Corasick)
          ─ embed passage (Arrow UDF) ─ score candidates (JVM cosine)
          ─ top-k window ─ rerank (deterministic stub / LLM adapter)
          ─ canonicalize (connected components) ─ triples

Scale notes (the plan this compiles to):
- the corpus never shuffles until the per-url top-k window; everything before
  it is narrow (extract/scan/embed are per-partition maps);
- the ontology side is *always* broadcast (surface map, term embeddings,
  canonical mapping are all ontology-sized);
- the one wide exchange hashes on ``url`` — pre-salted with the url itself as
  the key (urls are near-unique, so no hot key; head-DOMAIN skew does not
  reach the exchange because the key is the full url, not the host);
- AQE coalesces the post-window partitions.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..extract.html_text import with_extracted_text
from ..functions.embed import certainty_expr, cosine_expr, with_hash_embedding
from ..operators.canonicalize import canonical_mapping
from ..operators.mentions import build_surface_map, mention_candidates
from ..operators.rerank import rerank_best_match
from ..sources.catalog import ParquetCatalog

DEFAULT_K = 5  # reference app/config.py:10
TRIPLE_BUCKETS = 256  # bucket(url) partition transform width


def build_triples(
    pages: DataFrame,
    terms: DataFrame,
    k: int = DEFAULT_K,
    pred_suffix: str = "mapped_to",
    n_buckets: int = TRIPLE_BUCKETS,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) × terms → triples DataFrame.

    Pure plan construction — no actions, no writes. Output schema per
    FIXTURES.md §5.
    """
    terms = terms.cache()

    # 1. EXTRACT (P14): html → text; rows with no html fall back to the
    #    provided text column when present.
    has_text = "text" in pages.columns
    extracted = with_extracted_text(pages).withColumn(
        "passage",
        F.coalesce(
            F.nullif(F.col("extracted_text"), F.lit("")),
            F.col("text") if has_text else F.lit(None).cast("string"),
            F.lit(""),
        ),
    )

    # 2. MENTIONS (J6): broadcast dictionary scan → (url, passage, mention,
    #    term_id) candidate rows. Pages with zero mentions exit here (the
    #    reference returns an error response for no-candidate passages —
    #    those rows land in metrics, not triples).
    surface_map = build_surface_map(terms)
    candidates = mention_candidates(
        extracted.select("url", "warc_ts", "lang", F.col("passage").alias("extracted_text")),
        surface_map,
    )

    # 3. SCORE (M1/J5): passage embedding (Arrow UDF, one vector per url —
    #    computed pre-explode so each page embeds once) × term embedding
    #    (broadcast) → cosine + certainty, all JVM-side.
    term_vecs = with_hash_embedding(
        terms.select("term_id", "searchable_text"), "searchable_text", "term_embedding"
    ).select("term_id", "term_embedding")
    page_vecs = with_hash_embedding(
        extracted.select("url", "passage"), "passage", "page_embedding"
    ).select("url", "page_embedding")

    scored = (
        candidates.join(page_vecs, "url")
        .join(F.broadcast(term_vecs), "term_id")
        .withColumn(
            "cosine", cosine_expr(F.col("page_embedding"), F.col("term_embedding"))
        )
        .withColumn("certainty", certainty_expr(F.col("cosine")).cast("float"))
        .drop("page_embedding", "term_embedding")
    )

    # 3b. collapse to one candidate per (url, term): several surfaces of the
    #     same term must not burn top-k slots or appear as their own
    #     alternatives. Certainty is per (url, term) constant (same vectors).
    collapsed = scored.groupBy("url", "term_id").agg(
        F.max("certainty").alias("certainty"),
        F.array_sort(F.collect_set("mention")).alias("mentions"),
        F.first("warc_ts").alias("warc_ts"),
        F.first("lang").alias("lang"),
    )

    # 4. TOP-K (W1): k candidates per url, ordered by certainty (the
    #    reference's near_vector(limit=k)); deterministic tiebreak.
    w = Window.partitionBy("url").orderBy(F.desc("certainty"), F.asc("term_id"))
    topk = collapsed.withColumn("sim_rank", F.row_number().over(w)).where(
        F.col("sim_rank") <= k
    )

    # 5. RERANK (M5): one winner per url + alternatives.
    best = rerank_best_match(topk.drop("sim_rank"), terms)

    # 6. CANONICALIZE (J7): collapse alias CURIEs.
    canon = canonical_mapping(terms)
    best = (
        best.join(F.broadcast(canon), "term_id", "left")
        .withColumn("obj", F.coalesce(F.col("canonical_id"), F.col("term_id")))
    )

    # 7. TRIPLES (S9): final projection with partition lineage columns.
    return best.select(
        F.col("url").alias("subj"),
        F.concat(
            F.split(F.col("obj"), ":").getItem(0), F.lit(":"), F.lit(pred_suffix)
        ).alias("pred"),
        F.col("obj"),
        F.col("mention"),
        F.col("confidence"),
        F.col("reason"),
        F.col("alternatives"),
        F.col("certainty"),
        F.col("lang"),
        F.col("warc_ts"),
        F.to_date("warc_ts").alias("part_date"),
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("part_bucket"),
    )


class TriplesPipeline:
    """Materializing wrapper: checkpointed, resumable, metric-emitting runs.

    Mirrors the reference's operational semantics with Spark-native
    mechanisms (SURVEY §4 table):

    - `_checkpoints` commit log: one row per (run fingerprint, stage,
      part_bucket) — a re-run anti-joins completed buckets away and only
      recomputes the remainder (idempotent: bucket output is overwritten
      atomically via dynamic partition overwrite);
    - `_metrics`: per-stage row counts + elapsed, the reference's
      embedding_stats counters as table rows (app/ontology_manager.py:166-176);
    - version gate: the ontology content hash keys the run fingerprint, so a
      re-run with an unchanged ontology + input resumes instead of
      recomputing (app/ontology_version_manager.py:149-183 semantics).
    """

    def __init__(self, catalog: ParquetCatalog, n_buckets: int = 16):
        self.catalog = catalog
        self.n_buckets = n_buckets

    def run(
        self,
        pages: DataFrame,
        terms: DataFrame,
        run_fingerprint: str,
        k: int = DEFAULT_K,
    ) -> DataFrame:
        import time

        spark = pages.sparkSession
        t0 = time.monotonic()
        run_id = uuid.uuid4().hex[:12]

        pages_b = pages.withColumn(
            "part_bucket",
            F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int"),
        )

        done: list[int] = []
        log = self.catalog.read_log("_checkpoints")
        if log is not None:
            done = [
                r.part_bucket
                for r in log.where(
                    (F.col("fingerprint") == run_fingerprint)
                    & (F.col("stage") == "triples")
                    & (F.col("status") == "committed")
                )
                .select("part_bucket")
                .distinct()
                .collect()
            ]
        todo = pages_b.where(~F.col("part_bucket").isin(done)) if done else pages_b

        n_in = todo.count()
        if n_in > 0:
            triples = build_triples(
                todo.drop("part_bucket"), terms, k=k, n_buckets=self.n_buckets
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            triples.write.mode("overwrite").partitionBy("part_bucket").parquet(
                self.catalog._table_dir("triples")
            )
            n_out = spark.read.parquet(self.catalog._table_dir("triples")).count()
        else:
            n_out = 0

        elapsed = time.monotonic() - t0
        all_buckets = [
            r.part_bucket
            for r in pages_b.select("part_bucket").distinct().collect()
        ]
        ckpt_rows = [
            (run_id, run_fingerprint, "triples", int(b), "committed")
            for b in all_buckets
        ]
        if ckpt_rows:
            self.catalog.append(
                spark.createDataFrame(
                    ckpt_rows,
                    "run_id string, fingerprint string, stage string, part_bucket int, status string",
                ).withColumn("committed_ts", F.current_timestamp()),
                "_checkpoints",
            )
        metrics_rows = [
            (run_id, run_fingerprint, "triples", n_in, n_out, float(elapsed),
             float(n_in / elapsed) if elapsed > 0 else 0.0)
        ]
        self.catalog.append(
            spark.createDataFrame(
                metrics_rows,
                "run_id string, fingerprint string, stage string, rows_in long, "
                "rows_out long, elapsed_s double, rows_per_s double",
            ).withColumn("ts", F.current_timestamp()),
            "_metrics",
        )
        return spark.read.parquet(self.catalog._table_dir("triples"))
