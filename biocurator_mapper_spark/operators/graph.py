"""Graph-materialization operators over mention candidates and triples.

The reference stops at per-passage resolution (one best term per request,
``app/main.py:68-88``); a knowledge-graph FACTORY also needs the graph-side
materializations downstream consumers read:

- ``co_mention_edges``: doc-level co-occurrence edges between terms — the
  classic KG-enrichment signal (terms that appear in the same document are
  related). One mention scan + one hash aggregate on the (t1, t2) pair;
  per-doc pairing happens INSIDE the per-doc array (no self-join of the
  corpus-sized candidate relation);
- ``adjacency``: subj → sorted distinct objects (the edge-list form a graph
  engine loads);
- ``degree_stats``: per-object in-degree and distinct-subject counts (the
  sanity profile of an extraction run — a hub explosion shows up here
  before it melts a downstream join).

All pure plan builders; every aggregate has a map-side partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_mention_edges(
    pages: DataFrame,
    surface_map: DataFrame,
    text_col: str = "extracted_text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(t1, t2, n_docs) for every unordered term pair co-mentioned in at
    least ``min_count`` documents (t1 < t2).

    Plan: mention scan (broadcast automaton) → per-doc DISTINCT term array
    → in-array pair expansion (each doc contributes O(k²) pair rows for its
    OWN k terms — bounded by the ontology, never a corpus self-join) →
    hash aggregate on the pair.
    """
    from .mentions import mention_candidates

    cands = mention_candidates(pages, surface_map, text_col=text_col)
    per_doc = cands.groupBy(id_col).agg(
        F.array_sort(F.array_distinct(F.collect_list("term_id"))).alias("_terms")
    )
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_terms"),
                    lambda t, i: F.transform(
                        F.slice(
                            F.col("_terms"),
                            i + 2,
                            F.greatest(F.size("_terms") - i - 1, F.lit(0)),
                        ),
                        lambda u: F.struct(t.alias("t1"), u.alias("t2")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.t1"), F.col("p.t2"))
    return (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )


def adjacency(triples: DataFrame) -> DataFrame:
    """subj → sorted distinct objs + fan-out degree."""
    return triples.groupBy("subj").agg(
        F.array_sort(F.collect_set("obj")).alias("objs"),
    ).withColumn(
        # derive degree from the one collected set — a second
        # collect_set("obj") would build a second distinct-set aggregation
        # buffer per group (hub subjects pay twice)
        "degree", F.size("objs").cast("bigint")
    )


def degree_stats(triples: DataFrame) -> DataFrame:
    """Per-object in-degree profile: triple count + distinct subjects."""
    return triples.groupBy("obj").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
    )
