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


PAGERANK_SCALE = 1_000_000_000_000  # fixed-point: 1.0 == 10^12


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration steps —
    the crawl-prioritization / page-quality signal (host- or page-level
    link graph), in FIXED-POINT INTEGER arithmetic so any engine
    reproduces every rank bit-for-bit.

    Ranks are BIGINTs scaled by ``PAGERANK_SCALE`` (1.0 == 10¹²). One
    step, with d = damping_pct/100 kept rational:

        rank'(v) = SCALE·(100−d)/100  +  d · Σ_{u→v} (rank(u) DIV deg(u)) DIV 100

    Integer DIV truncates exactly the same everywhere (Spark ``DIV`` ≡
    DuckDB ``//``), so there is no float drift to reconcile — the oracle
    unrolls the same recurrence. Dangling nodes (no out-edges) keep their
    damped base mass and leak the rest — the classic simplification,
    documented rather than silently redistributed; at web scale the
    dangling-mass correction is a separate scalar aggregate a caller can
    add.

    Physical shape (100 TB): per iteration, one join of the edge relation
    against the node-sized rank relation on src (both hash-partitioned on
    the same key — the exchange on edges is reused across iterations once
    AQE materializes it) + one hash aggregate on dst with map-side
    partials. Ranks ``localCheckpoint`` each iteration: the plan would
    otherwise double per step and overflow the analyzer (the connected-
    components lesson).

    Self-loops contribute to their own rank; duplicate edges count with
    multiplicity (multigraph semantics — dedup first if unwanted).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    base = (PAGERANK_SCALE * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(PAGERANK_SCALE).cast("long").alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .join(deg, "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr("rank DIV _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST(({damping_pct} * coalesce(_in, 0)) DIV 100 AS BIGINT)"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
