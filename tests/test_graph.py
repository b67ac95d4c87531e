"""Graph-materialization operators: co-mention edges, adjacency, degrees."""

from __future__ import annotations

from pyspark.sql import functions as F

from biocurator_mapper_spark.operators.graph import (
    adjacency,
    co_mention_edges,
    degree_stats,
)


def test_co_mention_edges_counts_unordered_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # A,B co-occur (gamma isn't a surface)
            (2, "alpha beta"),  # A,B again
            (3, "alpha delta"),  # A,D
            (4, "alpha"),  # no pair
            (5, "beta alpha"),  # order-insensitive: still (A,B)
        ],
        "doc_id int, extracted_text string",
    )
    sm = spark.createDataFrame(
        [("alpha", "T:A", True), ("beta", "T:B", True), ("delta", "T:D", True)],
        "surface string, term_id string, is_exact boolean",
    )
    got = {(r.t1, r.t2): r.n_docs for r in co_mention_edges(docs, sm).collect()}
    assert got == {("T:A", "T:B"): 3, ("T:A", "T:D"): 1}
    # min_count prunes singletons
    got2 = {
        (r.t1, r.t2): r.n_docs
        for r in co_mention_edges(docs, sm, min_count=2).collect()
    }
    assert got2 == {("T:A", "T:B"): 3}


def test_co_mention_three_terms_all_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta delta")], "doc_id int, extracted_text string"
    )
    sm = spark.createDataFrame(
        [("alpha", "T:A", True), ("beta", "T:B", True), ("delta", "T:D", True)],
        "surface string, term_id string, is_exact boolean",
    )
    got = {(r.t1, r.t2) for r in co_mention_edges(docs, sm).collect()}
    assert got == {("T:A", "T:B"), ("T:A", "T:D"), ("T:B", "T:D")}


def test_adjacency_and_degree_stats(spark):
    triples = spark.createDataFrame(
        [
            ("u1", "GO:1"),
            ("u1", "GO:2"),
            ("u2", "GO:1"),
            ("u2", "GO:1"),  # duplicate edge: adjacency dedupes, degree counts
        ],
        "subj string, obj string",
    )
    adj = {r.subj: (r.objs, r.degree) for r in adjacency(triples).collect()}
    assert adj == {"u1": (["GO:1", "GO:2"], 2), "u2": (["GO:1"], 1)}
    deg = {r.obj: (r.n_triples, r.n_subjects) for r in degree_stats(triples).collect()}
    assert deg == {"GO:1": (3, 2), "GO:2": (1, 1)}
