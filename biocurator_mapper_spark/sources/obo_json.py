"""Ontology source: OBO-graph JSON → node DataFrame (SURVEY §2 S2/S3).

The reference downloads the ontology over HTTP and ``json.loads`` the whole
file on one process (``app/main.py:172-216,502-504``). Here ingest is a
schema'd ``spark.read.json`` — multiLine (one big document per file), explicit
schema (no inference pass), malformed nodes become nulls and are dropped by
the parser's required-field filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ontology.schema import OBO_GRAPH_SCHEMA


def read_obo_graph(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(OBO_GRAPH_SCHEMA).option("multiLine", "true").json(path)


def obo_graph_from_dict(spark: SparkSession, doc: dict) -> DataFrame:
    """Test/fixture path: a parsed OBO dict → same shape as read_obo_graph."""
    import json

    return spark.read.schema(OBO_GRAPH_SCHEMA).json(
        spark.sparkContext.parallelize([json.dumps(doc)], 1)
    )
