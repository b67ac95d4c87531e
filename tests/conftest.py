from __future__ import annotations

import pytest

from biocurator_mapper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="bcms-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def obo_nodes(spark):
    """All fixture sets parsed into a node DataFrame."""
    import json

    from biocurator_mapper_spark.ontology import OBO_GRAPH_SCHEMA, nodes_from_obo_graph
    from biocurator_mapper_spark.testdata import full_fixture_graph

    doc = json.dumps(full_fixture_graph(perf_n=20))
    df = spark.read.schema(OBO_GRAPH_SCHEMA).json(
        spark.sparkContext.parallelize([doc], 1)
    )
    return nodes_from_obo_graph(df).cache()


@pytest.fixture(scope="session")
def terms(obo_nodes):
    from biocurator_mapper_spark.ontology import parse_terms

    return parse_terms(obo_nodes).cache()
