from .fixtures import (
    comprehensive_obo_graph,
    edge_case_obo_graph,
    malformed_obo_graph,
    performance_obo_graph,
    full_fixture_graph,
)
from .pages_gen import generate_pages_rows, pages_dataframe, PAGES_SCHEMA

__all__ = [
    "comprehensive_obo_graph",
    "edge_case_obo_graph",
    "malformed_obo_graph",
    "performance_obo_graph",
    "full_fixture_graph",
    "generate_pages_rows",
    "pages_dataframe",
    "PAGES_SCHEMA",
]
