from .schema import OBO_GRAPH_SCHEMA, NODE_SCHEMA, TERM_SCHEMA
from .parser import nodes_from_obo_graph, parse_terms, quality_filter, embed_text

__all__ = [
    "OBO_GRAPH_SCHEMA",
    "NODE_SCHEMA",
    "TERM_SCHEMA",
    "nodes_from_obo_graph",
    "parse_terms",
    "quality_filter",
    "embed_text",
]
