"""Explicit schemas for OBO Graph JSON ontology documents.

The reference reads ``graphs[0].nodes`` out of an OBO-graph JSON file and
tolerates missing/odd fields per node (reference ``app/go_parser.py:144-162``).
We declare the schema explicitly so malformed nodes surface as nulls (and are
filtered), never as job failures — matching the parser's lenient behavior
while letting Spark avoid schema inference over huge inputs.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# meta.synonyms[]: {pred, val, xrefs}
SYNONYM_SCHEMA = StructType(
    [
        StructField("pred", StringType()),
        StructField("val", StringType()),
        StructField("xrefs", ArrayType(StringType())),
    ]
)

# meta.basicPropertyValues[]: {pred, val}
BPV_SCHEMA = StructType(
    [
        StructField("pred", StringType()),
        StructField("val", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        # definition: {val, xrefs} (string-form definitions in the wild become
        # null under the declared schema and fall back to "").
        StructField(
            "definition",
            StructType(
                [
                    StructField("val", StringType()),
                    StructField("xrefs", ArrayType(StringType())),
                ]
            ),
        ),
        StructField("synonyms", ArrayType(SYNONYM_SCHEMA)),
        # meta.xrefs[]: the wild holds BOTH {"val": "X"} structs and bare
        # "X" strings (reference go_parser.py:55-65 handles both). Declared
        # array<string> so Spark's JSON reader keeps struct elements as raw
        # JSON text and bare strings as-is; parse_terms normalizes per
        # element (from_json for '{'-prefixed, verbatim otherwise).
        StructField("xrefs", ArrayType(StringType())),
        StructField("basicPropertyValues", ArrayType(BPV_SCHEMA)),
        StructField("deprecated", StringType()),
    ]
)

NODE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("lbl", StringType()),
        StructField("type", StringType()),
        StructField("meta", META_SCHEMA),
    ]
)

GRAPH_META_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField(
            "basicPropertyValues",
            ArrayType(BPV_SCHEMA),
        ),
    ]
)

OBO_GRAPH_SCHEMA = StructType(
    [
        StructField(
            "graphs",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("meta", GRAPH_META_SCHEMA),
                        StructField("nodes", ArrayType(NODE_SCHEMA)),
                    ]
                )
            ),
        )
    ]
)

# Output of the parse stage — the engine's central dimension table
# (reference ``app/go_parser.py:129-141`` + the obsolete flag for F5 and the
# composed searchable text; matches parse_terms' actual column set).
TERM_SCHEMA = StructType(
    [
        StructField("term_id", StringType()),
        StructField("name", StringType()),
        StructField("definition", StringType()),
        StructField("exact_synonyms", ArrayType(StringType())),
        StructField("narrow_synonyms", ArrayType(StringType())),
        StructField("broad_synonyms", ArrayType(StringType())),
        StructField("related_synonyms", ArrayType(StringType())),
        StructField("all_synonyms", ArrayType(StringType())),
        StructField("cross_references", ArrayType(StringType())),
        StructField("namespace", StringType()),
        StructField("is_obsolete", BooleanType()),
        StructField("searchable_text", StringType()),
    ]
)
