"""Ontology source: OBO-graph JSON → node DataFrame (SURVEY §2 S2/S3).

The reference downloads the ontology over HTTP and ``json.loads`` the whole
file on one process (``app/main.py:172-216,502-504``). Here ingest is a
schema'd ``spark.read.json`` — multiLine (one big document per file), explicit
schema (no inference pass), malformed nodes become nulls and are dropped by
the parser's required-field filter.

Key mapping is config-driven, mirroring the reference's
``ontology_config.yaml`` ``json_parsing`` block
(``graphs_key/nodes_key/id_key/label_key/definition_path``, read by
``app/go_parser.py:149-156``): a non-OBO-shaped ontology is ingested by
passing an ``OntologyJsonConfig`` — no code changes. The configured shape is
normalized to the canonical ``node`` struct at scan time, so ``parse_terms``
and everything downstream are key-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..ontology.schema import BPV_SCHEMA, OBO_GRAPH_SCHEMA, SYNONYM_SCHEMA

DEFAULT_DEFINITION_PATH = ("meta", "definition", "val")


@dataclass(frozen=True)
class OntologyJsonConfig:
    """The reference's json_parsing keys (ontology_config.yaml:32-38)."""

    graphs_key: str = "graphs"
    nodes_key: str = "nodes"
    id_key: str = "id"
    label_key: str = "lbl"
    definition_path: tuple[str, ...] = DEFAULT_DEFINITION_PATH

    @classmethod
    def from_dict(cls, d: dict) -> "OntologyJsonConfig":
        return cls(
            graphs_key=d.get("graphs_key", "graphs"),
            nodes_key=d.get("nodes_key", "nodes"),
            id_key=d.get("id_key", "id"),
            label_key=d.get("label_key", "lbl"),
            definition_path=tuple(
                d.get("definition_path", DEFAULT_DEFINITION_PATH)
            ),
        )

    @property
    def is_default(self) -> bool:
        return self == OntologyJsonConfig()


def _nested_string_field(path: tuple[str, ...]) -> StructField:
    """path ('a','b','c') → StructField a: struct<b: struct<c: string>>."""
    f = StructField(path[-1], StringType())
    for key in reversed(path[:-1]):
        f = StructField(key, StructType([f]))
    return f


def build_obo_graph_schema(cfg: OntologyJsonConfig) -> StructType:
    """The declared read schema for a configured key mapping — same shapes
    as OBO_GRAPH_SCHEMA with the configured names, plus the definition path
    grafted wherever the config points it."""
    if cfg.is_default:
        return OBO_GRAPH_SCHEMA
    meta_fields: list[StructField] = []
    path = cfg.definition_path
    if path == DEFAULT_DEFINITION_PATH:
        meta_fields.append(
            StructField(
                "definition",
                StructType(
                    [
                        StructField("val", StringType()),
                        StructField("xrefs", ArrayType(StringType())),
                    ]
                ),
            )
        )
    elif path and path[0] == "meta":
        meta_fields.append(_nested_string_field(path[1:]))
    meta_fields += [
        StructField("synonyms", ArrayType(SYNONYM_SCHEMA)),
        StructField("xrefs", ArrayType(StringType())),
        StructField("basicPropertyValues", ArrayType(BPV_SCHEMA)),
        StructField("deprecated", StringType()),
    ]
    node_fields = [
        StructField(cfg.id_key, StringType()),
        StructField(cfg.label_key, StringType()),
        StructField("type", StringType()),
        StructField("meta", StructType(meta_fields)),
    ]
    if path and path[0] != "meta":
        node_fields.append(_nested_string_field(path))
    return StructType(
        [
            StructField(
                cfg.graphs_key,
                ArrayType(
                    StructType(
                        [
                            StructField("id", StringType()),
                            StructField(
                                cfg.nodes_key, ArrayType(StructType(node_fields))
                            ),
                        ]
                    )
                ),
            )
        ]
    )


def normalize_nodes(
    obo_df: DataFrame, cfg: OntologyJsonConfig
) -> DataFrame:
    """graphs[0].nodes in the CONFIGURED shape → canonical ``node`` struct
    (id/lbl/type/meta) so the parser never sees custom keys. One narrow
    projection; no shuffle."""
    ex = F.explode(
        F.try_element_at(F.col(cfg.graphs_key), F.lit(1))[cfg.nodes_key]
    ).alias("_n")
    df = obo_df.select(ex)
    n = F.col("_n")
    d = n
    for key in cfg.definition_path:
        d = d[key]
    default_def = cfg.definition_path == DEFAULT_DEFINITION_PATH
    def_xrefs = (
        n["meta"]["definition"]["xrefs"]
        if default_def
        else F.lit(None).cast("array<string>")
    )
    node = F.struct(
        n[cfg.id_key].alias("id"),
        n[cfg.label_key].alias("lbl"),
        n["type"].alias("type"),
        F.struct(
            F.struct(d.alias("val"), def_xrefs.alias("xrefs")).alias("definition"),
            n["meta"]["synonyms"].alias("synonyms"),
            n["meta"]["xrefs"].alias("xrefs"),
            n["meta"]["basicPropertyValues"].alias("basicPropertyValues"),
            n["meta"]["deprecated"].alias("deprecated"),
        ).alias("meta"),
    )
    return df.select(node.alias("node"))


def read_obo_graph(
    spark: SparkSession, path: str, config: OntologyJsonConfig | None = None
) -> DataFrame:
    cfg = config or OntologyJsonConfig()
    return (
        spark.read.schema(build_obo_graph_schema(cfg))
        .option("multiLine", "true")
        .json(path)
    )


def obo_graph_from_dict(
    spark: SparkSession, doc: dict, config: OntologyJsonConfig | None = None
) -> DataFrame:
    """Test/fixture path: a parsed OBO dict → same shape as read_obo_graph."""
    import json

    cfg = config or OntologyJsonConfig()
    return spark.read.schema(build_obo_graph_schema(cfg)).json(
        spark.sparkContext.parallelize([json.dumps(doc)], 1)
    )
