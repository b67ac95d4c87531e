"""OBO-graph node → flat ontology-term DataFrame, as pure Spark SQL expressions.

Re-expresses the reference's row-at-a-time Python parser
(``app/go_parser.py:7-162``) declaratively so the whole stage runs inside
whole-stage codegen — no Python in the hot path, Catalyst prunes unused
columns, and the result is broadcast-sized for downstream joins.

Semantics preserved exactly (these decide triple P/R):
- nodes missing ``id`` or ``lbl`` are dropped, not errors (go_parser.py:91-95,157);
- CURIE = URI tail after the last "/", then config-driven replacements
  (default ``_`` → ``:``), applied to the WHOLE tail — ``malformed_uri`` →
  ``malformed:uri`` (go_parser.py:97-100);
- typed synonym lists keep order and duplicates; ``all_synonyms`` is every
  non-empty ``val`` regardless of pred — including unknown preds
  (go_parser.py:18-32). NOT array_union (it would dedupe);
- cross_references = definition.xrefs ++ non-empty meta.xrefs.val ++
  basicPropertyValues vals whose pred CONTAINS "hasDbXref" (go_parser.py:43-71);
- namespace = first basicPropertyValues val with the exact OBO-namespace pred,
  else "" (go_parser.py:74-83);
- searchable_text = " ".join(filter(None, [name, definition, *all_synonyms]))
  — empty strings are skipped, not double-spaced (go_parser.py:121-127).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OBO_NAMESPACE_PRED = "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace"

DEFAULT_ID_FORMAT: dict[str, str] = {"_": ":"}


def nodes_from_obo_graph(obo_df: DataFrame, config=None) -> DataFrame:
    """graphs[0].nodes → one row per node (reference go_parser.py:149-156).

    Only the first graph is read, matching the reference. The explode is
    narrow (no shuffle); at scale each input JSON document expands in place.
    A non-default ``OntologyJsonConfig`` (the reference's
    ``ontology_config.yaml`` json_parsing keys) is normalized to the
    canonical node struct here, so the parse stage is key-agnostic.
    """
    if config is not None and not config.is_default:
        from ..sources.obo_json import normalize_nodes

        return normalize_nodes(obo_df, config)
    return obo_df.select(
        F.explode(F.try_element_at(F.col("graphs"), F.lit(1))["nodes"]).alias("node")
    )


def _curie(col: Column, id_format: dict[str, str]) -> Column:
    """URI tail + configured replacements → CURIE (go_parser.py:97-100).
    Delegates to the exported ``curie_normalize`` so the parser's term_id
    and the oracle-checked scalar function can never diverge."""
    from ..functions.text import curie_normalize

    return curie_normalize(col, dict(id_format))


def _typed_synonyms(syns: Column, pred: str) -> Column:
    """Non-empty vals with the given pred, order- and duplicate-preserving."""
    return F.transform(
        F.filter(
            syns,
            lambda s: s["val"].isNotNull()
            & (s["val"] != "")
            & (s["pred"] == pred),
        ),
        lambda s: s["val"],
    )


def parse_terms(
    nodes_df: DataFrame,
    id_format: dict[str, str] | None = None,
    node_col: str = "node",
) -> DataFrame:
    """Node rows → the 11-column term relation (go_parser.py:86-141).

    Entirely built-in expressions: one codegen'd projection, zero shuffles.
    """
    if id_format is None:
        id_format = DEFAULT_ID_FORMAT
    n = F.col(node_col)
    syns = F.coalesce(n["meta"]["synonyms"], F.array().cast("array<struct<pred:string,val:string,xrefs:array<string>>>"))
    bpv = F.coalesce(
        n["meta"]["basicPropertyValues"],
        F.array().cast("array<struct<pred:string,val:string>>"),
    )

    all_syn = F.transform(
        F.filter(syns, lambda s: s["val"].isNotNull() & (s["val"] != "")),
        lambda s: s["val"],
    )

    definition = F.coalesce(n["meta"]["definition"]["val"], F.lit(""))

    # cross_references: three sources concatenated in reference order.
    def_xrefs = F.coalesce(
        n["meta"]["definition"]["xrefs"], F.array().cast("array<string>")
    )
    # meta.xrefs: mixed struct/bare-string form (go_parser.py:55-65) — the
    # schema captures both as strings ('{"val": ...}' JSON text vs verbatim);
    # normalize per element, then drop empties.
    meta_xrefs = F.filter(
        F.transform(
            F.coalesce(n["meta"]["xrefs"], F.array().cast("array<string>")),
            lambda x: F.when(
                F.startswith(F.trim(x), F.lit("{")),
                F.from_json(x, "val string")["val"],
            ).otherwise(x),
        ),
        lambda v: v.isNotNull() & (v != ""),
    )
    dbxrefs = F.transform(
        F.filter(
            bpv,
            lambda p: p["val"].isNotNull()
            & (p["val"] != "")
            & F.coalesce(p["pred"], F.lit("")).contains("hasDbXref"),
        ),
        lambda p: p["val"],
    )

    namespace = F.coalesce(
        F.try_element_at(
            F.filter(bpv, lambda p: p["pred"] == OBO_NAMESPACE_PRED), F.lit(1)
        )["val"],
        F.lit(""),
    )

    parsed = (
        nodes_df
        # required-field filter F1 (go_parser.py:91-95,157-160)
        .where(n["id"].isNotNull() & n["lbl"].isNotNull())
        .select(
            _curie(n["id"], id_format).alias("term_id"),
            n["lbl"].alias("name"),
            definition.alias("definition"),
            _typed_synonyms(syns, "hasExactSynonym").alias("exact_synonyms"),
            _typed_synonyms(syns, "hasNarrowSynonym").alias("narrow_synonyms"),
            _typed_synonyms(syns, "hasBroadSynonym").alias("broad_synonyms"),
            _typed_synonyms(syns, "hasRelatedSynonym").alias("related_synonyms"),
            all_syn.alias("all_synonyms"),
            F.concat(def_xrefs, meta_xrefs, dbxrefs).alias("cross_references"),
            namespace.alias("namespace"),
            # obsolete flag is carried for F5; reference reads it off DOTerm.
            F.coalesce(n["meta"]["deprecated"] == "true", F.lit(False)).alias(
                "is_obsolete"
            ),
        )
        .withColumn(
            # " ".join(filter(None, [name, definition] + all_synonyms)):
            # concat_ws skips NULLs but not empty strings, so blank parts are
            # nullif'd away to reproduce filter(None, ...) exactly.
            "searchable_text",
            F.concat_ws(
                " ",
                F.nullif(F.col("name"), F.lit("")),
                F.nullif(F.col("definition"), F.lit("")),
                F.nullif(F.array_join(F.col("all_synonyms"), " "), F.lit("")),
            ),
        )
    )
    return parsed


def quality_filter(
    terms: DataFrame,
    min_definition_length: int = 10,
    exclude_patterns: tuple[str, ...] = ("deprecated", "obsolete"),
    definition_required: bool = True,
    include_obsolete: bool = False,
) -> DataFrame:
    """Pre-embedding quality gate (reference do_embeddings.py:35-71, config
    embeddings_config.yaml:36-50).

    Expressed as one ``where`` conjunction so Catalyst can push it below any
    later expensive stage (the reference runs it before embedding for the same
    reason, manually). Rejected rows are obtainable via ``quality_rejects``.
    """
    return terms.where(_quality_predicate(min_definition_length, exclude_patterns, definition_required, include_obsolete))


def _null_fails(pred: Column) -> Column:
    """Three-valued logic guard: a NULL predicate (NULL name/definition)
    must count as FAILING the gate, so filter ∪ rejects == input instead of
    such rows vanishing from both sides."""
    return F.coalesce(pred, F.lit(False))


def quality_rejects(
    terms: DataFrame,
    min_definition_length: int = 10,
    exclude_patterns: tuple[str, ...] = ("deprecated", "obsolete"),
    definition_required: bool = True,
    include_obsolete: bool = False,
) -> DataFrame:
    """The complement of :func:`quality_filter`, with a rejection reason column
    (mirrors filter_terms' rejection_reasons, do_embeddings.py:147-168 — but as
    a second filtered scan instead of a driver-side list)."""
    pred = _null_fails(
        _quality_predicate(
            min_definition_length,
            exclude_patterns,
            definition_required,
            include_obsolete,
        )
    )
    return terms.where(~pred).withColumn(
        "reject_reason",
        F.concat(
            F.lit("Term "),
            F.col("term_id"),
            F.lit(" ("),
            F.coalesce(F.col("name"), F.lit("")),
            F.lit(") rejected by quality filters"),
        ),
    )


def _quality_predicate(
    min_definition_length: int,
    exclude_patterns: tuple[str, ...],
    definition_required: bool,
    include_obsolete: bool,
) -> Column:
    pred = F.lit(True)
    if min_definition_length > 0:
        pred = pred & (F.length("definition") >= min_definition_length)
    for pat in exclude_patterns:
        lp = pat.lower()
        pred = (
            pred
            & ~F.lower(F.col("name")).contains(lp)
            & ~F.lower(F.col("definition")).contains(lp)
        )
    if definition_required:
        pred = pred & (F.trim(F.col("definition")) != "")
    if not include_obsolete:
        pred = pred & ~F.coalesce(F.col("is_obsolete"), F.lit(False))
    return pred


def searchable_text_config(
    name: Column | None = None,
    definition: Column | None = None,
    synonym_arrays: list[Column] | None = None,
    include_name: bool = True,
    include_definition: bool = True,
    include_synonyms: bool = True,
    lowercase: bool = False,
    remove_punctuation: bool = False,
    separator: str = " | ",
) -> Column:
    """Config-driven searchable text (P8, reference
    ``app/ontology_manager.py:109-144`` + embeddings_config.yaml:17-21,52-56):
    field toggles, optional lowercase, optional punctuation strip,
    configurable separator; blank components dropped (filter(None, ...)).
    """
    import string

    def prep(c: Column) -> Column:
        # transforms apply PER COMPONENT before joining, like the reference's
        # list comprehension — so the separator itself is never stripped
        if lowercase:
            c = F.lower(c)
        if remove_punctuation:
            c = F.translate(c, string.punctuation, "")
        return c

    out: list[Column] = []
    if include_name and name is not None:
        out.append(F.nullif(prep(name), F.lit("")))
    if include_definition and definition is not None:
        out.append(F.nullif(prep(definition), F.lit("")))
    if include_synonyms and synonym_arrays:
        for arr in synonym_arrays:
            joined = F.array_join(
                F.filter(
                    F.transform(
                        F.coalesce(arr, F.array().cast("array<string>")), prep
                    ),
                    lambda s: s.isNotNull() & (s != ""),
                ),
                separator,
            )
            out.append(F.nullif(joined, F.lit("")))
    return F.concat_ws(separator, *out)


SYNONYM_TYPE_ORDER = ("exact", "narrow", "broad", "related")


def synonyms_map() -> Column:
    """The reference's ``DOTerm.synonyms`` shape (models.py:44):
    ``map<synonym_type, array<synonym>>`` built from the typed columns."""
    return F.map_from_arrays(
        F.array(*[F.lit(t) for t in SYNONYM_TYPE_ORDER]),
        F.array(
            F.col("exact_synonyms"),
            F.col("narrow_synonyms"),
            F.col("broad_synonyms"),
            F.col("related_synonyms"),
        ),
    )


def prioritized_xrefs(
    xrefs: Column, sources: list[str], limit: int = 5
) -> Column:
    """Source-prioritized xref filter (do_embeddings.py:121-136): keep
    xrefs whose prefix matches ANY configured source (xref order
    preserved, like the reference's outer loop), first ``limit``."""
    src = F.array(*[F.lit(s) for s in sources])
    return F.slice(
        F.filter(xrefs, lambda x: F.exists(src, lambda s: F.startswith(x, s))),
        1,
        limit,
    )


def embed_text(
    max_length: int = 8000,
    separator: str = " | ",
    xref_sources: tuple[str, ...] = (),
) -> Column:
    """Compose the per-term embedding text (reference do_embeddings.py:73-145).

    ``Name: …`` | ``Definition: …`` | ``Synonyms: type: syn, …``
    [| ``References: …`` when ``xref_sources`` configures prioritized
    sources — filtered by prefix, capped at 5, do_embeddings.py:121-136]
    with truncation to ``max_length`` (-3 for the ellipsis). Synonym parts
    iterate the ``map<type, syns>`` with ``map_entries`` — the reference's
    dict iteration over DOTerm.synonyms, declaration order.
    """
    syn_parts = F.flatten(
        F.transform(
            F.map_entries(synonyms_map()),
            lambda e: F.transform(
                e["value"], lambda s: F.concat(e["key"], F.lit(": "), s)
            ),
        )
    )
    parts = [
        F.when(F.col("name") != "", F.concat(F.lit("Name: "), F.col("name"))),
        F.when(
            F.col("definition") != "",
            F.concat(F.lit("Definition: "), F.col("definition")),
        ),
        F.when(
            F.size(syn_parts) > 0,
            F.concat(F.lit("Synonyms: "), F.array_join(syn_parts, ", ")),
        ),
    ]
    if xref_sources:
        px = prioritized_xrefs(F.col("cross_references"), list(xref_sources))
        parts.append(
            F.when(
                F.size(px) > 0,
                F.concat(F.lit("References: "), F.array_join(px, ", ")),
            )
        )
    combined = F.concat_ws(separator, *parts)
    return F.when(
        F.length(combined) > max_length,
        F.concat(F.substring(combined, 1, max_length - 3), F.lit("...")),
    ).otherwise(combined)
