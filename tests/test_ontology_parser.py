"""Golden assertions for the parse stage, ported from the reference's parser
tests (tests/test_go_data_parsing.py, test_doid_parsing.py,
test_do_synonym_type_parsing.py, test_do_cross_reference_extraction.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biocurator_mapper_spark.ontology import quality_filter, embed_text
from biocurator_mapper_spark.ontology.parser import quality_rejects


def _row(terms, term_id):
    rows = terms.where(F.col("term_id") == term_id).collect()
    assert len(rows) == 1, f"expected exactly one row for {term_id}, got {len(rows)}"
    return rows[0]


def test_uri_to_curie_conversion(terms):
    ids = {r.term_id for r in terms.select("term_id").collect()}
    assert "DOID:0001816" in ids
    assert "GO:0000001" in ids
    assert "DOID:9352" in ids
    # malformed URI: tail == whole string, underscores replaced
    assert "malformed:uri" in ids


def test_malformed_nodes_dropped(terms):
    # missing-id and missing-lbl rows vanish; survivor stays
    names = {r.name for r in terms.select("name").collect()}
    assert "no id term" not in names
    assert "survivor term" in names
    assert terms.where(F.col("term_id").isNull()).count() == 0


def test_typed_synonyms(terms):
    r = _row(terms, "DOID:0001816")
    assert r.exact_synonyms == ["hemangiosarcoma"]
    assert r.narrow_synonyms == ["epithelioid angiosarcoma"]
    assert r.broad_synonyms == ["vascular cancer"]
    assert r.related_synonyms == ["malignant hemangioendothelioma"]
    # every typed synonym is a member of all_synonyms
    for s in (
        r.exact_synonyms + r.narrow_synonyms + r.broad_synonyms + r.related_synonyms
    ):
        assert s in r.all_synonyms


def test_all_synonyms_order_duplicates_and_unknown_pred(terms):
    r = _row(terms, "DOID:0000004")
    # unknown pred value included in all_synonyms but no typed list
    assert r.all_synonyms == ["mystery alias", "known alias", "known alias"]
    assert r.exact_synonyms == ["known alias"]
    assert r.related_synonyms == ["known alias"]
    assert r.narrow_synonyms == []


def test_empty_synonym_val_dropped(terms):
    r = _row(terms, "DOID:0000002")
    assert r.all_synonyms == []
    assert r.exact_synonyms == []


def test_cross_references_union(terms):
    r = _row(terms, "DOID:9352")
    expected_subset = {
        "ICD10CM:E11",
        "ICD9CM:250.00",
        "MESH:D003924",
        "NCI:C26747",
        "OMIM:125853",
        "UMLS_CUI:C0011860",
    }
    assert expected_subset.issubset(set(r.cross_references))
    # definition xref comes first (reference extends definition xrefs first)
    assert r.cross_references[0].startswith("url:")


def test_mixed_form_meta_xrefs(terms):
    # struct xrefs and bare-string xrefs coexist in one node; empties drop
    # (reference go_parser.py:55-65 handles both forms)
    r = _row(terms, "DOID:0000004")
    assert r.cross_references == ["MESH:D111111", "ICD10CM:B99"]


def test_namespace_extraction(terms):
    assert _row(terms, "GO:0000001").namespace == "biological_process"
    assert _row(terms, "GO:0000006").namespace == "molecular_function"
    assert _row(terms, "DOID:0001816").namespace == "disease_ontology"
    # node without namespace property → ""
    assert _row(terms, "malformed:uri").namespace == ""


def test_searchable_text_composition(terms):
    r = _row(terms, "DOID:0001816")
    expected = " ".join(
        [r.name, r.definition]
        + ["hemangiosarcoma", "malignant hemangioendothelioma",
           "epithelioid angiosarcoma", "vascular cancer"]
    )
    assert r.searchable_text == expected


def test_searchable_text_skips_empty_parts(terms):
    # minimal term: no definition, no synonyms → searchable == name, no
    # doubled separators (filter(None, ...) semantics)
    r = _row(terms, "DOID:0000000")
    assert r.searchable_text == "minimal term"
    assert "  " not in r.searchable_text


def test_definition_default_empty(terms):
    assert _row(terms, "DOID:0000000").definition == ""


def test_unicode_preserved(terms):
    r = _row(terms, "DOID:0000005")
    assert "ñáéíóú" in r.name
    assert "中文" in r.definition
    assert r.all_synonyms == ["уникод синоним"]


def test_quality_filter(terms):
    kept = quality_filter(terms)
    kept_ids = {r.term_id for r in kept.select("term_id").collect()}
    # definition shorter than 10 / missing → rejected
    assert "DOID:0000000" not in kept_ids  # no definition
    assert "DOID:0000002" not in kept_ids  # empty definition
    # obsolete excluded both via flag and via "obsolete" pattern in definition
    assert "DOID:0000003" not in kept_ids
    # healthy terms kept
    assert "DOID:0001816" in kept_ids
    assert "DOID:9352" in kept_ids
    # complement partition: kept + rejected == all
    rej = quality_rejects(terms)
    assert kept.count() + rej.count() == terms.count()
    reason = rej.where(F.col("term_id") == "DOID:0000003").collect()[0].reject_reason
    assert reason.startswith("Term DOID:0000003")


def test_embed_text_truncation(terms):
    out = terms.withColumn("embed_text", embed_text(max_length=8000)).where(
        F.col("term_id") == "DOID:0000006"
    ).collect()[0]
    assert len(out.embed_text) == 8000
    assert out.embed_text.endswith("...")


def test_embed_text_composition(terms):
    out = terms.withColumn("embed_text", embed_text()).where(
        F.col("term_id") == "DOID:0001816"
    ).collect()[0]
    assert out.embed_text.startswith("Name: angiosarcoma | Definition: ")
    assert "Synonyms: exact: hemangiosarcoma" in out.embed_text


def test_config_driven_ingest_renamed_keys(spark):
    """A non-OBO-shaped ontology (renamed graphs/nodes/id/label keys and a
    custom definition path) parses via OntologyJsonConfig with no code
    changes — the reference's ontology_config.yaml json_parsing contract."""
    from biocurator_mapper_spark.ontology import nodes_from_obo_graph, parse_terms
    from biocurator_mapper_spark.sources.obo_json import (
        OntologyJsonConfig,
        obo_graph_from_dict,
    )

    cfg = OntologyJsonConfig.from_dict(
        {
            "graphs_key": "ontologies",
            "nodes_key": "records",
            "id_key": "identifier",
            "label_key": "title",
            "definition_path": ["meta", "descr"],
        }
    )
    doc = {
        "ontologies": [
            {
                "id": "custom",
                "records": [
                    {
                        "identifier": "http://example.org/XO_0000001",
                        "title": "custom shaped term",
                        "meta": {
                            "descr": "A term from a non-OBO-shaped ontology.",
                            "synonyms": [
                                {"pred": "hasExactSynonym", "val": "renamed term"}
                            ],
                            "xrefs": [{"val": "MESH:D1"}, "BARE:2"],
                        },
                    },
                    {"title": "dropped, no identifier", "meta": {}},
                ],
            }
        ]
    }
    terms = parse_terms(nodes_from_obo_graph(obo_graph_from_dict(spark, doc, cfg), cfg))
    rows = terms.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.term_id == "XO:0000001"
    assert r.name == "custom shaped term"
    assert r.definition == "A term from a non-OBO-shaped ontology."
    assert r.exact_synonyms == ["renamed term"]
    assert r.cross_references == ["MESH:D1", "BARE:2"]
    assert "renamed term" in r.searchable_text


def test_embed_text_prioritized_xrefs(terms):
    # References part: only xrefs matching a configured source prefix, in
    # xref order, capped at 5 (reference do_embeddings.py:121-136)
    from biocurator_mapper_spark.ontology import embed_text

    out = terms.withColumn(
        "embed_text", embed_text(xref_sources=("MESH:", "OMIM:"))
    ).where(F.col("term_id") == "DOID:9352").collect()[0]
    assert "References: MESH:D003924, OMIM:125853" in out.embed_text
    assert "ICD10CM" not in out.embed_text  # non-prioritized source dropped
    # default stays reference-less (existing composition unchanged)
    base = terms.withColumn("embed_text", embed_text()).where(
        F.col("term_id") == "DOID:9352"
    ).collect()[0]
    assert "References:" not in base.embed_text


def test_synonyms_map_shape(terms):
    from biocurator_mapper_spark.ontology.parser import synonyms_map

    r = terms.withColumn("smap", synonyms_map()).where(
        F.col("term_id") == "DOID:0001816"
    ).collect()[0]
    assert r.smap["exact"] == ["hemangiosarcoma"]
    assert r.smap["broad"] == ["vascular cancer"]
    assert set(r.smap.keys()) == {"exact", "narrow", "broad", "related"}
