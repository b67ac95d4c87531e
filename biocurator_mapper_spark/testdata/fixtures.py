"""Deterministic OBO-graph fixture corpora (no external data).

Authored from the documented shape of the reference's test corpus
(``tests/data/TEST_DATA_DOCUMENTATION.md``, ``tests/test_go_data_parsing.py``)
— representative DOID/GO terms with typed synonyms, xrefs from several
sources, namespace properties, edge cases (unicode, empty values, unknown
synonym pred, obsolete, extreme length) and malformed rows that the parser
must drop rather than crash on.
"""

from __future__ import annotations

OBO = "http://purl.obolibrary.org/obo"
OIO = "http://www.geneontology.org/formats/oboInOwl"
NS_PRED = f"{OIO}#hasOBONamespace"
DBXREF_PRED = f"{OIO}#hasDbXref"


def _syn(pred: str, val: str, xrefs: list[str] | None = None) -> dict:
    return {"pred": pred, "val": val, "xrefs": xrefs or []}


def _node(
    curie_tail: str,
    lbl: str,
    definition: str | None = None,
    def_xrefs: list[str] | None = None,
    synonyms: list[dict] | None = None,
    xrefs: list[str] | None = None,
    namespace: str | None = None,
    dbxrefs: list[str] | None = None,
    deprecated: bool = False,
    bare_xrefs: list[str] | None = None,
) -> dict:
    meta: dict = {}
    if definition is not None:
        meta["definition"] = {"val": definition, "xrefs": def_xrefs or []}
    if synonyms:
        meta["synonyms"] = synonyms
    if xrefs is not None or bare_xrefs:
        # the wild mixes struct and bare-string xrefs (go_parser.py:55-65)
        meta["xrefs"] = [{"val": x} for x in (xrefs or [])] + list(bare_xrefs or [])
    bpv = []
    if namespace is not None:
        bpv.append({"pred": NS_PRED, "val": namespace})
    for x in dbxrefs or []:
        bpv.append({"pred": DBXREF_PRED, "val": x})
    if bpv:
        meta["basicPropertyValues"] = bpv
    if deprecated:
        meta["deprecated"] = "true"
    return {"id": f"{OBO}/{curie_tail}", "lbl": lbl, "type": "CLASS", "meta": meta}


def comprehensive_obo_graph() -> dict:
    """Six realistic disease/GO terms covering every parse path."""
    nodes = [
        _node(
            "DOID_0001816",
            "angiosarcoma",
            definition=(
                "A malignant vascular tumor that results in rapidly proliferating, "
                "extensively infiltrating anaplastic cells derived from blood vessels."
            ),
            def_xrefs=["url:http://en.wikipedia.org/wiki/Hemangiosarcoma"],
            synonyms=[
                _syn("hasExactSynonym", "hemangiosarcoma"),
                _syn("hasRelatedSynonym", "malignant hemangioendothelioma"),
                _syn("hasNarrowSynonym", "epithelioid angiosarcoma"),
                _syn("hasBroadSynonym", "vascular cancer"),
            ],
            xrefs=["MESH:D006394", "NCI:C3088", "SNOMEDCT_US_2023_03_01:39000009"],
            namespace="disease_ontology",
            dbxrefs=["UMLS_CUI:C0018923"],
        ),
        _node(
            "DOID_9352",
            "type 2 diabetes mellitus",
            definition=(
                "A diabetes mellitus that is characterized by high blood sugar, "
                "insulin resistance, and relative lack of insulin."
            ),
            def_xrefs=["url:http://en.wikipedia.org/wiki/Diabetes_mellitus_type_2"],
            synonyms=[
                _syn("hasExactSynonym", "type II diabetes mellitus"),
                _syn("hasExactSynonym", "non-insulin-dependent diabetes mellitus"),
                _syn("hasExactSynonym", "NIDDM"),
                _syn("hasRelatedSynonym", "adult-onset diabetes"),
            ],
            xrefs=[
                "ICD10CM:E11",
                "ICD9CM:250.00",
                "MESH:D003924",
                "NCI:C26747",
                "OMIM:125853",
                "SNOMEDCT_US_2023_03_01:44054006",
            ],
            namespace="disease_ontology",
            dbxrefs=["UMLS_CUI:C0011860"],
        ),
        _node(
            "DOID_14566",
            "disease of cellular proliferation",
            definition=(
                "A disease that is characterized by abnormally rapid cell division."
            ),
            synonyms=[
                _syn("hasExactSynonym", "cell process disease"),
                _syn("hasBroadSynonym", "proliferative disorder"),
            ],
            xrefs=[],
            namespace="disease_ontology",
        ),
        _node(
            "DOID_0080600",
            "COVID-19",
            definition=(
                "A viral infectious disease that is characterized by fever, cough, "
                "and shortness of breath, and has_material_basis_in SARS-CoV-2."
            ),
            synonyms=[
                _syn("hasExactSynonym", "2019 novel coronavirus infection"),
                _syn("hasExactSynonym", "coronavirus disease 2019"),
                _syn("hasRelatedSynonym", "severe acute respiratory syndrome coronavirus 2 infection"),
            ],
            xrefs=["ICD10CM:U07.1", "MESH:D000086382"],
            namespace="disease_ontology",
            dbxrefs=["UMLS_CUI:C5203670"],
        ),
        _node("DOID_0000001", "disease", namespace="disease_ontology"),
        _node(
            "GO_0000001",
            "mitochondrion inheritance",
            definition=(
                "The distribution of mitochondria, including the mitochondrial "
                "genome, into daughter cells after mitosis or meiosis."
            ),
            def_xrefs=["GOC:mcc", "PMID:10873824"],
            synonyms=[
                _syn("hasExactSynonym", "mitochondrial inheritance"),
            ],
            namespace="biological_process",
        ),
        _node(
            "GO_0000002",
            "mitochondrial genome maintenance",
            definition=(
                "The maintenance of the structure and integrity of the "
                "mitochondrial genome; includes replication and segregation."
            ),
            namespace="biological_process",
        ),
        _node(
            "GO_0000006",
            "high-affinity zinc transmembrane transporter activity",
            definition=(
                "Enables the transfer of zinc ions from one side of a membrane "
                "to the other, with high affinity."
            ),
            synonyms=[_syn("hasBroadSynonym", "zinc transporter")],
            namespace="molecular_function",
        ),
        _node(
            "GO_0006915",
            "apoptotic process",
            definition=(
                "A programmed cell death process which begins when a cell receives "
                "an internal or external signal and proceeds through a series of "
                "biochemical events which typically lead to rounding-up of the cell "
                "and chromatin condensation."
            ),
            synonyms=[
                _syn("hasExactSynonym", "apoptosis"),
                _syn("hasNarrowSynonym", "apoptosis of T cells"),
                _syn("hasRelatedSynonym", "programmed cell death"),
            ],
            xrefs=["Wikipedia:Apoptosis"],
            namespace="biological_process",
        ),
    ]
    return {"graphs": [{"id": f"{OBO}/doid.owl", "meta": {"version": "fixture-comprehensive-v1"}, "nodes": nodes}]}


def edge_case_obo_graph() -> dict:
    """Edge rows: minimal, empty strings, unicode, obsolete, unknown pred,
    duplicate synonyms across types, extreme length, malformed URI."""
    long_def = ("An extremely long definition sentence that repeats. " * 200).strip()
    nodes = [
        _node("DOID_0000000", "minimal term", namespace="disease_ontology"),
        _node(
            "DOID_0000002",
            "empty definition term",
            definition="",
            synonyms=[_syn("hasExactSynonym", "")],  # empty val must be dropped
            namespace="disease_ontology",
        ),
        _node(
            "DOID_0000005",
            "unicode disease ñáéíóú",
            definition="A disease with unicode characters: αβγδε 中文 العربية.",
            synonyms=[_syn("hasExactSynonym", "уникод синоним")],
            namespace="disease_ontology",
        ),
        _node(
            "DOID_0000003",
            "obsolete example disease",
            definition="OBSOLETE. A disease concept retained for history.",
            namespace="disease_ontology",
            deprecated=True,
        ),
        _node(
            "DOID_0000004",
            "unknown synonym pred term",
            definition="A term whose synonym carries an unrecognized predicate.",
            synonyms=[
                _syn("hasWeirdSynonym", "mystery alias"),
                _syn("hasExactSynonym", "known alias"),
                _syn("hasRelatedSynonym", "known alias"),  # duplicate kept in all_synonyms
            ],
            # struct- and string-form xrefs mixed in one node
            xrefs=["MESH:D111111"],
            bare_xrefs=["ICD10CM:B99", ""],  # empty bare string is dropped
            namespace="disease_ontology",
        ),
        _node(
            "DOID_0000006",
            "extreme length term",
            definition=long_def,
            namespace="disease_ontology",
        ),
        # malformed URI: no slash path change — tail is the whole string.
        {
            "id": "malformed_uri",
            "lbl": "malformed uri term",
            "type": "CLASS",
            "meta": {"definition": {"val": "A term with a malformed identifier.", "xrefs": []}},
        },
    ]
    return {"graphs": [{"id": f"{OBO}/doid-edge.owl", "meta": {"version": "fixture-edge-v1"}, "nodes": nodes}]}


def malformed_obo_graph() -> dict:
    """Rows the parser must DROP (missing id / missing lbl), not crash on."""
    nodes = [
        {"lbl": "no id term", "type": "CLASS", "meta": {}},
        {"id": f"{OBO}/DOID_9999998", "type": "CLASS", "meta": {}},
        _node("DOID_9999999", "survivor term",
              definition="The only valid row in the malformed set.",
              namespace="disease_ontology"),
    ]
    return {"graphs": [{"id": f"{OBO}/doid-malformed.owl", "meta": {"version": "fixture-malformed-v1"}, "nodes": nodes}]}


def performance_obo_graph(n: int = 100) -> dict:
    """Uniform generated terms DOID:8000001..800000n (performance set)."""
    nodes = [
        _node(
            f"DOID_{8000000 + i:07d}",
            f"synthetic disease {i}",
            definition=f"A synthetic disease number {i} generated for performance testing purposes.",
            synonyms=[
                _syn("hasExactSynonym", f"synthetic disorder {i}"),
                _syn("hasRelatedSynonym", f"generated condition {i}"),
            ],
            xrefs=[f"MESH:D{900000 + i}"],
            namespace="disease_ontology",
        )
        for i in range(1, n + 1)
    ]
    return {"graphs": [{"id": f"{OBO}/doid-perf.owl", "meta": {"version": "fixture-perf-v1"}, "nodes": nodes}]}


def full_fixture_graph(perf_n: int = 100) -> dict:
    """All fixture sets merged into one graph (t2 correctness tier)."""
    nodes = (
        comprehensive_obo_graph()["graphs"][0]["nodes"]
        + edge_case_obo_graph()["graphs"][0]["nodes"]
        + malformed_obo_graph()["graphs"][0]["nodes"]
        + performance_obo_graph(perf_n)["graphs"][0]["nodes"]
    )
    return {"graphs": [{"id": f"{OBO}/doid-all.owl", "meta": {"version": "fixture-all-v1"}, "nodes": nodes}]}
