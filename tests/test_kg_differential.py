"""Full-pipeline differential: the independent plain-Python reimplementation
(biocurator_mapper_spark/testdata/kg_oracle.py — zero shared plan code) must
reproduce ``build_triples`` EXACTLY, float32 confidence included, over the
sf0.001 documents corpus. The driver-gate kg_triples oracle inlines the
same derivation as a VALUES table; this test pins the extra columns the
contract omits (alternatives) and keeps the derivation honest."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def expected():
    import __spark_entry__ as em
    from biocurator_mapper_spark.testdata.kg_oracle import expected_triples

    return {
        s: (p, o, m, c) for s, p, o, m, c in expected_triples(SF_DIR, em.VOCAB_ROWS)
    }


def test_build_triples_matches_python_reimplementation(spark, expected):
    import __spark_entry__ as em
    from biocurator_mapper_spark.pipeline import build_triples

    pages = em._docs_as_pages(spark, SF_DIR)
    got = {
        r.subj: (r.pred, r.obj, r.mention, float(r.confidence))
        for r in build_triples(pages, em._vocab_terms(spark)).collect()
    }
    assert set(got) == set(expected)
    mismatches = {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}
    assert not mismatches, dict(list(mismatches.items())[:3])


def test_alternatives_shape(spark):
    """alternatives (not in the driver contract): duplicate-free candidate
    TERM ids (the canonical obj may legitimately appear — aliases collapse
    onto it), with multi-candidate pages present in the corpus."""
    import __spark_entry__ as em
    from biocurator_mapper_spark.pipeline import build_triples

    pages = em._docs_as_pages(spark, SF_DIR)
    rows = {r.subj: r for r in build_triples(pages, em._vocab_terms(spark)).collect()}
    for r in rows.values():
        assert len(r.alternatives) == len(set(r.alternatives))
    assert any(len(r.alternatives) > 0 for r in rows.values())
