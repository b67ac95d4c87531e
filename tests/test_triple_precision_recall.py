"""Triple P/R gate (north rule: P/R ≥ 0.95 vs the reference's decisions).

The reference's decision logic on fixture-style inputs is deterministic
given its validation rules (candidate must be recalled, exact synonym/name
evidence beats raw similarity — the prompt instructs exactly this and the
response validator enforces id ∈ candidates, llm_matcher.py:105-114). This
test encodes the expected (subj → obj) mapping for a page set where each
page carries unambiguous surface evidence, runs the full pipeline, and
gates precision & recall at ≥ 0.95.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biocurator_mapper_spark.pipeline import build_triples

# (passage template, expected winning CURIE) — surfaces chosen so the
# reference's decision rule (exact synonym/name evidence) is unambiguous.
CASES = [
    ("Patients with hemangiosarcoma were enrolled.", "DOID:0001816"),
    ("The tumor was classified as angiosarcoma last spring.", "DOID:0001816"),
    ("Management of type 2 diabetes mellitus remains difficult.", "DOID:9352"),
    ("NIDDM incidence doubled in the cohort.", "DOID:9352"),
    ("Non-insulin-dependent diabetes mellitus in adolescents.", "DOID:9352"),
    ("We observed apoptosis of T cells in culture.", "GO:0006915"),
    ("Programmed cell death signaling was disrupted.", "GO:0006915"),
    ("COVID-19 remains a reportable condition.", "DOID:0080600"),
    ("Coronavirus disease 2019 spread rapidly.", "DOID:0080600"),
    ("Mitochondrial inheritance patterns were mapped.", "GO:0000001"),
    ("High-affinity zinc transmembrane transporter activity assays.", "GO:0000006"),
    ("Mitochondrial genome maintenance is essential.", "GO:0000002"),
    ("A classic case of cell process disease.", "DOID:14566"),
    ("This zinc transporter localizes to the membrane.", "GO:0000006"),
    ("2019 novel coronavirus infection was confirmed.", "DOID:0080600"),
    ("Epithelioid angiosarcoma subtype was reported.", "DOID:0001816"),
    # negative rows: no ontology surface at all → must emit NO triple
    ("Completely unrelated prose about sailing boats.", None),
    ("Weather was mild and the harvest plentiful.", None),
]


def test_triple_precision_recall(spark, terms):
    rows = [
        (f"https://pr.test/{i:03d}", None, None, passage, "en")
        for i, (passage, _) in enumerate(CASES)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = {
        r.subj: r.obj for r in build_triples(pages, terms).collect()
    }

    expected = {
        f"https://pr.test/{i:03d}": curie
        for i, (_, curie) in enumerate(CASES)
        if curie is not None
    }
    tp = sum(1 for u, c in expected.items() if got.get(u) == c)
    fp = sum(1 for u, c in got.items() if expected.get(u) != c)
    fn = sum(1 for u in expected if u not in got or got[u] != expected[u])
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.95, (precision, {u: (got.get(u), expected.get(u)) for u in set(got) | set(expected) if got.get(u) != expected.get(u)})
    assert recall >= 0.95, (recall,)
    # negative rows must not produce triples
    for i, (_, curie) in enumerate(CASES):
        if curie is None:
            assert f"https://pr.test/{i:03d}" not in got
