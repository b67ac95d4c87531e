"""The pipeline output must not depend on which side of DRIVER_TERMS_MAX
the ontology lands: driver-prepared and distributed ontology-side inputs
must yield identical triples (the two implementations of surface mapping,
canonicalization and term embedding are deliberately parallel — this is
the test seam at the threshold boundary)."""

from __future__ import annotations

import pytest

import biocurator_mapper_spark.pipeline.triples as triples_mod
from biocurator_mapper_spark.pipeline import build_triples
from biocurator_mapper_spark.testdata import pages_dataframe

SURFACES = ["hemangiosarcoma", "apoptosis of T cells", "type 2 diabetes mellitus"]


def _run(spark, terms, monkeypatch, driver_max):
    monkeypatch.setattr(triples_mod, "DRIVER_TERMS_MAX", driver_max)
    pages = pages_dataframe(spark, SURFACES, n_pages=40, seed=21)
    rows = build_triples(pages, terms).collect()
    return sorted(
        (r.subj, r.pred, r.obj, r.mention, r.alternatives, round(r.certainty, 6))
        for r in rows
    )


def test_driver_and_distributed_paths_identical(spark, terms, monkeypatch):
    via_driver = _run(spark, terms, monkeypatch, driver_max=200_000)
    via_distributed = _run(spark, terms, monkeypatch, driver_max=0)
    assert via_driver == via_distributed
    assert len(via_driver) > 10


def test_empty_pipeline_run(spark, terms, tmp_path):
    from biocurator_mapper_spark.pipeline.triples import TriplesPipeline
    from biocurator_mapper_spark.sources.catalog import ParquetCatalog

    catalog = ParquetCatalog(spark, str(tmp_path / "wh"))
    pipe = TriplesPipeline(catalog, n_buckets=4)
    # pages with NO ontology surfaces → zero triples; must not crash
    pages = spark.createDataFrame(
        [("u1", None, None, "nothing relevant at all", "en"),
         ("u2", None, None, "still nothing here", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = pipe.run(pages, terms, run_fingerprint="empty1")
    assert out.count() == 0
    assert "subj" in out.columns
    # catalog pointer registered → catalog.read path also tolerable
    m = catalog.read_log("_metrics").collect()
    assert m[0].rows_in == 2 and m[0].rows_out == 0
