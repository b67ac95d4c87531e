"""Resolver (interactive path parity with the reference endpoint) + CLI."""

from __future__ import annotations

import json

from biocurator_mapper_spark.pipeline.resolve import Resolver


def test_resolve_flagship_passage(spark, terms):
    r = Resolver(terms, k=5)
    out = r.resolve("apoptosis of T cells")
    # README flagship: the passage resolves to the apoptotic process term
    assert out["best_match"]["id"] == "GO:0006915"
    assert out["confidence"] > 0.5
    assert "error" not in out
    assert len(out["alternatives"]) == 4
    assert all(a["id"] != "GO:0006915" for a in out["alternatives"])


def test_resolve_exact_name_beats_similarity(spark, terms):
    r = Resolver(terms, k=5)
    out = r.resolve("Patient diagnosed with angiosarcoma in 2025.")
    assert out["best_match"]["id"] == "DOID:0001816"
    assert "exact surface match" in out["reason"]


def test_resolve_no_surface_still_answers(spark, terms):
    # no dictionary surface at all — the reference still returns the vector
    # top-k best pick (no mention gate on the interactive path)
    r = Resolver(terms, k=5)
    out = r.resolve("the cell died in a programmed manner")
    assert "best_match" in out and out["confidence"] > 0
    assert len(out["alternatives"]) == 4


def test_resolve_empty_ontology_errors(spark, terms):
    empty = terms.where("term_id = 'nope'")
    r = Resolver(empty)
    assert r.resolve("anything") == {"error": "No candidates provided"}


def test_cli_ingest_resolve_status(spark, tmp_path, monkeypatch):
    # run CLI mains in-process against a temp warehouse (reusing the session)
    import biocurator_mapper_spark.cli as cli
    import json as _json

    from biocurator_mapper_spark.testdata import comprehensive_obo_graph

    monkeypatch.setattr(cli, "_spark", lambda: spark)
    src = tmp_path / "onto.json"
    src.write_text(_json.dumps(comprehensive_obo_graph()))
    wh = str(tmp_path / "wh")

    import io
    from contextlib import redirect_stdout

    def run(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli.main(argv)
        return rc, buf.getvalue()

    rc, out = run(["--warehouse", wh, "ingest", str(src), "--ontology", "doid"])
    assert rc == 0
    assert json.loads(out)["n_terms"] == 9 and json.loads(out)["rebuilt"]

    rc, out = run(["--warehouse", wh, "ingest", str(src), "--ontology", "doid"])
    assert not json.loads(out)["rebuilt"]  # version gate skips

    rc, out = run(["--warehouse", wh, "resolve", "hemangiosarcoma was found", "--ontology", "doid"])
    assert json.loads(out)["best_match"]["id"] == "DOID:0001816"

    rc, out = run(["--warehouse", wh, "embed", "--ontology", "doid"])
    assert rc == 0 and json.loads(out)["embedded"] > 0

    rc, out = run(["--warehouse", wh, "status"])
    assert rc == 0 and "ontology_versions" in json.loads(out)
