"""Byte-identical HTML→text extraction (north-rule per-row invariant)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from biocurator_mapper_spark.extract import extract_text_py, with_extracted_text
from biocurator_mapper_spark.testdata import pages_dataframe

SURFACES = ["hemangiosarcoma", "type 2 diabetes mellitus", "apoptosis of T cells"]


def test_extract_pure_function_examples():
    html = (
        b"<!DOCTYPE html><html><head><title>T</title><script>x()</script></head>"
        b"<body><nav>menu</nav><main><article><p>Hello  world.</p>"
        b"<p>Second &amp; third.</p></article></main><footer>f</footer></body></html>"
    )
    assert extract_text_py(html) == "Hello world.\nSecond & third."
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"plain text no tags") == "plain text no tags"


def test_byte_identical_extraction_per_url(spark):
    pages = pages_dataframe(spark, SURFACES, n_pages=60, seed=42)
    out = with_extracted_text(pages).select("url", "text", "extracted_text").collect()
    assert len(out) == 64  # 60 + 4 edge rows
    for r in out:
        got = hashlib.sha256(r.extracted_text.encode("utf-8")).hexdigest()
        want = hashlib.sha256(r.text.encode("utf-8")).hexdigest()
        assert got == want, f"extraction drift at {r.url!r}: {r.extracted_text!r} != {r.text!r}"


def test_extraction_deterministic_across_runs(spark):
    pages = pages_dataframe(spark, SURFACES, n_pages=20, seed=7)
    a = with_extracted_text(pages).select("url", "extracted_text").collect()
    b = with_extracted_text(pages).select("url", "extracted_text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_edge_rows(spark):
    pages = pages_dataframe(spark, SURFACES, n_pages=5, seed=42)
    rows = {r.url: r for r in with_extracted_text(pages).collect()}
    assert rows["https://hub.example.com/edge/empty"].extracted_text == ""
    assert rows["https://hub.example.com/edge/boilerplate-only"].extracted_text == ""
    uni = rows["https://hub.example.com/edge/unicode"].extracted_text
    assert "ñáéíóú" in uni and "中文" in uni
    assert len(rows["https://hub.example.com/edge/long"].extracted_text) > 8000
