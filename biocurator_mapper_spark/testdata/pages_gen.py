"""Deterministic synthetic ``pages`` table generator (BASELINE.json input_hint).

Schema: ``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
``html`` wraps a passage in nav/header/footer/script boilerplate that the
extractor must strip; ``text`` holds the exact expected extraction so tests can
assert byte-identical output per url (sha256(extracted) == sha256(text)).

Skew: ~30% of urls share one host (``hub.example.com``) to exercise salted
repartitioning, mirroring head-domain skew in real crawls. Seeded PRNG, no
wall-clock — fully reproducible at any scale.
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Passage templates; {m} is replaced with an ontology surface form.
_TEMPLATES = [
    "Patients with {m} often present late in the disease course.",
    "Recent studies describe {m} in unprecedented molecular detail.",
    "The review summarizes current treatment options for {m}.",
    "Researchers observed {m} in a cohort of 124 subjects.",
    "Clinical guidelines for {m} were updated this year.",
    "We measured markers associated with {m} across tissue samples.",
    "A mouse model recapitulates key features of {m}.",
    "Early screening reduces mortality attributable to {m}.",
]

_FILLER = [
    "The data were collected across three sites.",
    "Further validation is required before clinical use.",
    "Methods followed the previously published protocol.",
    "Funding sources had no role in study design.",
    "Results were consistent across all subgroups.",
]

_HOSTS = [
    "health.example.org",
    "med.example.net",
    "journal.example.edu",
    "wiki.example.io",
    "news.example.co",
]
HUB_HOST = "hub.example.com"

_BOILERPLATE_NAV = (
    '<nav class="top"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav>'
)
_BOILERPLATE_FOOTER = (
    "<footer>© 2026 Example Publishing. All rights reserved. "
    '<a href="/privacy">Privacy</a></footer>'
)
_BOILERPLATE_SCRIPT = "<script>window.analytics&&analytics.track('pv');</script>"
_BOILERPLATE_STYLE = "<style>body{font-family:serif}</style>"


def _html_for(title: str, paragraphs: list[str]) -> str:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>{_BOILERPLATE_STYLE}{_BOILERPLATE_SCRIPT}"
        "</head><body>"
        f"{_BOILERPLATE_NAV}<header><h1>{title}</h1></header>"
        f"<main><article>{body}</article></main>"
        f"{_BOILERPLATE_FOOTER}{_BOILERPLATE_SCRIPT}"
        "</body></html>"
    )


def _expected_text(title: str, paragraphs: list[str]) -> str:
    # The extractor contract: title+h1 dropped with boilerplate regions;
    # article paragraphs joined by newline, whitespace-normalized per block.
    return "\n".join(" ".join(p.split()) for p in paragraphs if p.strip())


def generate_pages_rows(
    surfaces: list[str],
    n_pages: int = 100,
    seed: int = 42,
    hub_fraction: float = 0.3,
    include_edge_rows: bool = True,
) -> list[tuple]:
    """Build deterministic page rows mentioning the given surface forms."""
    rng = random.Random(seed)
    epoch = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    rows: list[tuple] = []
    for i in range(n_pages):
        host = HUB_HOST if rng.random() < hub_fraction else rng.choice(_HOSTS)
        url = f"https://{host}/doc/{i:06d}"
        ts = epoch + _dt.timedelta(seconds=i * 61)
        n_par = rng.randint(1, 3)
        paragraphs = []
        for _ in range(n_par):
            if rng.random() < 0.8 and surfaces:
                m = rng.choice(surfaces)
                paragraphs.append(rng.choice(_TEMPLATES).format(m=m))
            else:
                paragraphs.append(rng.choice(_FILLER))
        title = f"Document {i}"
        html = _html_for(title, paragraphs)
        text = _expected_text(title, paragraphs)
        lang = "en" if rng.random() < 0.9 else rng.choice(["es", "zh"])
        rows.append((url, ts, html.encode("utf-8"), text, lang))

    if include_edge_rows:
        base = len(rows)
        # empty body
        rows.append(
            (
                f"https://{HUB_HOST}/edge/empty",
                epoch + _dt.timedelta(seconds=base * 61),
                _html_for("Empty", []).encode("utf-8"),
                "",
                "en",
            )
        )
        # unicode passage
        upar = ["Estudio de ñáéíóú αβγδε 中文 العربية con hemangiosarcoma."]
        rows.append(
            (
                f"https://{HUB_HOST}/edge/unicode",
                epoch + _dt.timedelta(seconds=(base + 1) * 61),
                _html_for("Unicode", upar).encode("utf-8"),
                _expected_text("Unicode", upar),
                "es",
            )
        )
        # >8000-char passage (embed-text truncation path)
        longp = [("apoptosis of T cells was observed repeatedly in the assay. " * 160).strip()]
        rows.append(
            (
                f"https://{HUB_HOST}/edge/long",
                epoch + _dt.timedelta(seconds=(base + 2) * 61),
                _html_for("Long", longp).encode("utf-8"),
                _expected_text("Long", longp),
                "en",
            )
        )
        # html that extracts to empty text (only boilerplate)
        only_boiler = (
            "<!DOCTYPE html><html><head><title>B</title></head><body>"
            f"{_BOILERPLATE_NAV}{_BOILERPLATE_FOOTER}</body></html>"
        )
        rows.append(
            (
                f"https://{HUB_HOST}/edge/boilerplate-only",
                epoch + _dt.timedelta(seconds=(base + 3) * 61),
                only_boiler.encode("utf-8"),
                "",
                "en",
            )
        )
    return rows


def pages_dataframe(
    spark: SparkSession,
    surfaces: list[str],
    n_pages: int = 100,
    seed: int = 42,
    **kw,
) -> DataFrame:
    rows = generate_pages_rows(surfaces, n_pages=n_pages, seed=seed, **kw)
    return spark.createDataFrame(rows, PAGES_SCHEMA)
