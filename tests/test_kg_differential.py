"""Full-pipeline differential: an independent plain-Python reimplementation
of the triple decision chain (mention scan → hash embeddings → per-term
collapse → top-k → exactness rerank → canonicalization) must reproduce
``build_triples`` EXACTLY — every column including the float32 confidence —
over the sf0.001 documents corpus. This covers the embedding-dependent tail
the SQL oracles can't express (kg_triples is rows-only in the driver gate;
this test is its differential twin)."""

from __future__ import annotations

import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _cosine_fold(a, b):
    """Replicates functions/embed.py::cosine_expr: double cast before
    multiply, left-to-right fold."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    na, nb = math.sqrt(na), math.sqrt(nb)
    if na > 0 and nb > 0:
        return dot / (na * nb)
    return 0.0


@pytest.fixture(scope="module")
def expected_triples():
    import numpy as np

    import __spark_entry__ as em
    from biocurator_mapper_spark.functions.embed import hash_embed_py

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()

    # vocab ontology: same rows the contract query builds
    surfaces = {s: [] for s, _ in em.DICT}
    for s, t in em.DICT:
        surfaces[s].append(t)
    exact = {(s, t) for s, t in em.EXACT_DICT}
    term_text = {
        "OP:0001": "table scan A full pass over a table reading every row in storage order. scan join",
        "OP:0002": "hash join An equi join implemented by building a hash table on one side. merge join sort merge",
        "OP:0003": "window agg An aggregation computed over a sliding or partitioned window frame.",
        "OP:0004": "batch stream A micro batch execution mode for continuous streaming data.",
        "OP:0005": "key order Maintaining rows sorted by key for downstream merge operators. order sort",
    }
    canonical = {"OP:0005": "OP:0002"}  # OP:0002/OP:0005 share xref XOP:JOIN
    term_vec = {t: hash_embed_py(txt) for t, txt in term_text.items()}

    out = {}
    for doc_id, text in docs:
        low = text.lower()
        cands = {}
        for s, terms in surfaces.items():
            if s in low:
                for t in terms:
                    cands.setdefault(t, []).append(s)
        if not cands:
            continue
        pv = hash_embed_py(text)
        per_term = []
        for t, ments in cands.items():
            cert = (1.0 + _cosine_fold(pv, term_vec[t])) / 2.0
            is_exact = any((m, t) in exact for m in ments)
            mention = sorted(ments, key=lambda m: (-len(m), m))[0]
            per_term.append((t, cert, is_exact, mention))
        # top-k by certainty (struct sort: -cert, then term_id asc)
        topk = sorted(per_term, key=lambda c: (-c[1], c[0]))[:5]
        # rerank: -(bonus+cert), then -cert, then term_id
        ranked = sorted(
            topk, key=lambda c: (-((1.0 if c[2] else 0.0) + c[1]), -c[1], c[0])
        )
        t, cert, is_exact, mention = ranked[0]
        obj = canonical.get(t, t)
        confidence = np.float32(min(1.0, cert + (0.05 if is_exact else 0.0)))
        out[f"doc://{doc_id}"] = (
            f"{obj.split(':')[0]}:mapped_to",
            obj,
            mention,
            float(confidence),
            [c[0] for c in ranked[1:]],
        )
    return out


def test_build_triples_matches_python_reimplementation(spark, expected_triples):
    import __spark_entry__ as em
    from biocurator_mapper_spark.pipeline import build_triples

    pages = em._docs_as_pages(spark, SF_DIR)
    got = {
        r.subj: (r.pred, r.obj, r.mention, float(r.confidence), list(r.alternatives))
        for r in build_triples(pages, em._vocab_terms(spark)).collect()
    }
    assert set(got) == set(expected_triples)
    mismatches = {
        k: (got[k], expected_triples[k])
        for k in got
        if got[k] != expected_triples[k]
    }
    assert not mismatches, dict(list(mismatches.items())[:3])
