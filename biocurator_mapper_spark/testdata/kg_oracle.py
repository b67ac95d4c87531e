"""Independent plain-Python re-derivation of the flagship triple output.

The pipeline's decision chain (mention scan → hash embeddings → per-term
collapse → top-k → exactness rerank → canonicalize) is NOT SQL-expressible
end-to-end (the certainties come from the hash-embedding space), so the
kg_triples oracle can't be a DuckDB re-derivation. Instead, this module
recomputes the expected output FROM THE RAW INPUTS with none of the
engine's DataFrame code: plain loops over the documents table, the same
pure functions (``hash_embed_py``), a left-to-right double cosine fold,
and a from-scratch restatement of the collapse/top-k/rerank rules. The
driver gate inlines these rows as a VALUES table; the pytest differential
(tests/test_kg_differential.py) asserts bit-exactness the same way.

If the pipeline and this file ever disagree, one of them is wrong — they
share no plan-construction code.
"""

from __future__ import annotations

import math

import numpy as np


def _cosine_fold(a, b) -> float:
    """Left-to-right double fold — functions/embed.py::cosine_expr."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    na, nb = math.sqrt(na), math.sqrt(nb)
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def expected_triples(sf_dir: str, vocab_rows: list[tuple], k: int = 5) -> list[tuple]:
    """documents @ sf_dir × the vocab ontology → [(subj, pred, obj,
    mention, confidence_float32)] — the flagship contract's expected rows."""
    import duckdb

    from ..functions.embed import hash_embed_py
    from ..operators.canonicalize import _driver_union_find

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()

    # surface map + exactness + searchable text + alias graph, straight
    # from the raw vocab rows (go_parser semantics, restated)
    surfaces: dict[str, list[str]] = {}
    exact: set[tuple[str, str]] = set()
    term_vec: dict[str, list[float]] = {}
    edges = []
    term_ids = []
    for tid, name, definition, exact_syn, _n, _b, _r, all_syn, xrefs, _ns in vocab_rows:
        term_ids.append(tid)
        for s in [name, *all_syn]:
            surfaces.setdefault(s.lower(), []).append(tid)
        for s in [name, *exact_syn]:
            exact.add((s.lower(), tid))
        searchable = " ".join(
            p for p in [name, definition, " ".join(all_syn)] if p
        )
        term_vec[tid] = hash_embed_py(searchable)
        for x in xrefs:
            edges.append((tid, f"xref:{x}"))
    comp = _driver_union_find(edges)
    by_comp: dict[str, str] = {}
    for t in term_ids:
        c = comp.get(t)
        if c is not None:
            by_comp[c] = min(by_comp.get(c, t), t)
    canonical = {t: by_comp[comp[t]] for t in term_ids if t in comp}

    out = []
    for doc_id, text in docs:
        low = text.lower()
        cands: dict[str, list[str]] = {}
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
        topk = sorted(per_term, key=lambda c: (-c[1], c[0]))[:k]
        ranked = sorted(
            topk, key=lambda c: (-((1.0 if c[2] else 0.0) + c[1]), -c[1], c[0])
        )
        t, cert, is_exact, mention = ranked[0]
        obj = canonical.get(t, t)
        confidence = float(np.float32(min(1.0, cert + (0.05 if is_exact else 0.0))))
        out.append(
            (f"doc://{doc_id}", f"{obj.split(':')[0]}:mapped_to", obj, mention, confidence)
        )
    return out
