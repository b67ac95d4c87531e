"""Hypothesis property tests for the pure-Python kernels (no Spark session —
these run in milliseconds and pin invariants fuzzing can break)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biocurator_mapper_spark.extract.html_text import extract_text_py
from biocurator_mapper_spark.functions.embed import hash_embed_py
from biocurator_mapper_spark.operators.canonicalize import _driver_union_find
from biocurator_mapper_spark.operators.mentions import AhoCorasick

text_st = st.text(alphabet=st.characters(codec="utf-8"), max_size=300)
small_word = st.text(alphabet="abcxy ", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(small_word, min_size=1, max_size=20), st.text(alphabet="abcxy ", max_size=120))
def test_aho_corasick_equals_naive_substring(patterns, text):
    ac = AhoCorasick(patterns)
    expected = sorted({p.lower() for p in patterns if p and p.lower() in text.lower()})
    assert ac.find_distinct(text) == expected


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_hash_embed_is_unit_or_zero(text):
    v = np.array(hash_embed_py(text))
    n = float(np.linalg.norm(v))
    assert abs(n - 1.0) < 1e-4 or n == 0.0


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_hash_embed_case_invariant_ascii(text):
    # ASCII only: unicode case-folding is not length-stable ('ß'.upper()=='SS')
    assert hash_embed_py(text) == hash_embed_py(text.upper())


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_extract_never_raises_and_is_deterministic(blob):
    a = extract_text_py(blob)
    b = extract_text_py(blob)
    assert a == b
    assert "<script" not in a.lower()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=40
    )
)
def test_union_find_partition_properties(edges):
    pairs = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges if a != b]
    comp = _driver_union_find(pairs)
    # every endpoint mapped; component rep is a member ≤ all members
    for u, v in pairs:
        assert comp[u] == comp[v]  # direct edges share a component
        assert comp[u] <= u and comp[v] <= v
    # transitivity: representative of a representative is itself
    for n, c in comp.items():
        assert comp.get(c, c) == c


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, width=32, allow_nan=False),
        min_size=1,
        max_size=32,
    )
)
def test_quantize_matches_sql_formula(vals):
    # quantize must equal floor(x*1000 + 0.5) computed in plain double
    # arithmetic — the exact expression every SQL oracle uses
    import math

    from biocurator_mapper_spark.operators.similarity import quantize

    got = quantize(np.array(vals, dtype=np.float64))
    want = [math.floor(float(v) * 1000.0 + 0.5) for v in vals]
    assert got.tolist() == want


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_plane_signs_shape_and_determinism(n_tables, n_planes, seed):
    from biocurator_mapper_spark.operators.similarity import plane_signs

    a = plane_signs(16, n_planes, n_tables, seed)
    b = plane_signs(16, n_planes, n_tables, seed)
    assert a.shape == (n_tables * n_planes, 16)
    assert set(np.unique(a)) <= {-1, 1}
    assert (a == b).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-5, max_value=5, width=32, allow_nan=False),
        min_size=16,
        max_size=16,
    )
)
def test_lsh_bucket_scale_invariance(vec):
    # positive scaling never changes a sign-LSH bucket (cosine geometry);
    # quantization can only flip near-zero dots, so scale UP
    from biocurator_mapper_spark.operators.similarity import plane_signs, quantize

    signs = plane_signs(16, 4, 2, seed=7)
    v = np.array(vec, dtype=np.float64)
    q1 = quantize(v) @ signs.T
    q2 = quantize(v * 4.0) @ signs.T
    # where the original dot is clearly nonzero, the scaled sign agrees
    for d1, d2 in zip(q1, q2):
        if abs(d1) > 16:  # > max per-component rounding drift (16 dims × ±0.5 × |s|=1)
            assert (d1 > 0) == (d2 > 0)
