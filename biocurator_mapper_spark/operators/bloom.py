"""Bloom-filter decontamination: memory-bounded exact n-gram membership.

``dedup.exact_ngram_collisions`` broadcasts the benchmark's DISTINCT
n-gram hash set — dimension-sized for normal eval suites, but a
mega-benchmark (or a blocklist of leaked documents) can outgrow a
comfortable broadcast. This tier replaces the broadcast SET with a
broadcast BLOOM FILTER of fixed size (default 2²⁰ bits = 128 KiB hex,
independent of benchmark size): corpus grams probe k bit positions in a
hex-string bitmap with pure codegen expressions, and only the docs with a
passing gram — the contamination candidates, a tiny fraction of the
corpus — reach the exact verification join.

Result-IDENTICAL to the exact tier by construction: a Bloom filter has no
false negatives (every true collision passes the probe), and the false
positives are removed by running ``exact_ngram_collisions`` on the
candidate subset. That identity is the contract oracle.

All hashing is the repo's engine-agnostic integer arithmetic: the 60-bit
md5 gram hash feeds k universal-hash probes ``(a·(h % M) + b) % M % m``
(the MinHash constants — a·h < 2⁶², exact in signed 64-bit on any
engine), so the same filter can be built and probed from SQL if needed.

Scale notes (100 TB): the filter build is one explode + distinct over the
BENCHMARK (small side) collected as ≤ m bit positions; the corpus-side
probe is a narrow per-row expression (k substr+conv lookups per gram)
with zero state — no join, no shuffle — followed by the existing
candidate-bounded exact semi-join. Size ``m_bits`` for the benchmark's
distinct-gram count (k=3, m ≈ 14·n_grams gives ~1% false positives;
false positives cost verify work, never correctness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _MINHASH_AB, MINHASH_MOD, _hashed_shingle_rows

BLOOM_M_BITS = 1 << 20
BLOOM_K = 3


def _probe_positions_expr(h: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(
            F.pmod(F.lit(a) * F.pmod(h, F.lit(MINHASH_MOD)) + F.lit(b), F.lit(MINHASH_MOD)),
            F.lit(m_bits),
        )
        for a, b in _MINHASH_AB[:k]
    ]


def bloom_bits_hex(
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """Build the benchmark's n-gram Bloom filter as a hex string (m_bits/4
    chars; nibble i holds bits [4i, 4i+4), bit j of a nibble = position
    4i+j). One explode + distinct over the benchmark; positions collect
    driver-side (≤ m_bits ints)."""
    bh = _hashed_shingle_rows(benchmark, id_col, text_col, n).select("h").distinct()
    pos_rows = (
        bh.select(
            F.explode(F.array(*_probe_positions_expr(F.col("h"), m_bits, k))).alias("p")
        )
        .distinct()
        .collect()
    )
    nibbles = bytearray(m_bits // 4)
    for r in pos_rows:
        p = int(r.p)
        nibbles[p >> 2] |= 1 << (p & 3)
    return "".join(format(v, "x") for v in nibbles)


def bloom_member_expr(
    h: Column, bits_hex: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """True iff every probe bit of gram-hash ``h`` is set in ``bits_hex``
    (pure codegen: k substr + conv nibble lookups)."""
    cond = F.lit(True)
    for pos in _probe_positions_expr(h, m_bits, k):
        nib = F.conv(
            F.substring(bits_hex, (pos / 4).cast("int") + 1, 1), 16, 10
        ).cast("int")
        # bit mask for position-within-nibble (shiftleft needs a literal
        # shift amount, so index a 4-element mask array instead)
        bit = F.try_element_at(
            F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8)),
            F.pmod(pos, F.lit(4)).cast("int") + 1,
        )
        cond = cond & (nib.bitwiseAND(bit) != 0)
    return cond


def bloom_contamination_candidates(
    corpus: DataFrame,
    bits_hex: str,
    id_col: str,
    text_col: str,
    n: int = 13,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Corpus ids with ≥1 gram passing the Bloom probe — a SUPERSET of the
    truly contaminated ids (no false negatives), typically a tiny slice of
    the corpus. Narrow: explode → probe filter → distinct ids."""
    ch = _hashed_shingle_rows(corpus, id_col, text_col, n)
    return (
        ch.where(bloom_member_expr(F.col("h"), F.lit(bits_hex), m_bits, k))
        .select(F.col("_id").alias(id_col))
        .distinct()
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Corpus rows with NO exact word n-gram collision against the
    benchmark — ``dedup.decontaminate_exact`` semantics, memory-bounded:
    the broadcast is a fixed-size bitmap, the exact verification join runs
    only over the Bloom candidates, and false positives are verified away
    (result-identical to the exact tier, pinned by test and oracle)."""
    from .dedup import exact_ngram_collisions

    bits = bloom_bits_hex(benchmark, id_col, text_col, n, m_bits, k)
    cands = bloom_contamination_candidates(
        corpus, bits, id_col, text_col, n, m_bits, k
    )
    # the verify join deliberately does NOT broadcast the benchmark gram
    # set (that's the memory bound this tier exists for): candidates are a
    # tiny corpus slice, so the hash-key shuffle join is small on both
    # sides. AQE broadcasts the candidate id set on its own when it fits.
    suspect = corpus.join(cands, id_col, "left_semi")
    contaminated = exact_ngram_collisions(
        suspect, benchmark, id_col, text_col, n, broadcast_benchmark=False
    )
    return corpus.join(contaminated, id_col, "left_anti")
