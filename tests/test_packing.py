"""Sequence packing: distributed prefix sum equals the naive global window,
boundary semantics are exact, and the plan has no single-partition
corpus-wide window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from biocurator_mapper_spark.operators.packing import pack_sequences


def _naive(df, ctx):
    """Single-partition global-window formulation (the scale-broken
    textbook version) as the differential oracle."""
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return {
        r.doc_id: (r.cum_before, r.seq_id, r.seq_offset, r.end_seq_id)
        for r in df.select(
            "doc_id",
            cum.alias("cum_before"),
            F.floor(cum / ctx).cast("bigint").alias("seq_id"),
            (cum % ctx).cast("bigint").alias("seq_offset"),
            F.floor((cum + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / ctx)
            .cast("bigint")
            .alias("end_seq_id"),
        ).collect()
    }


def test_pack_sequences_matches_naive_window(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from biocurator_mapper_spark.functions.text import token_count

    base = docs.select("doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens"))
    got = {
        r.doc_id: (r.cum_before, r.seq_id, r.seq_offset, r.end_seq_id)
        for r in pack_sequences(base, "doc_id", "n_tokens", ctx_len=512).collect()
    }
    assert got == _naive(base, 512)
    assert len(got) == 500


def test_pack_sequences_boundary_semantics(spark):
    # ctx=10; docs of 4, 6, 0, 12, 3 tokens at ids 1..5
    rows = [(1, 4), (2, 6), (3, 0), (4, 12), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.cum_before, r.seq_id, r.seq_offset, r.end_seq_id)
        for r in pack_sequences(df, "doc_id", "n_tokens", ctx_len=10, num_ranges=3).collect()
    }
    assert got[1] == (0, 0, 0, 0)    # tokens 0-3 in seq 0
    assert got[2] == (4, 0, 4, 0)    # tokens 4-9 fill seq 0 exactly
    assert got[3] == (10, 1, 0, 1)   # empty doc: collapses to its start seq
    assert got[4] == (10, 1, 0, 2)   # tokens 10-21 SPAN seqs 1 and 2
    assert got[5] == (22, 2, 2, 2)


def test_pack_sequences_many_ranges_and_skew(spark):
    # ids deliberately non-contiguous + heavy-tailed counts; more ranges
    # than natural splits
    rows = [(i * 7 + (i % 3), (i * 37) % 97) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.cum_before, r.seq_id)
        for r in pack_sequences(df, "doc_id", "n_tokens", ctx_len=64, num_ranges=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.doc_id: (r.c, r.s)
        for r in df.select(
            "doc_id",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("c"),
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 64)
            .cast("bigint")
            .alias("s"),
        ).collect()
    }
    assert got == want


def test_ordered_prefix_sum_randomized_vs_naive(spark):
    """Seeded randomized differential: arbitrary (negative, sparse, shuffled)
    ids, zero-heavy values, and adversarial num_ranges must all reproduce
    the naive global-window exclusive prefix sum exactly."""
    import random

    from biocurator_mapper_spark.operators.packing import ordered_prefix_sum

    rng = random.Random(42)
    for case in range(5):
        n = rng.randint(1, 300)
        ids = rng.sample(range(-10_000, 10_000), n)
        rows = [(i, rng.choice([0, 0, 1, 3, rng.randint(0, 500)])) for i in ids]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "doc_id long, v long")
        p = rng.choice([1, 2, 7, 64, 301])
        got = {
            r.doc_id: r.cum_before
            for r in ordered_prefix_sum(df, ["doc_id"], "v", num_ranges=p).collect()
        }
        acc, want = 0, {}
        for i, v in sorted(rows):
            want[i] = acc
            acc += v
        assert got == want, f"case {case} (n={n}, p={p})"


def test_shuffle_rank_is_seeded_permutation(spark):
    from biocurator_mapper_spark.operators.packing import shuffle_rank

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    a = {r.doc_id: r.shuffle_rank for r in shuffle_rank(docs, "doc_id", seed="7").collect()}
    # a permutation of 0..n-1
    assert sorted(a.values()) == list(range(500))
    # matches the naive global row_number over the same keys
    w = Window.orderBy(
        F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    want = {
        r.doc_id: r.rk
        for r in docs.select(
            "doc_id", (F.row_number().over(w) - 1).cast("bigint").alias("rk")
        ).collect()
    }
    assert a == want
    # same seed → same order; different seed → (overwhelmingly) different
    b = {r.doc_id: r.shuffle_rank for r in shuffle_rank(docs, "doc_id", seed="7").collect()}
    assert a == b
    c = {r.doc_id: r.shuffle_rank for r in shuffle_rank(docs, "doc_id", seed="8").collect()}
    assert a != c


def test_materialize_sequences_round_trip(spark):
    """Concatenating the materialized sequences in seq order reproduces the
    id-ordered token stream exactly; every sequence except the last is
    ctx_len tokens; boundary-spanning docs are split correctly."""
    from biocurator_mapper_spark.operators.packing import materialize_sequences

    rows = [
        (1, "a b c"),
        (2, "d e"),
        (3, ""),          # empty: contributes nothing
        (4, "f g h i j"),  # spans the 4-token boundary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9']+"), lambda t: t != "")
    out = {
        r.seq_id: (r.n_tokens, r.seq_text)
        for r in materialize_sequences(df, "doc_id", toks, ctx_len=4, num_ranges=3).collect()
    }
    assert out == {
        0: (4, "a b c d"),
        1: (4, "e f g h"),
        2: (2, "i j"),
    }

    # corpus round trip at an awkward ctx
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seqs = materialize_sequences(docs, "doc_id", toks, ctx_len=97).collect()
    stream = " ".join(s.seq_text for s in sorted(seqs, key=lambda r: r.seq_id))
    want = " ".join(
        t
        for r in sorted(docs.select("doc_id", "text").collect(), key=lambda r: r.doc_id)
        for t in __import__("re").split(r"[^a-z0-9']+", (r.text or "").lower())
        if t != ""
    )
    assert stream == want
    lens = [s.n_tokens for s in sorted(seqs, key=lambda r: r.seq_id)]
    assert all(n == 97 for n in lens[:-1]) and 0 < lens[-1] <= 97


def test_pack_sequences_no_global_single_partition_window(spark):
    """The corpus-wide window must be partitioned (parallel); only the
    per-range-totals window (p rows) may be partitionless."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = pack_sequences(
        docs.select("doc_id", F.col("n_chars").alias("n_tokens")),
        "doc_id",
        "n_tokens",
        ctx_len=512,
    )
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    low = plan.lower()
    # level 1 is ONE deterministic hash exchange on the bucket id — the
    # corpus window rides it partitioned (parallel), and the per-bucket
    # totals branch REUSES it instead of re-executing the child (the
    # spark_partition_id formulation was nondeterministic and forced a
    # full second evaluation)
    assert "hashpartitioning(_rg" in low
    assert "rangepartitioning" not in low
    assert "spark_partition_id" not in low
    assert "ReusedExchange" in plan, "payload exchange must be shared"

    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_chars", ctx_len=0)


def test_materialize_id_sequences_round_trip(spark):
    """The packed id stream equals the per-doc BPE encodings concatenated in
    id order (the tensor-ready training input); every window except the last
    is exactly ctx_len ids; boundary-spanning docs split correctly."""
    from biocurator_mapper_spark.functions.bpe import (
        bpe_encode_expr,
        merge_ranks,
        piece_token_ids,
        vocab_from_merges,
    )
    from biocurator_mapper_spark.functions.bpe_merges import MERGES
    from biocurator_mapper_spark.functions.text import BPE_TOKEN_RE
    from biocurator_mapper_spark.operators.packing import (
        materialize_id_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seqs = sorted(
        materialize_id_sequences(
            docs, "doc_id", bpe_encode_expr(F.col("text"), MERGES), ctx_len=97
        ).collect(),
        key=lambda r: r.seq_id,
    )
    stream = [i for s in seqs for i in s.seq_ids]

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, regexp_extract_all(coalesce(text, ''), ?) "
        "FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id",
        [BPE_TOKEN_RE],
    ).fetchall()
    con.close()
    ranks, vocab = merge_ranks(MERGES), vocab_from_merges(MERGES)
    want = [
        i
        for _d, pieces in rows
        for p in pieces
        for i in piece_token_ids(p, ranks, vocab)
    ]
    assert stream == want and len(want) > 0
    lens = [s.n_tokens for s in seqs]
    assert all(n == 97 for n in lens[:-1]) and 0 < lens[-1] <= 97
    assert [s.seq_id for s in seqs] == list(range(len(seqs)))
    assert all(len(s.seq_ids) == s.n_tokens for s in seqs)
