"""Deduplication operators for training-data pipelines.

Five families, each designed scale-first:

- exact: hash-groupBy on content (one shuffle, partial agg);
- fingerprint: exact after normalization (md5 of collapsed text);
- n-gram Jaccard: shingle explode + self-join on shingle, with a document-
  frequency cap on shingles (stop-shingle removal) so hub shingles never
  explode the join;
- MinHash + LSH: per-seed min over md5'd shingles (min of hex strings —
  engine-agnostic, SQL-oracle-checkable), banded into buckets, candidate
  pairs only within buckets (the 100 TB path: no all-pairs anywhere);
- SimHash: 48-bit sign-sum sketch, built entirely with higher-order
  functions (JVM codegen, no Python).

All functions are pure plan builders (no actions), except dedup_clusters
(connected components is iterative and must run jobs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- tokenizing


def tokens_expr(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text (space-joined).

    Built by zipping n shifted views of the token array (one concat per
    shingle) rather than a per-index ``slice`` + ``array_join`` — the
    higher-order-function path is interpreted, so allocation count per
    shingle dominates; the zip formulation measures ~2× faster.

    The token array is bound ONCE via ``let_expr``: the construction
    references it ~(n + 5) times, and without the binding every reference
    re-runs the regex split + filter over the full text per row.
    """
    from ..functions.exprs import let_expr, zip_ngrams_expr

    def _build(toks: Column) -> Column:
        grams = zip_ngrams_expr(toks, n)
        return F.array_distinct(
            F.when(F.size(toks) >= n, grams).otherwise(
                # short docs: one shingle = whole token string, so they can
                # still pair with identical short docs
                F.when(
                    F.size(toks) > 0, F.array(F.array_join(toks, " "))
                ).otherwise(F.array().cast("array<string>"))
            )
        )

    return let_expr(tokens_expr(text), _build)


# ------------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """One representative (min id) per exact content group + dup count."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("representative_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized-content fingerprint."""
    from ..functions.text import doc_fingerprint

    return (
        df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# --------------------------------------------------------------- n-gram Jaccard


DEFAULT_MAX_SHINGLE_DF = 256


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Plan: explode distinct shingles → drop shingles whose doc frequency
    exceeds ``max_shingle_df`` (hub shingles contribute O(df²) candidate
    pairs and little signal; on a web corpus one boilerplate shingle can be
    millions-deep, so the cap is ON by default — pass None to disable) →
    self-join on shingle → count intersections → join per-doc sizes →
    Jaccard filter. Intersection counting is a hash aggregate with
    map-side partial combine. Prefer ``minhash_lsh_pairs`` when the corpus
    is large enough that even capped exact intersection counting is wide.
    """
    # explode_OUTER + cheap null filter: plain explode over the shingle
    # HOF chain triggers InferFiltersFromGenerate, whose size()>0 filter
    # re-evaluates the whole chain per row (the filter is pushed below the
    # project by alias substitution). Outer explode + isNotNull on the
    # GENERATED attribute evaluates the chain exactly once.
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(shingles_expr(F.col(text_col), n)).alias("shingle"),
    ).where(F.col("shingle").isNotNull())
    # Two birds with one round-robin shuffle of the shingle rows: (1) an
    # under-partitioned source (one parquet split) would evaluate the
    # shingle HOFs single-threaded; (2) this plan consumes `sh` from four
    # subtrees (a/b/sizes/hot) — the exchange's map side materializes once
    # and the scheduler SKIPS it for every later consumer (verified: the
    # map stage shows completed once, then numCompletedTasks=0 skips), so
    # the shingle expressions run ONCE instead of per consumer.
    spark = df.sparkSession
    default_p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(default_p // 2, 1):
        sh = sh.repartition(default_p)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df")).where(
            F.col("_df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # sizes AFTER the cap: Jaccard is then exact over the retained shingle
    # sets (pre-cap sizes would deflate scores and let identical docs with
    # many hub shingles escape the threshold)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.withColumnRenamed("_id", "id_a")
    b = sh.withColumnRenamed("_id", "id_b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter")
            / (F.col("_sza") + F.col("_szb") - F.col("_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ------------------------------------------------------------------ MinHash


def minhash_signature_cols(text: Column, n: int = 3, num_hashes: int = 16) -> list[Column]:
    """num_hashes MinHash values: per seed, the MIN over shingles of
    md5(seed ∥ shingle) hex (string min — identical semantics in any engine).
    Null when the document has no shingles."""
    sh = shingles_expr(text, n)

    def _mh(i: int) -> Column:
        # helper, NOT a `lambda s, i=i:` default — a two-arg transform
        # lambda receives (element, INDEX) and would silently bind the
        # index Column as the seed (see CLAUDE.md)
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        ).alias(f"mh_{i}")

    return [_mh(i) for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band, verified with exact Jaccard.

    Scale path — the classic explode → hash-aggregate formulation:

    1. explode distinct shingles to (id, shingle) rows — each shingle is
       md5'd exactly ONCE per seed inside one hash aggregate with map-side
       partial mins (array-expression formulations re-evaluate the whole
       shingle tree per signature column; at 5k docs that was already 20×
       slower, and it only gets worse with size);
    2. band the 16 mins into ``bands`` md5 keys, explode to (id, band) rows;
    3. bucket self-join on (band_no, band_val) — only full-band agreement
       pairs up, no all-pairs product;
    4. exact Jaccard verification joins the candidate ids back to their
       shingle sets (computed once per side).
    """
    # signatures/bands/sets come from the shared helper (see
    # _banded_signatures): the 16 md5s/shingle run once in the partial-agg
    # stage after an adaptive round-robin split fix, and the exact-verify
    # shingle SETS are rebuilt from the already-shuffled exploded rows
    # (the scheduler skips the materialized shuffle map stage on reuse)
    # instead of re-evaluating the HOF chain per side.
    banded, sets = _banded_signatures(df, id_col, text_col, n, num_hashes, bands)
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_no", "band_val"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sa = sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sb = sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size("_sha") + F.size("_shb") - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter / union.cast("double")).otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
) -> tuple[DataFrame, DataFrame]:
    """(banded(_id, band_no, band_val), sets(_id, _sh)) for one corpus —
    the shared explode→hash-agg signature path of the LSH family."""
    rows_per_band = num_hashes // bands
    # explode_outer + isNotNull on the generated attribute: evaluates the
    # shingle HOF chain ONCE per row (a size()>0 pre-filter or an inferred
    # generate filter would re-evaluate it — alias substitution pushes
    # such filters below the projection). Shingle-less docs become one
    # null row and are dropped right here.
    exploded = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode_outer(shingles_expr(F.col(text_col), n)).alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )
    spark = df.sparkSession
    default_p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(default_p // 2, 1):
        exploded = exploded.repartition(default_p)
    sigs = exploded.groupBy("_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("_id", *band_cols).select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_no"), F.col(f"band_{b}").alias("band_val"))
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", F.col("band.band_no"), F.col("band.band_val"))
    sets = exploded.groupBy("_id").agg(F.collect_list("shingle").alias("_sh"))
    return banded, sets


def cross_minhash_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """(corpus_id, benchmark_id, jaccard) pairs ACROSS two corpora with
    Jaccard ≥ threshold — the train/eval decontamination primitive. Same
    banded-LSH shape as ``minhash_lsh_pairs`` (identical seeds, so signatures
    agree across the two sides), but the candidate join pairs corpus bands
    against benchmark bands only: cost scales with band collisions, never
    |corpus| × |benchmark|."""
    ba, sa = _banded_signatures(corpus, id_col, text_col, n, num_hashes, bands)
    bb, sb = _banded_signatures(benchmark, id_col, text_col, n, num_hashes, bands)
    cands = (
        ba.join(bb.withColumnRenamed("_id", "_bid"), ["band_no", "band_val"])
        .select(F.col("_id").alias("corpus_id"), F.col("_bid").alias("benchmark_id"))
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size("_sha") + F.size("_shb") - inter
    return (
        cands.join(sa.select(F.col("_id").alias("corpus_id"), F.col("_sh").alias("_sha")), "corpus_id")
        .join(sb.select(F.col("_id").alias("benchmark_id"), F.col("_sh").alias("_shb")), "benchmark_id")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter / union.cast("double")).otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("corpus_id", "benchmark_id", "jaccard")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Corpus rows that are NOT near-duplicates of any benchmark document
    (train/test contamination removal): cross-LSH pairs → anti-join."""
    contaminated = cross_minhash_pairs(
        corpus, benchmark, id_col, text_col, n=n, num_hashes=num_hashes,
        bands=bands, threshold=threshold,
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(contaminated, id_col, "left_anti")


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Duplicate-cluster assignment: near-dup pairs (MinHash-LSH candidates
    verified at exact Jaccard ≥ threshold) → connected components → every
    doc mapped to its cluster representative (min id). The standard
    dedup-keep-one step of a training-data pipeline: filter
    ``is_duplicate`` to drop non-representatives.

    Pair generation is the LSH path (banded buckets, no all-pairs-on-shared-
    shingle join) — the 100 TB-safe default; raise ``bands`` to trade
    compute for recall near the threshold.

    NOT a pure plan builder: connected components is iterative, so calling
    this runs jobs. Integer ids must be non-negative (representatives are
    chosen by order-preserving zero-padding; negative values would compare
    wrongly).
    """
    from pyspark.sql.types import IntegralType

    from .canonicalize import connected_components

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands,
        threshold=threshold,
    ).cache()  # CC consumes the pairs 2-3× (count + collect/iterations)
    id_type = df.schema[id_col].dataType
    if isinstance(id_type, IntegralType):
        # CC compares node ids as strings — zero-pad non-negative integers
        # so string order equals numeric order ("100" < "2" otherwise)
        pad = lambda c: F.format_string("%020d", c)  # noqa: E731
    else:
        pad = lambda c: c.cast("string")  # noqa: E731
    cc = connected_components(
        pairs.select(pad(F.col("id_a")).alias("src"), pad(F.col("id_b")).alias("dst"))
    ).localCheckpoint(eager=True)  # node-sized; lets the pairs cache go
    pairs.unpersist()
    mapped = cc.select(
        F.col("node").cast(id_type).alias(id_col),
        F.col("component").cast(id_type).alias("representative_id"),
    )
    return (
        df.select(id_col)
        .join(mapped, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("representative_id"), F.col(id_col)).alias(
                "representative_id"
            ),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("representative_id"))
    )


def ngram_frequencies(
    df: DataFrame, text_col: str, n: int = 2, top: int = 100
) -> DataFrame:
    """Corpus-level top-N n-gram document frequencies (distinct per doc) —
    the vocabulary/stop-shingle profiling step of a data pipeline. One
    explode + one hash aggregate + a bounded ordered limit."""
    sh = df.select(
        F.explode_outer(shingles_expr(F.col(text_col), n)).alias("ngram")
    ).where(F.col("ngram").isNotNull())
    return (
        sh.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("ngram"))
        .limit(top)
    )


# ------------------------------------------------------------------ SimHash

SIMHASH_BITS = 48


def simhash_expr(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-sum SimHash over token md5s, as one aggregate over the token
    array (whole-stage codegen; no UDF). Returns a bigint sketch."""
    toks = F.array_distinct(tokens_expr(text))
    # token hash: first 12 hex chars of md5 → 48-bit bigint, computed ONCE
    # per token (HOF expressions get no CSE — instantiating the md5 inside
    # the 48-element bit comprehension would hash every token 48x)
    th = lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")  # noqa: E731
    hashed = F.transform(toks, th)
    zero = F.array(*[F.lit(0) for _ in range(bits)])
    # bit positions are static → unrolled with Python ints (shiftright
    # requires a literal shift amount)
    sums = F.aggregate(
        hashed,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for b in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    return F.aggregate(
        F.zip_with(
            sums, weights, lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming64_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash ≤ max_hamming, using the block-permutation
    trick: split the sketch into ``blocks`` chunks — any pair within distance
    max_hamming < blocks must agree on ≥1 chunk, so the self-join keys on
    (chunk_no, chunk_value) instead of all pairs."""
    if max_hamming >= blocks:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < blocks ({blocks}); the "
            "pigeonhole recall guarantee needs one agreeing chunk"
        )
    width = bits // blocks
    mask = (1 << width) - 1
    s = df.select(F.col(id_col).alias("_id"), simhash_expr(F.col(text_col), bits).alias("sim"))
    chunks = s.select(
        "_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_no"),
                        F.shiftright(F.col("sim"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select("_id", "sim", F.col("c.chunk_no"), F.col("c.chunk_val"))
    a = chunks.select("chunk_no", "chunk_val", F.col("_id").alias("id_a"), F.col("sim").alias("_sa"))
    b = chunks.select("chunk_no", "chunk_val", F.col("_id").alias("id_b"), F.col("sim").alias("_sb"))
    return (
        a.join(b, ["chunk_no", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64_expr(F.col("_sa"), F.col("_sb")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
