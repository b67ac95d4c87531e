"""Alias-graph canonicalization via connected components (SURVEY §2 J7).

The reference normalizes identifiers lexically only (``app/go_parser.py:
97-100``); the north rule requires canonicalizing surface forms / duplicate
CURIEs through the alias graph (term ↔ cross_reference edges, P5). This is
the alternating **large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond") expressed as DataFrame
self-joins:

- per-node minima come from ``groupBy(u).agg(min(v))`` — partial (map-side)
  aggregation absorbs hub-key skew before the shuffle;
- the min is joined back to the edge list (AQE skew-join splits any residual
  hot key) — no ``collect_list`` of neighborhoods, so a 10^8-degree hub node
  never materializes in one task;
- iterations converge in O(log d) rounds; each round is two shuffles.

Every iteration caches + counts, so the loop is deterministic and the driver
only ever sees per-round counts (never node data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dims import local_dim_df


def _large_star(edges: DataFrame) -> DataFrame:
    bi = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = bi.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select(
        "src", F.least(F.col("_mn"), F.col("src")).alias("_m")
    )
    return (
        bi.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    canon = edges.select(
        F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
    )
    mins = canon.groupBy("a").agg(F.min("b").alias("_m"))
    via_b = (
        canon.join(mins, "a")
        .select(F.col("b").alias("src"), F.col("_m").alias("dst"))
    )
    via_a = mins.select(F.col("a").alias("src"), F.col("_m").alias("dst"))
    return via_b.union(via_a).where(F.col("src") != F.col("dst")).distinct()


def _driver_union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over a broadcast-sized edge list (the fast path)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # final pass: root then min-relabel (roots are already minima because
    # unions always point the larger root at the smaller)
    return {n: find(n) for n in parent}


# Below this many edges the whole alias graph fits comfortably on the driver
# (same judgement call as broadcasting a small join side): union-find beats
# iterative shuffles by orders of magnitude. Above it, the large-star/
# small-star loop takes over.
DRIVER_CC_MAX_EDGES = 1_000_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    strategy: str = "auto",
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node id.

    Node ids are compared as their natural type (strings compare
    lexicographically). Self-loops and duplicates are tolerated.

    ``strategy``: 'auto' collects broadcast-sized edge lists
    (≤ DRIVER_CC_MAX_EDGES, cheap count first) to a driver union-find —
    the alias graph of a single ontology is dimension-sized, and an
    iterative shuffle loop on it wastes whole cluster rounds; 'distributed'
    forces the star loop (the web-scale surface-form graph path);
    'driver' forces the union-find.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    spark = edges.sparkSession
    if strategy != "distributed":
        if strategy == "driver":
            pairs_rows = e.collect()
        else:  # auto: one job both sizes and fetches
            pairs_rows = e.limit(DRIVER_CC_MAX_EDGES + 1).collect()
        if strategy == "driver" or len(pairs_rows) <= DRIVER_CC_MAX_EDGES:
            comp = _driver_union_find([(r.src, r.dst) for r in pairs_rows])
            # preserve the NODE ID TYPE: a hardcoded string schema made the
            # driver path crash on bigint ids the distributed path accepts
            # (size-dependent API behavior)
            from pyspark.sql.types import StructField, StructType

            node_type = edges.schema[src].dataType
            out_schema = StructType(
                [
                    StructField("node", node_type),
                    StructField("component", node_type),
                ]
            )
            return local_dim_df(spark, list(comp.items()), out_schema)
    all_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_iterations):
        # localCheckpoint truncates lineage — the star operators reference
        # their input twice, so without it the logical plan doubles per
        # round and overflows the analyzer stack by ~iteration 8.
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # convergence check: stable (count, xor-ish hash) signature.
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.hash("src", "dst").cast("long")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # final edge set is a forest of stars pointing at component minima
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return (
        all_nodes.join(comp, "node", "left")
        .select(
            "node",
            F.least(
                F.coalesce(F.col("component"), F.col("node")), F.col("node")
            ).alias("component"),
        )
        .distinct()
    )


def clusters_from_pairs(
    base: "DataFrame", pairs: "DataFrame", id_col: str
) -> "DataFrame":
    """(id, representative_id, is_duplicate) for every row of ``base``,
    given near-duplicate ``pairs(id_a, id_b)`` — connected components over
    the pair graph, every node mapped to its component minimum, unpaired
    rows mapping to themselves. The shared keep-one tail of
    ``dedup_clusters`` (text MinHash pairs) and ``emb_dedup_clusters``
    (embedding cosine pairs).

    NOT a pure plan builder (connected components iterates). Integer ids
    must be non-negative: representatives are chosen via order-preserving
    zero-padding, and negative values would compare wrongly as strings."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegralType

    # CC consumes the pairs 2-3×, so raise the storage level — but only if
    # the caller didn't already persist this relation: unconditionally
    # unpersisting a SHARED cached input (e.g. the contract's memoized
    # _mh_pairs, consumed again by dedup_minhash_lsh) would silently drop
    # the caller's cache out from under its other consumers.
    lvl = pairs.storageLevel
    owns_cache = not (lvl.useMemory or lvl.useDisk)
    if owns_cache:
        pairs = pairs.cache()
    id_type = base.schema[id_col].dataType
    if isinstance(id_type, IntegralType):
        pad = lambda c: F.format_string("%020d", c)  # noqa: E731
    else:
        pad = lambda c: c.cast("string")  # noqa: E731
    cc = connected_components(
        pairs.select(pad(F.col("id_a")).alias("src"), pad(F.col("id_b")).alias("dst"))
    ).localCheckpoint(eager=True)  # node-sized; lets the pairs cache go
    if owns_cache:
        pairs.unpersist()
    mapped = cc.select(
        F.col("node").cast(id_type).alias(id_col),
        F.col("component").cast(id_type).alias("representative_id"),
    )
    return (
        base.select(id_col)
        .join(mapped, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("representative_id"), F.col(id_col)).alias(
                "representative_id"
            ),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("representative_id"))
    )


def clusters_from_pairs_best(
    base: "DataFrame",
    pairs: "DataFrame",
    id_col: str,
    score_col: str,
    components: "DataFrame | None" = None,
) -> "DataFrame":
    """``clusters_from_pairs`` with QUALITY-AWARE keep-one: the
    representative of each duplicate cluster is the member with the
    highest ``score_col`` (ties → min id) instead of the min id — what a
    real curation pipeline wants when recaptures differ in quality (keep
    the cleanest extraction of a page, not the one that crawled first).

    ``score_col`` should be an INTEGER column: float scores make the
    argmax order-dependent near ties across engines.

    Physical shape: CC runs once (node-sized); scores join on the bare
    id; the winner is two hash aggregations over the node-sized relation
    (max score per component, then min id among the maxima — type-agnostic
    where a negated-id struct max would constrain ids to numerics).
    Pass ``components`` (a prior ``clusters_from_pairs`` result) to reuse
    an already-materialized closure instead of re-iterating CC."""
    from pyspark.sql import functions as F

    cfp = (
        components
        if components is not None
        else clusters_from_pairs(base, pairs, id_col)
    )
    comp = cfp.select(id_col, F.col("representative_id").alias("_comp"))
    scored = comp.join(base.select(id_col, score_col), id_col)
    smax = scored.groupBy("_comp").agg(F.max(score_col).alias("_smax"))
    winner = (
        scored.join(smax, "_comp")
        .where(F.col(score_col) == F.col("_smax"))
        .groupBy("_comp")
        .agg(F.min(id_col).alias("_rep"))
    )
    return (
        comp.join(winner, "_comp")
        .select(
            id_col,
            F.col("_rep").alias("representative_id"),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("representative_id"))
    )


def canonical_mapping(
    terms: DataFrame,
    id_col: str = "term_id",
    xref_col: str = "cross_references",
) -> DataFrame:
    """terms → (term_id, canonical_id): terms connected through shared
    cross-references collapse to one canonical CURIE (the lexicographic min
    term id in the component).

    Xref values are namespaced with a sentinel prefix so they can never
    collide with (or win over) a real term id when taking component minima.
    """
    edges = (
        terms.select(
            F.col(id_col).alias("src"),
            F.explode_outer(F.col(xref_col)).alias("_x"),
        )
        .where(F.col("_x").isNotNull() & (F.col("_x") != ""))
        .select("src", F.concat(F.lit("xref:"), F.col("_x")).alias("dst"))
    )

    cc = connected_components(edges)
    # components may be keyed by an xref node; re-key each component by its
    # minimum REAL term id.
    term_nodes = cc.join(
        terms.select(F.col(id_col).alias("node")).distinct(), "node"
    )
    canon = term_nodes.groupBy("component").agg(
        F.min("node").alias("canonical_id")
    )
    mapped = term_nodes.join(canon, "component").select(
        F.col("node").alias(id_col), "canonical_id"
    )
    # xref-less terms never enter the edge list; they canonicalize to
    # themselves.
    return (
        terms.select(F.col(id_col))
        .distinct()
        .join(mapped, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("canonical_id"),
        )
    )
