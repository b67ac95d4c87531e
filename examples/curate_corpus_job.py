"""Training-corpus curation entry point (spark-submit --py-files).

    spark-submit --master <cluster> \
        --py-files dist/bcms.zip \
        examples/curate_corpus_job.py \
        --docs s3://crawl/docs/ \
        --out s3://corpora/curated/ \
        [--benchmark s3://evals/docs/] [--ngram 13] \
        [--lsh-threshold 0.5] [--keep-langs en] [--report]

The full pre-training data funnel, composed from the engine's operators:

0. optional capture-level dedup (``--url-col``): canonicalize the crawl
   URL and keep the latest capture per canonical page — the crawl table's
   snapshot view, BEFORE any content-level work multiplies by the
   recapture factor (`operators.urls.dedup_url_latest`); then an optional
   domain BLOCKLIST gate (``--blocklist``): PSL registrable domains via
   zero-shuffle broadcast joins, blocked domains (and their subdomains)
   dropped with a broadcast anti-join (`operators.psl`,
   `operators.urls.filter_blocked_domains`);
1. optional corpus-wide paragraph dedup (CCNet ordering — boilerplate out
   BEFORE quality signals; `operators.dedup.paragraph_dedup`), then an
   optional ExactSubstr cut (``--exactsubstr-cut``): duplicated >=L-char
   normalized runs removed, first occurrence kept
   (`operators.exactsubstr`);
2. quality/repetition/language gates + exact dedup (`pipeline.curation`);
3. near-duplicate CLUSTER removal — MinHash-LSH candidates, exact-Jaccard
   verify, connected components, keep the representative
   (`operators.dedup.dedup_clusters`);
4. optional benchmark decontamination — the exact 13-gram collision rule
   (`operators.dedup.decontaminate_exact`);
5. optional temperature mixture sampling toward a target row budget
   (`operators.sampling.temperature_sample`);
6. write the curated corpus partitioned by a stable id-hash bucket, plus a
   one-row-per-stage funnel report — and, when ``--pack-ctx`` is given, a
   training manifest with the seeded epoch-shuffle order and the
   sequence-packing assignment (`operators.packing`).

Every stage is declarative DataFrame work: gates are codegen expressions,
dedup shuffles integer shingle hashes, decontamination broadcasts the
benchmark n-gram set — the same plan shapes PLANS.md audits at sf0.1 hold
on a 1000-executor cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet dir: doc_id, text, lang?")
    ap.add_argument("--out", required=True, help="output dir for the curated corpus")
    ap.add_argument("--benchmark", default=None, help="parquet dir of eval docs")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--keep-langs", default="en")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--lsh-threshold", type=float, default=0.5)
    ap.add_argument("--min-lm-score", type=float, default=None,
                    help="optional char-LM quality gate threshold")
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="corpus-wide paragraph dedup before the gates")
    ap.add_argument("--url-col", default=None,
                    help="canonical-URL latest-capture dedup first "
                         "(requires --warc-ts-col)")
    ap.add_argument("--warc-ts-col", default="warc_ts")
    ap.add_argument("--exactsubstr-cut", action="store_true",
                    help="ExactSubstr: cut duplicated >=L-char normalized "
                         "runs (first occurrence kept) before the gates")
    ap.add_argument("--exactsubstr-len", type=int, default=50)
    ap.add_argument("--blocklist", default=None,
                    help="comma list of blocked registrable domains "
                         "(requires --url-col; PSL domains, subdomains too)")
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature mixture sampling exponent")
    ap.add_argument("--mix-target", type=int, default=None,
                    help="target row budget for --mix-alpha")
    ap.add_argument("--mix-strata-col", default="source")
    ap.add_argument("--pack-ctx", type=int, default=None,
                    help="context length: also write <out>_manifest with "
                         "shuffle order + packing assignment")
    ap.add_argument("--emit-id-sequences", action="store_true",
                    help="with --pack-ctx: also materialize the ctx-length "
                         "windows of real BPE token ids to <out>_sequences "
                         "(the tensor-ready training input)")
    ap.add_argument("--shuffle-seed", default="0")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from biocurator_mapper_spark.operators.dedup import (
        decontaminate_exact,
        dedup_clusters,
    )
    from biocurator_mapper_spark.pipeline.curation import curate, curation_funnel

    spark = SparkSession.builder.appName("bcms-curate").getOrCreate()
    docs = spark.read.parquet(args.docs)
    id_col, text_col = args.id_col, args.text_col

    # -1. optional capture-level dedup: latest capture per canonical URL
    n_in = docs.count()
    if args.url_col:
        from biocurator_mapper_spark.operators.urls import dedup_url_latest

        winners = dedup_url_latest(
            docs.select(id_col, args.url_col, args.warc_ts_col),
            args.url_col,
            args.warc_ts_col,
            id_col,
        ).select(id_col)
        docs = docs.join(winners, id_col, "left_semi")
        n_after_url = docs.count()
    else:
        n_after_url = None

    # -0.5 optional domain blocklist (policy/compliance gate): PSL
    # registrable domain off the crawl URL, broadcast anti-join, subdomains
    # of a blocked domain drop too
    if args.blocklist:
        if not args.url_col:
            raise SystemExit("--blocklist requires --url-col")
        from biocurator_mapper_spark.operators.psl import with_psl_domain
        from biocurator_mapper_spark.operators.urls import (
            filter_blocked_domains,
            url_parts,
        )

        hosts = docs.withColumn("_host", url_parts(F.col(args.url_col))["host"])
        dom = with_psl_domain(hosts, "_host", "_dom")
        docs = filter_blocked_domains(
            dom, "_dom", args.blocklist.split(","), include_subdomains=True
        ).drop("_host", "_dom")
        n_after_block = docs.count()
    else:
        n_after_block = None

    # 0. optional paragraph dedup (CCNet ordering: boilerplate out first)
    if args.paragraph_dedup:
        from biocurator_mapper_spark.operators.dedup import paragraph_dedup_text

        docs = paragraph_dedup_text(docs, id_col, text_col)

    # 0b. optional ExactSubstr cut (normalized text from here on)
    if args.exactsubstr_cut:
        from biocurator_mapper_spark.operators.exactsubstr import (
            cut_spans_by_range,
            exact_substring_spans,
        )

        spans = exact_substring_spans(
            docs, id_col, text_col, length=args.exactsubstr_len
        )
        cut = cut_spans_by_range(docs, spans, id_col, text_col)
        docs = docs.drop(text_col).join(
            cut.select(id_col, F.col("text_cut").alias(text_col)), id_col
        )

    # 1. gates + exact dedup (one stage label per doc)
    staged = curate(
        docs,
        id_col=id_col,
        text_col=text_col,
        keep_langs=tuple(args.keep_langs.split(",")),
        min_lm_score=args.min_lm_score,
    )
    funnel = [(r.curation_stage, r.n_docs) for r in curation_funnel(staged).collect()]
    kept_ids = staged.where(F.col("curation_stage") == "kept").select(id_col)
    kept = docs.join(kept_ids, id_col, "left_semi")
    n_after_gates = kept.count()

    # 2. near-dup cluster removal (LSH candidates, exact verify, CC)
    clusters = dedup_clusters(
        kept, id_col, text_col, threshold=args.lsh_threshold
    )
    reps = clusters.where(~F.col("is_duplicate")).select(id_col)
    kept = kept.join(reps, id_col, "left_semi")
    n_after_neardup = kept.count()

    # 3. optional exact-n-gram decontamination against the benchmark
    n_after_decontam = n_after_neardup
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        kept = decontaminate_exact(kept, bench, id_col, text_col, n=args.ngram)
        n_after_decontam = kept.count()

    # 5. optional temperature mixing toward the target row budget
    n_after_mix = n_after_decontam
    if args.mix_alpha is not None:
        if args.mix_target is None:
            raise SystemExit("--mix-alpha requires --mix-target")
        from biocurator_mapper_spark.operators.sampling import temperature_sample

        kept = temperature_sample(
            kept, args.mix_strata_col, id_col, args.mix_alpha, args.mix_target
        )
        n_after_mix = kept.count()

    # 6. stable id-hash bucketing for downstream co-located reads
    out = kept.withColumn(
        "part_bucket",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(args.n_buckets)).cast(
            "int"
        ),
    )
    out.write.mode("overwrite").partitionBy("part_bucket").parquet(args.out)

    # 6b. optional training manifest: seeded epoch order + packing
    manifest_out = None
    if args.pack_ctx:
        from biocurator_mapper_spark.functions.text import token_count
        from biocurator_mapper_spark.operators.packing import (
            pack_sequences,
            shuffle_rank,
        )

        if args.emit_id_sequences:
            # the manifest must count the SAME tokenizer the id windows use
            from biocurator_mapper_spark.functions.bpe import bpe_count_expr
            from biocurator_mapper_spark.functions.bpe_merges import MERGES

            n_tok = bpe_count_expr(F.col(text_col), MERGES)
        else:
            n_tok = token_count(F.col(text_col))
        base = kept.select(
            id_col, n_tok.cast("bigint").alias("n_tokens")
        )
        manifest = pack_sequences(base, id_col, "n_tokens", args.pack_ctx).join(
            shuffle_rank(kept.select(id_col), id_col, seed=args.shuffle_seed),
            id_col,
        )
        manifest_out = args.out.rstrip("/") + "_manifest"
        manifest.write.mode("overwrite").parquet(manifest_out)

    # 6c. optional tensor-ready output: ctx-length windows of REAL BPE ids
    sequences_out = None
    if args.pack_ctx and args.emit_id_sequences:
        from biocurator_mapper_spark.functions.bpe import bpe_encode_expr
        from biocurator_mapper_spark.functions.bpe_merges import MERGES
        from biocurator_mapper_spark.operators.packing import (
            materialize_id_sequences,
        )

        sequences_out = args.out.rstrip("/") + "_sequences"
        materialize_id_sequences(
            kept,
            id_col,
            bpe_encode_expr(F.col(text_col), MERGES),
            args.pack_ctx,
        ).write.mode("overwrite").parquet(sequences_out)

    print(
        json.dumps(
            {
                "rows_in": n_in,
                "after_url_dedup": n_after_url,
                "after_blocklist": n_after_block,
                "funnel": dict(funnel),
                "after_gates": n_after_gates,
                "after_near_dup": n_after_neardup,
                "after_decontamination": n_after_decontam,
                "after_mixing": n_after_mix,
                "out": args.out,
                "manifest": manifest_out,
                "sequences": sequences_out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
