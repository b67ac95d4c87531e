"""The cluster entry point (north rule: run via spark-submit --py-files).

    spark-submit --master <cluster> \
        --py-files dist/bcms.zip \
        examples/triples_job.py \
        --pages s3://crawl/pages/ \
        --ontology /path/doid.json \
        --warehouse s3://kg/warehouse \
        --fingerprint run-2026-08-16 \
        [--n-buckets 256] [--id-format _=:]

Reads the Common-Crawl-style pages table (url, warc_ts, html, text, lang),
ingests the OBO-graph ontology, and runs the checkpointed TriplesPipeline:
resumable per bucket, snapshot-published, metrics/lineage rows appended.
The session comes from spark-submit (no master hardcoded); only
shuffle-partition sizing is applied here if the submitter didn't.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir of pages")
    ap.add_argument("--ontology", required=True, help="OBO-graph JSON path")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--fingerprint", required=True)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from biocurator_mapper_spark.ontology import (
        nodes_from_obo_graph,
        parse_terms,
        quality_filter,
    )
    from biocurator_mapper_spark.pipeline.triples import TriplesPipeline
    from biocurator_mapper_spark.sources.catalog import ParquetCatalog
    from biocurator_mapper_spark.sources.obo_json import read_obo_graph

    spark = SparkSession.builder.appName("bcms-triples").getOrCreate()

    pages = spark.read.parquet(args.pages)
    terms = quality_filter(
        parse_terms(nodes_from_obo_graph(read_obo_graph(spark, args.ontology)))
    )
    catalog = ParquetCatalog(spark, args.warehouse)
    pipe = TriplesPipeline(catalog, n_buckets=args.n_buckets)
    out = pipe.run(pages, terms, run_fingerprint=args.fingerprint, k=args.k)

    metrics = catalog.read_log("_metrics").orderBy("ts").collect()[-1]
    print(
        json.dumps(
            {
                "triples": out.count(),
                "rows_in": metrics.rows_in,
                "rows_out": metrics.rows_out,
                "elapsed_s": round(metrics.elapsed_s, 2),
                "snapshot": catalog.current_version("triples"),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
