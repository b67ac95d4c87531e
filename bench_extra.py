"""Extra benchmarks for optimization work (guide §1.4): noop-sink isolation
per query + .explain("formatted") capture. NOT the driver's bench — bench.py
stays the frozen measurement harness; this file exists so per-query
computation can be timed without the .count()/collect tail and so plan
shapes can be committed under plans/r08/.

Usage:
  python bench_extra.py --queries j5_topk_similarity --sf-dir /root/testdata/sf1.0
  python bench_extra.py --plans-dir plans/r08 --suffix before   # dump plans only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_triples",
    "j6_mention_detect",
    "j5_topk_similarity",
    "dedup_minhash_lsh",
    "agg_pricing_summary",
    "join_top_customers_per_nation",
    "text_quality",
    "sim_ann_lsh_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timed noop runs")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_QUERY_MEMO"] = "0"

    import __spark_entry__ as entrymod
    from biocurator_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="bcms-bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(int(args.cpus), 8),
        extra={"spark.sql.files.maxPartitionBytes": str(1024 * 1024)},
    )
    qs = entrymod.queries()
    names = [n for n in args.queries.split(",") if n]

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}", file=sys.stderr)

    if args.no_time:
        spark.stop()
        return 0

    # same process-lifetime warmup as bench.py
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(100000).select(_warm(col("id"))).count()
    if "kg_triples" in qs:
        qs["kg_triples"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            samples.append(round(time.monotonic() - t0, 3))
        timings[name] = samples
    out = {
        "metric": "noop_isolated",
        "queries": {n: min(s) for n, s in timings.items()},
        "samples": timings,
        "sf": args.sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": int(args.cpus),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
