"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 from N→4N).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the same input; throughput
at both plus scaling efficiency goes to BENCH.md.

Each level runs in a fresh subprocess (one JVM per master setting).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str, queries: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--queries", queries,
         "--cpus", str(cpus), "--sf-dir", sf_dir],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = sys.argv[1] if len(sys.argv) > 1 else "kg_triples"
    lo = run_level(8, sf_dir, queries)
    hi = run_level(32, sf_dir, queries)
    t_lo, t_hi = lo["value"], hi["value"]
    # throughput ratio per core ratio: ideal = 4.0
    speedup = t_lo / t_hi if t_hi > 0 else float("inf")
    efficiency = speedup / 4.0
    result = {
        "sf_dir": sf_dir,
        "queries": queries,
        "local8_sec": t_lo,
        "local32_sec": t_hi,
        "local8_rows": lo["rows"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "local8_triples_per_sec": lo.get("triples_per_sec"),
        "local32_triples_per_sec": hi.get("triples_per_sec"),
    }
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
