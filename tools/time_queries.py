"""Per-query wall-clock profile of the driver's correctness pass.

Runs every queries() entry at sf0.01 (Spark collect) and its DuckDB oracle,
printing seconds for each side — the feedback loop for fitting the whole
contract inside the driver's snapshot time budget.

Usage: python tools/time_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from biocurator_mapper_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    t0 = time.monotonic()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    prep = time.monotonic() - t0
    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        n = len(fn(spark, sf_dir).collect())
        ts = time.monotonic() - t0
        td = 0.0
        if name in oracles:
            t0 = time.monotonic()
            con.execute(oracles[name]).fetchall()
            td = time.monotonic() - t0
        rows.append((name, ts, td, n))
        print(f"{name:34s} spark={ts:7.2f}s duck={td:7.2f}s rows={n}")
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(f"\nprep(oracle_sql gen)={prep:.2f}s  spark_total={tot_s:.1f}s  duck_total={tot_d:.1f}s  grand={prep + tot_s + tot_d:.1f}s")
    print("top10 by combined:")
    for name, ts, td, n in sorted(rows, key=lambda r: -(r[1] + r[2]))[:10]:
        print(f"  {name:32s} {ts + td:7.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
