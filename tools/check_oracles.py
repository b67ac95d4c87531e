"""Side-by-side check of __spark_entry__.queries() vs oracle_sql() via DuckDB.

Mimics the driver's CORRECTNESS gate: row count + schema (column names) +
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from biocurator_mapper_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck_type_classes(res):
    """Normalized per-column type class from DuckDB's arrow schema.

    Catches representation mismatches the stringified-value compare can't —
    e.g. DuckDB sum() over integers is HUGEINT (arrow decimal128(38,0)) while
    Spark's is BIGINT (int64); the driver's value hash is type-sensitive.
    """
    import pyarrow as pa

    def cls(t):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"
        if pa.types.is_boolean(t):
            return "bool"
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return "timestamp"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return "list"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        return "str"

    tb = res.fetch_arrow_table()
    return {f.name: cls(f.type) for f in tb.schema}, tb


def _spark_type_classes(df):
    from pyspark.sql import types as T

    def cls(t):
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return "int"
        if isinstance(t, (T.FloatType, T.DoubleType)):
            return "float"
        if isinstance(t, T.DecimalType):
            return "decimal"
        if isinstance(t, T.BooleanType):
            return "bool"
        if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return "timestamp"
        if isinstance(t, T.ArrayType):
            return "list"
        if isinstance(t, T.BinaryType):
            return "binary"
        return "str"

    return {f.name: cls(f.dataType) for f in df.schema.fields}


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracles (IVF centroids) must see the same corpus
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sp_rows)} rows")
            continue
        try:
            dk_types, _ = _duck_type_classes(con.execute(oracles[name]))
            res = con.execute(oracles[name])
            dk_cols = [d[0] for d in res.description]
            dk_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck ] {name}: {str(e)[:200]}")
            continue
        problems = []
        # driver-parity guard: the driver's pandas canonicalizer
        # sort_values() raises "unhashable type: 'list'" on array columns
        # (r6: text_bpe_ids / pack_materialize_ids) — fail locally too.
        sp_types = _spark_type_classes(df)
        listy = [c for c, t in sp_types.items() if t == "list"]
        if listy:
            problems.append(
                f"driver-uncanonicalizable array columns {listy} "
                "(scalarize: array_join / posexplode)"
            )
        if sorted(sp_cols) != sorted(dk_cols):
            problems.append(f"schema {sorted(sp_cols)} != {sorted(dk_cols)}")
        else:
            tmis = {
                c: (sp_types[c], dk_types[c])
                for c in sp_cols
                if sp_types[c] != dk_types.get(c)
            }
            if tmis:
                problems.append(f"type-class mismatch {tmis}")
        if len(sp_rows) != len(dk_rows):
            problems.append(f"rowcount {len(sp_rows)} != {len(dk_rows)}")
        if not problems:
            a = normalize(sp_rows, sp_cols)
            b = normalize(dk_rows, dk_cols)
            if a != b:
                diff = [x for x, y in zip(a, b) if x != y][:3]
                diffb = [y for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. spark={diff} duck={diffb}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL      ] {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"[OK        ] {name}: {len(sp_rows)} rows")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
