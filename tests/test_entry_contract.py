"""Driver-contract self-test: every queries() entry runs at sf0.001 and the
oracle key set is consistent. (The value-level Spark↔DuckDB comparison runs
in tools/check_oracles.py and in the driver's own correctness gate.)"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qk = set(entrymod.queries())
    ok = set(entrymod.oracle_sql())
    assert ok <= qk, ok - qk
    # the rows-only set is small and intentional
    rows_only = qk - ok
    assert rows_only <= {"dedup_simhash", "sim_ann_lsh_topk", "sim_ann_ivf_topk", "kg_triples"}


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "subj"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_schema_sane(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    cols = df.columns
    # aliased, lowercase, no expression-shaped names (driver hashes by name)
    for c in cols:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", c), (name, c)
    n = df.count()
    assert n >= 0
    if name not in ("j3_antijoin_unprocessed",):  # legitimately empty
        assert n > 0, name
