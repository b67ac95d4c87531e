"""Public-suffix-list registrable domains (operators/psl.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biocurator_mapper_spark.operators.psl import (
    PSL_SNAPSHOT,
    parse_psl_rules,
    with_psl_domain,
)


def _doms(spark, hosts: list[str]) -> list[str]:
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = with_psl_domain(df, "host", "domain")
    return [r.domain for r in out.orderBy("host").collect()]


def test_parse_rule_kinds():
    rules = parse_psl_rules(
        ["com", "*.kawasaki.jp", "!city.kawasaki.jp", "// comment", ""]
    )
    assert rules["com"].ps_low == 1 and rules["com"].ps_high is None
    kw = rules["kawasaki.jp"]
    assert kw.ps_high == 3 and kw.ps_low is None
    assert rules["city.kawasaki.jp"].exc_ps == 2


def test_psl_domains(spark):
    cases = {
        # private-section suffixes: every user site is its own domain
        "x.site3.github.io": "site3.github.io",
        "site3.github.io": "site3.github.io",
        "github.io": "github.io",  # the suffix itself: no registrable level
        "a.b.myapp.s3.amazonaws.com": "myapp.s3.amazonaws.com",
        # wildcard + exception family (Japanese city domains)
        "a.city.kawasaki.jp": "city.kawasaki.jp",
        "city.kawasaki.jp": "city.kawasaki.jp",
        "b.shop.kawasaki.jp": "b.shop.kawasaki.jp",
        "shop.kawasaki.jp": "shop.kawasaki.jp",  # is itself a public suffix
        # *.ck with !www.ck
        "a.www.ck": "www.ck",
        "www.ck": "www.ck",
        "b.foo.ck": "b.foo.ck",
        # plain multi-label registries
        "deep.a.b.example.co.uk": "example.co.uk",
        "WWW.Example.COM": "example.com",
        "en.m.wikipedia.org": "wikipedia.org",
        # no rule for the TLD -> heuristic fallback
        "x.example.test": "example.test",
        "localhost": "localhost",
    }
    hosts = sorted(cases)
    assert _doms(spark, hosts) == [cases[h] for h in hosts]


def test_full_psl_file_grammar(tmp_path):
    # load_psl accepts the real .dat grammar verbatim
    from biocurator_mapper_spark.operators.psl import load_psl

    p = tmp_path / "psl.dat"
    p.write_text("\n".join(PSL_SNAPSHOT), encoding="utf-8")
    assert parse_psl_rules(load_psl(str(p))) == parse_psl_rules()


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([("www.example.com",)], "host string")
    out = with_psl_domain(df, "host")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan  # broadcast only, row-preserving
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
