"""PSL registrable-domain semantics — the documented tldextract cases.

Each case pins one clause of the publicsuffix.org algorithm (reference:
gdelt/processing/build_datasets.py:13-17 uses default-config tldextract,
i.e. WITHOUT the PSL private-domains section).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsflow.etl.gdelt import registrable_domain
from newsflow.etl.psl import registrable_domain_py

CASES_DEFAULT = [
    # (host, expected eTLD+1 with tldextract defaults)
    ("www.bbc.co.uk", "bbc.co.uk"),
    ("news.example.com", "example.com"),
    ("a.b.example.org.au", "example.org.au"),
    ("example.io", "example.io"),
    # Private domains EXCLUDED by default: github.io's suffix is just io.
    ("foo.github.io", "github.io"),
    ("myblog.blogspot.com", "blogspot.com"),
    # Wildcard rule *.ck: <anything>.ck is a public suffix, so the
    # registered domain keeps one more label.
    ("www.shop.example.ck", "shop.example.ck"),
    # Exception rule !www.ck beats the wildcard.
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    # Japanese geo wildcard + exception family.
    ("foo.bar.kawasaki.jp", "foo.bar.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    # Unknown TLD → tldextract's empty-suffix fallback (last label).
    ("example.unknowntld", "unknowntld"),
    # Longest match: ac.uk (2 labels) over uk (1 label).
    ("dept.ox.ac.uk", "ox.ac.uk"),
    # Host IS a public suffix → ".{suffix}", the reference get_domain's
    # output for tldextract's empty domain (ADVICE r2 parity fix).
    ("com", ".com"),
    ("co.uk", ".co.uk"),
    ("foo.ck", ".foo.ck"),          # wildcard *.ck, no label left
    ("x.kawasaki.jp", ".x.kawasaki.jp"),
    # Exotic ccTLD families only present in the FULL vendored snapshot.
    ("www.example.com.bn", "example.com.bn"),
    ("a.b.gov.bt", "b.gov.bt"),
    ("site.name.et", "site.name.et"),
    ("x.org.gu", "x.org.gu"),
    ("shop.co.ao", "shop.co.ao"),
    # edu.krd is a PRIVATE rule — default mode sees only the krd TLD.
    ("x.y.edu.krd", "edu.krd"),
    # *.kobe.jp wildcard: suffix = c.kobe.jp, eTLD+1 keeps one more label.
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("x.city.kobe.jp", "city.kobe.jp"),     # !city.kobe.jp exception
]

CASES_PRIVATE = [
    # include_private=True: the private-domains section applies.
    ("foo.github.io", "foo.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    # Non-private hosts are unaffected.
    ("www.bbc.co.uk", "bbc.co.uk"),
    # Private 3-label rule beats the ICANN TLD in private mode.
    ("x.y.edu.krd", "y.edu.krd"),
]


@pytest.mark.parametrize("host,expected", CASES_DEFAULT)
def test_psl_python_twin_default(host, expected):
    assert registrable_domain_py(host) == expected


@pytest.mark.parametrize("host,expected", CASES_PRIVATE)
def test_psl_python_twin_private(host, expected):
    assert registrable_domain_py(host, include_private=True) == expected


def test_psl_spark_chain_matches_twin(spark):
    hosts = [h for h, _ in CASES_DEFAULT] + [h for h, _ in CASES_PRIVATE]
    df = spark.createDataFrame(
        [(f"https://{h}/path?q=1",) for h in hosts], "url string"
    )
    for private, cases in ((False, CASES_DEFAULT), (True, CASES_PRIVATE)):
        got = {
            r["h"]: r["d"]
            for r in df.select(
                F.lower(F.parse_url("url", F.lit("HOST"))).alias("h"),
                registrable_domain(
                    F.col("url"), include_private=private
                ).alias("d"),
            ).collect()
        }
        for host, expected in cases:
            assert got[host] == expected, (host, private)


def test_full_snapshot_loaded():
    from newsflow.etl.psl import icann_rules, private_rules

    # The vendored file is the complete publicsuffix.org list, not the
    # round-2 curated subset (~500 rules).
    assert len(icann_rules()) > 7000
    assert len(private_rules()) > 2000
    assert "*.ck" in icann_rules() and "!www.ck" in icann_rules()
    assert "github.io" in private_rules()


def test_spark_chain_matches_twin_on_generated_hosts(spark):
    # Property sweep: build hosts from every rule SHAPE in the live
    # tables (normal/wildcard/exception × label counts) with 0-2 extra
    # labels, and require exact Spark == Python-twin agreement.
    import itertools

    from newsflow.etl.psl import (
        _rule_tables,
        registrable_domain_py,
    )

    exc, wild, norm = _rule_tables(False)
    samples = []
    for table in (exc, wild, norm):
        for m, bodies in table.items():
            for body in itertools.islice(sorted(bodies), 25):
                if not body.isascii():
                    continue
                samples.append(body)
                samples.append("alpha." + body)
                samples.append("beta.alpha." + body)
    samples = sorted(set(samples))[:1500]
    df = spark.createDataFrame([(h,) for h in samples], "h string")
    from newsflow.etl.psl import registrable_domain_psl

    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registrable_domain_psl("h").alias("d")
        ).collect()
    }
    for h in samples:
        assert got[h] == registrable_domain_py(h), h


def test_sql_fast_path_equals_column_path(spark):
    # The SQL-text compile (name arg) and the Column-API chain must be
    # the same function; pin them against each other on the case table.
    hosts = [h for h, _ in CASES_DEFAULT]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    from newsflow.etl.psl import registrable_domain_psl

    rows = df.select(
        registrable_domain_psl("h").alias("fast"),
        registrable_domain_psl(F.col("h")).alias("col"),
    ).collect()
    assert all(r["fast"] == r["col"] for r in rows)


def test_chain_compiles_fast_and_keeps_codegen(spark):
    import time

    from newsflow.etl.psl import _chain_sql, registrable_domain_psl

    _chain_sql.cache_clear()
    t0 = time.time()
    col = registrable_domain_psl("h", include_private=False)
    assert time.time() - t0 < 2.0, "SQL chain build should be ~10ms"
    out = spark.createDataFrame([("a.co.uk",)], "h string").select(
        col.alias("d")
    )
    # '*' prefix on the Project node == whole-stage codegen survived the
    # ~9.5k-rule InSet chain (the fallback would drop the asterisk).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in plan, plan[:500]
