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
]

CASES_PRIVATE = [
    # include_private=True: the private-domains section applies.
    ("foo.github.io", "foo.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    # Non-private hosts are unaffected.
    ("www.bbc.co.uk", "bbc.co.uk"),
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
