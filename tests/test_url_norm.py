"""URL canonicalization rules (functions/url_norm.py)."""

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.functions.url_norm import (
    canonical_url_col,
    url_dup_groups,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url_col().alias("c")).collect()
    ]


def test_canonicalization_rules(spark):
    cases = {
        # fragment dropped
        "https://a.com/x#frag": "https://a.com/x",
        # scheme + host lowercased, path case preserved
        "HTTPS://A.COM/Path": "https://a.com/Path",
        # default ports stripped, non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "https://a.com:8443/x": "https://a.com:8443/x",
        # empty path -> /
        "https://a.com": "https://a.com/",
        # tracking params dropped, survivors sorted
        "https://a.com/x?utm_source=f&b=2&a=1&fbclid=z": "https://a.com/x?a=1&b=2",
        "https://a.com/x?gclid=1&ref=t&mc_cid=9": "https://a.com/x",
        # query order is not semantic
        "https://a.com/x?b=2&a=1": "https://a.com/x?a=1&b=2",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_non_http_is_null(spark):
    got = _canon(spark, ["ftp://a.com/x", "not a url", "mailto:x@y.z"])
    assert got == [None, None, None]


def test_dup_groups(spark):
    urls = [
        "https://A.com/p?utm_source=x",
        "https://a.com:443/p",
        "https://a.com/p#top",
        "https://a.com/other",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = url_dup_groups(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["canonical_url"] == "https://a.com/p"
    assert r["n_variants"] == 3
    assert sorted(r["variants"]) == sorted(urls[:3])
