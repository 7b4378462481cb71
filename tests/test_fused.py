"""Fused single-scan mode must produce IDENTICAL verdicts and violation
sets to the two-scan full-extraction mode (the parity contract of
operators/fused.py)."""

import pytest

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks


@pytest.fixture(scope="module")
def both_modes(spark, golden):
    full = CheckSuite(check_extraction_full=True)
    fused_res = run_checks(
        spark, golden["pages"], golden["ref_hosts"], golden["baseline"],
        suite=full, exact=True,
    )
    fused = {
        "verdicts": sorted(
            (r["partition_key"], r["passed"], r["quality_score"],
             tuple(r["violation_types"]))
            for r in fused_res.verdicts.collect()
        ),
        "violations": sorted(
            (r["partition_key"], r["violation_type"], r["column_name"],
             r["confidence"])
            for r in fused_res.violations.collect()
        ),
    }
    fused_res.unpersist()

    # force the two-scan path by disabling extraction fusion: sampled mode
    # with fraction 1.0 is the same comparison through the other codepath
    two_scan_suite = CheckSuite(
        check_extraction_full=False, extraction_sample_fraction=1.0
    )
    two_res = run_checks(
        spark, golden["pages"], golden["ref_hosts"], golden["baseline"],
        suite=two_scan_suite, exact=True,
    )
    two = {
        "verdicts": sorted(
            (r["partition_key"], r["passed"], r["quality_score"],
             tuple(r["violation_types"]))
            for r in two_res.verdicts.collect()
        ),
        "violations": sorted(
            (r["partition_key"], r["violation_type"], r["column_name"],
             r["confidence"])
            for r in two_res.violations.collect()
        ),
    }
    two_res.unpersist()
    return fused, two


def test_fused_verdict_parity(both_modes):
    fused, two = both_modes
    assert fused["verdicts"] == two["verdicts"]


def test_fused_violation_parity(both_modes):
    fused, two = both_modes
    assert fused["violations"] == two["violations"]


def test_fused_bad_utf8_parity_inside_stripped_regions(spark):
    """Invalid UTF-8 INSIDE a <script> block: extract_text strips the block
    before decoding (extraction succeeds), but the unfused column counts
    strict is_valid_utf8 on the RAW bytes — fused mode must match the raw
    semantics, not the extractor's (round-2 ADVICE parity fix)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from audio_quality_checker_spark.operators.fused import fused_features

    ts = dt.datetime(2025, 11, 1, 12, 0, 0)
    rows = [
        # invalid utf-8 only inside <script>: raw-bad, extraction fine
        ("http://a.example/1", ts,
         b"<p>ok</p><script>var x = '\xff\xfe';</script>", "ok", "en", "2025-11-01"),
        # invalid utf-8 in body text: raw-bad AND extraction fails
        ("http://a.example/2", ts, b"<p>bad \xff here</p>", "bad  here", "en",
         "2025-11-01"),
        # clean row
        ("http://a.example/3", ts, b"<p>clean</p>", "clean", "en", "2025-11-01"),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, p_day string",
    )
    unfused = {
        r["url"]: r["bad"]
        for r in pages.select(
            "url",
            (F.col("html").isNotNull() & ~F.expr("is_valid_utf8(html)")).alias("bad"),
        ).collect()
    }
    fused = {
        r["url"]: (r["html_bad_utf8"], r["ex_compared"])
        for r in fused_features(pages, None).collect()
    }
    for url, want_bad in unfused.items():
        assert fused[url][0] == want_bad, f"bad_utf8 parity broken for {url}"
    # script-block row still participates in the byte-identity comparison
    assert fused["http://a.example/1"][1] is True
    assert fused["http://a.example/2"][1] is False


def test_fused_matches_expected_golden(spark, golden, both_modes):
    fused, _ = both_modes
    verdicts = {pk: passed for pk, passed, _, _ in fused["verdicts"]}
    for _, exp in golden["expected"].iterrows():
        assert verdicts[exp["partition_key"]] == exp["should_pass"], exp["category"]
