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


def test_fused_matches_expected_golden(spark, golden, both_modes):
    fused, _ = both_modes
    verdicts = {pk: passed for pk, passed, _, _ in fused["verdicts"]}
    for _, exp in golden["expected"].iterrows():
        assert verdicts[exp["partition_key"]] == exp["should_pass"], exp["category"]
