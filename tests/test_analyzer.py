"""Analyzer facade: the fluent surface must reproduce run_checks exactly
and keep CheckSuite immutability (analyzer.rs:18-84, 98-153 analog)."""

from audio_quality_checker_spark.analyzer import Analyzer
from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks


def _verdict_map(result):
    return {
        r["partition_key"]: (r["passed"], r["n_violations"])
        for r in result.verdicts.collect()
    }


def test_analyze_matches_run_checks(spark, golden):
    a = Analyzer(golden["pages"], ref_hosts=golden["ref_hosts"],
                 baseline=golden["baseline"])
    facade = _verdict_map(a.analyze())
    direct = _verdict_map(
        run_checks(spark, golden["pages"], golden["ref_hosts"],
                   golden["baseline"], CheckSuite())
    )
    assert facade == direct


def test_with_overrides_are_immutable(spark, golden):
    a = Analyzer(golden["pages"])
    b = a.with_(max_null_rate=0.001, check_drift=False)
    assert a.suite.max_null_rate == 0.05, "original Analyzer mutated"
    assert b.suite.max_null_rate == 0.001
    assert not b.suite.check_drift
    assert b.pages is a.pages


def test_quick_toggles_only_check_set(spark, golden):
    """quick() drops drift + extraction checks but keeps the Analyzer's
    thresholds: categories whose ONLY defect is drift/extraction flip to
    PASS, everything else keeps its full-suite verdict."""
    a = Analyzer(golden["pages"], ref_hosts=golden["ref_hosts"],
                 baseline=golden["baseline"])
    vm = _verdict_map(a.quick())
    assert vm["2025-11-01"][0] is True          # clean stays clean
    assert vm["2025-11-07"][0] is True          # drift-only -> PASS
    assert vm["2025-11-09"][0] is True          # extraction-only -> PASS
    assert vm["2025-11-05"][0] is False         # uniqueness still fails
    assert vm["2025-11-06"][0] is False         # referential still fails


def test_full_enables_expensive_checks(spark, golden):
    a = Analyzer(golden["pages"]).with_(max_null_rate=0.001)
    merged = a.suite.with_(check_extraction_full=True, check_exact_ks=True)
    assert merged.check_extraction_full and merged.check_exact_ks
    assert merged.max_null_rate == 0.001
