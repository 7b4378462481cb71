"""End-to-end golden-verdict suite — the qualification-test analog
(qualification_test.rs:275-438): every defect category must produce its
expected verdict (hard equality) and its expected violation types (subset
of reported), with ZERO violations on clean partitions (false-positive
accounting, regression_test.rs:98-107)."""

import pytest

from audio_quality_checker_spark.config import QUICK, CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks
from audio_quality_checker_spark.sources.pages import partition_day


@pytest.fixture(scope="module")
def result(spark, golden):
    res = run_checks(
        spark, golden["pages"], golden["ref_hosts"], golden["baseline"], exact=True
    )
    verdicts = {r["partition_key"]: r for r in res.verdicts.collect()}
    violations = res.violations.collect()
    res.unpersist()
    return verdicts, violations


def test_every_partition_gets_a_verdict(result, golden):
    verdicts, _ = result
    assert set(verdicts) == set(golden["expected"]["partition_key"])


def test_expected_verdicts_hard_equality(result, golden):
    verdicts, _ = result
    failures = []
    for _, exp in golden["expected"].iterrows():
        got = verdicts[exp["partition_key"]]["passed"]
        if got != exp["should_pass"]:
            failures.append(
                f"{exp['category']} ({exp['partition_key']}): expected "
                f"{'PASS' if exp['should_pass'] else 'FAIL'}, got "
                f"{'PASS' if got else 'FAIL'}"
            )
    assert not failures, "\n".join(failures)


def test_expected_violation_types_subset(result, golden):
    verdicts, _ = result
    for _, exp in golden["expected"].iterrows():
        got_types = set(verdicts[exp["partition_key"]]["violation_types"])
        missing = set(exp["expected_violation_types"]) - got_types
        assert not missing, f"{exp['category']}: missing {missing}, got {got_types}"


def test_no_false_positives_on_clean(result, golden):
    _, violations = result
    clean_days = {
        partition_day(c) for c in ("Control_Clean", "SkewHost")
    }
    fps = [v for v in violations if v["partition_key"] in clean_days]
    assert not fps, f"violations on clean partitions: {fps}"


def test_scores_bounded_and_ordered(result):
    verdicts, _ = result
    for r in verdicts.values():
        assert 0.0 <= r["quality_score"] <= 1.0
        if r["n_violations"] == 0:
            assert r["quality_score"] == 1.0 and r["passed"]


def test_quick_mode_skips_expensive_checks(spark, golden):
    """Conditional plan pruning (detector.rs:205-299): disabled checks
    contribute no violations."""
    res = run_checks(spark, golden["pages"], golden["ref_hosts"], None, suite=QUICK,
                     exact=True)
    types = {r["violation_type"] for r in res.violations.collect()}
    res.unpersist()
    assert "DistributionDrift" not in types
    assert "ExtractionMismatch" not in types and "ExtractionError" not in types
    assert "UniquenessViolation" in types  # cheap checks still run


def test_min_confidence_filter(spark, golden):
    """detector.rs:374-376: raising min_confidence strictly shrinks the
    violation set."""
    strict = CheckSuite(min_confidence=0.9)
    res = run_checks(
        spark, golden["pages"], golden["ref_hosts"], golden["baseline"],
        suite=strict, exact=True,
    )
    confs = [r["confidence"] for r in res.violations.collect()]
    res.unpersist()
    assert confs and all(c >= 0.9 for c in confs)
