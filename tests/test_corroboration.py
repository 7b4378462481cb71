"""Corroboration gate + agreement boost (detector.rs:341-358,
upsampling.rs:351-398): lone weak signals are suppressed, corroborated
ones are reported, same-type agreement raises confidence."""

from pyspark.sql import functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import VIOLATION_SCHEMA
from audio_quality_checker_spark.operators.verdict import (
    combine_violations,
    corroborate,
)


def _viol(spark, rows):
    return spark.createDataFrame(
        [(pk, vt, col, conf, "e", None) for pk, vt, col, conf in rows],
        VIOLATION_SCHEMA,
    )


def test_lone_weak_signal_suppressed(spark):
    v = _viol(spark, [("d1", "UniquenessViolation", "url", 0.65)])
    out = combine_violations([v], CheckSuite()).collect()
    assert out == [], "a lone weakest-tier violation must not survive"


def test_corroborated_weak_signal_reported(spark):
    v = _viol(
        spark,
        [
            ("d1", "UniquenessViolation", "url", 0.65),
            ("d1", "DistributionDrift", "lang", 0.95),
        ],
    )
    out = combine_violations([v], CheckSuite()).collect()
    types = {r["violation_type"] for r in out}
    assert types == {"UniquenessViolation", "DistributionDrift"}


def test_strong_lone_signal_unaffected(spark):
    v = _viol(spark, [("d1", "ExtractionMismatch", "text", 0.95)])
    out = combine_violations([v], CheckSuite()).collect()
    assert len(out) == 1 and out[0]["confidence"] == 0.95


def test_agreement_boost_same_type(spark):
    """PSI and KS both flagging DistributionDrift corroborate each other:
    each rises by the boost; a different-type violation is untouched."""
    v = _viol(
        spark,
        [
            ("d1", "DistributionDrift", "lang", 0.65),
            ("d1", "DistributionDrift", "text_len", 0.85),
            ("d1", "NullRateExceeded", "text", 0.65),
        ],
    )
    out = {
        (r["violation_type"], r["column_name"]): r["confidence"]
        for r in corroborate(v, CheckSuite()).collect()
    }
    assert out[("DistributionDrift", "lang")] == 0.75
    assert out[("DistributionDrift", "text_len")] == 0.95
    assert out[("NullRateExceeded", "text")] == 0.65  # no same-type partner


def test_boost_capped(spark):
    v = _viol(
        spark,
        [
            ("d1", "DistributionDrift", "lang", 0.95),
            ("d1", "DistributionDrift", "text_len", 0.95),
        ],
    )
    confs = [r["confidence"] for r in corroborate(v, CheckSuite()).collect()]
    assert confs == [0.95, 0.95]


def test_gate_scoped_per_partition(spark):
    """The corroborating violation must be on the SAME partition."""
    v = _viol(
        spark,
        [
            ("d1", "UniquenessViolation", "url", 0.65),
            ("d2", "DistributionDrift", "lang", 0.95),
        ],
    )
    out = combine_violations([v], CheckSuite()).collect()
    assert {r["partition_key"] for r in out} == {"d2"}


def test_gate_can_be_disabled(spark):
    v = _viol(spark, [("d1", "UniquenessViolation", "url", 0.65)])
    suite = CheckSuite(corroboration_gate=False)
    out = combine_violations([v], suite).collect()
    assert len(out) == 1
