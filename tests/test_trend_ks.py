"""Trend-drift window regression (mfcc.rs:276-305 delta heir) and the
opt-in exact-KS oracle vs the binned scale path (SURVEY.md §7 #4)."""

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.drift import (
    exact_ks_violations,
    trend_violations,
)
from audio_quality_checker_spark.plans.validate import run_checks
from audio_quality_checker_spark.sources.pages import partition_day


def _stats_frame(spark, len_avgs, len_stddev=50.0):
    rows = [
        (f"2025-10-{d + 1:02d}", float(avg), float(len_stddev), 1000)
        for d, avg in enumerate(len_avgs)
    ]
    return spark.createDataFrame(
        rows, "p_day string, len_avg double, len_stddev double, n_rows long"
    )


def test_trend_fires_on_monotonic_decay(spark):
    # 10 days decaying 500 -> 230: slope -30/day, 6-day shift = 180 chars
    # = 3.6 stddevs at stddev 50 — far past the 0.5 gate
    stats = _stats_frame(spark, [500 - 30 * d for d in range(10)])
    suite = CheckSuite(check_trend=True)
    v = trend_violations(stats, suite).collect()
    days = {r["partition_key"] for r in v}
    # windows are trailing: only days with >= trend_window history can fire
    assert days, "no trend violation on a 3.6-stddev monotonic decay"
    assert all(r["violation_type"] == "TrendDrift" for r in v)
    assert min(days) >= "2025-10-07"  # first full 7-day window


def test_trend_quiet_on_stable_series(spark):
    stats = _stats_frame(spark, [500 + (d % 2) for d in range(10)])
    suite = CheckSuite(check_trend=True)
    assert trend_violations(stats, suite).count() == 0


def test_trend_slope_value_matches_least_squares(spark):
    # exact check: slope of a perfect line must equal its coefficient
    stats = _stats_frame(spark, [400 - 10 * d for d in range(8)], len_stddev=20)
    suite = CheckSuite(check_trend=True, trend_window=7)
    v = trend_violations(stats, suite).collect()
    assert v, "perfect -10/day line must fire at stddev 20"
    slope = float(v[0]["params"]["slope_per_day"])
    assert abs(slope - (-10.0)) < 1e-9


@pytest.fixture(scope="module")
def full_drift_result(spark, golden):
    """FULL-style suite with the exact-KS oracle on (sample fraction 1.0:
    at 200 rows/day a 10% sample would make the KS statistic pure noise —
    at production scale the default 0.10 yields millions of rows/day)."""
    suite = CheckSuite(check_exact_ks=True, ks_sample_fraction=1.0)
    res = run_checks(
        spark, golden["pages"], golden["ref_hosts"], golden["baseline"],
        suite=suite, exact=True,
    )
    viol = res.violations.collect()
    res.unpersist()
    return viol


def test_exact_ks_exercised_and_agrees_with_binned(full_drift_result):
    """The binned KS (scale path) and the exact KS (oracle) must agree on
    the LengthDrift day within the binning error bound."""
    day = partition_day("LengthDrift")
    by_metric = {}
    for v in full_drift_result:
        if v["partition_key"] == day and v["params"] and "metric" in v["params"]:
            by_metric[v["params"]["metric"]] = float(v["params"]["value"])
    assert "ks_exact" in by_metric, f"exact KS never fired on {day}: {by_metric}"
    assert "ks_binned" in by_metric
    # binned sup-distance is a lower bound of the exact one; the gap is
    # bounded by the mass of the widest straddled bin
    assert by_metric["ks_exact"] >= by_metric["ks_binned"] - 1e-9
    assert abs(by_metric["ks_exact"] - by_metric["ks_binned"]) <= 0.35


def test_exact_ks_quiet_on_clean_day(full_drift_result):
    day = partition_day("Control_Clean")
    fired = [
        v for v in full_drift_result
        if v["partition_key"] == day and v["params"]
        and v["params"].get("metric") == "ks_exact"
    ]
    assert not fired, f"exact KS false positive on the clean day: {fired}"


def test_exact_ks_skips_without_baseline_sample(spark, golden):
    """Old-format snapshots (no text_len_sample rows) skip gracefully."""
    suite = CheckSuite(check_exact_ks=True, ks_sample_fraction=1.0)
    old_baseline = golden["baseline"].where(
        F.col("column_name") != "text_len_sample"
    )
    v = exact_ks_violations(
        golden["pages"].select("p_day", F.length("text").alias("text_len")),
        old_baseline, suite,
    )
    assert v.count() == 0
