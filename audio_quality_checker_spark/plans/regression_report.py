"""Report-only regression tier (regression_test.rs:141-144): track
detector quality over time WITHOUT failing CI.

The reference runs a weekly regression pass that scores every detector
against the golden corpus and reports per-category false-positive /
false-negative accounting (regression_test.rs:98-107) — failures become a
trend line, not a red build.  The engine analog: run the full check suite
over a labeled corpus (expected verdict + expected violation types per
partition) and emit a QUALITY REPORT frame:

    (category, partition_key, expected_pass, got_pass, verdict_ok,
     expected_types, got_types, missing_types, unexpected_types,
     n_false_positives, n_false_negatives)

plus a one-row summary.  Nothing here asserts; the hard-fail
qualification tier stays in tests/test_golden_verdicts.py.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, SparkSession

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks

REPORT_DDL = (
    "category string, partition_key string, expected_pass boolean, "
    "got_pass boolean, verdict_ok boolean, expected_types array<string>, "
    "got_types array<string>, missing_types array<string>, "
    "unexpected_types array<string>, n_false_negatives int, "
    "n_false_positives int"
)


def quality_report(
    spark: SparkSession,
    pages: DataFrame,
    ref_hosts: DataFrame | None,
    baseline: DataFrame | None,
    expected: DataFrame,
    suite: CheckSuite | None = None,
) -> DataFrame:
    """Run the suite and score it against the labeled expectations.

    ``expected`` columns: partition_key, category, should_pass,
    expected_violation_types (the golden-output table the fixture
    warehouse materializes).  FP = an unexpected violation type reported
    on a partition; FN = an expected type missing.
    """
    res = run_checks(spark, pages, ref_hosts, baseline, suite, exact=True)
    verdicts = {r["partition_key"]: r for r in res.verdicts.collect()}
    res.unpersist()

    rows = []
    for e in expected.collect():
        pk = e["partition_key"]
        v = verdicts.get(pk)
        got_pass = bool(v["passed"]) if v is not None else None
        got_types = sorted(v["violation_types"]) if v is not None else []
        exp_types = sorted(e["expected_violation_types"])
        missing = sorted(set(exp_types) - set(got_types))
        unexpected = sorted(set(got_types) - set(exp_types))
        rows.append((
            e["category"], pk, bool(e["should_pass"]), got_pass,
            got_pass == bool(e["should_pass"]), exp_types, got_types,
            missing, unexpected, len(missing), len(unexpected),
        ))
    return spark.createDataFrame(rows, REPORT_DDL)


def report_summary(report: DataFrame, engine_version: str = "") -> dict:
    """One JSON-able summary row — the weekly trend point."""
    rows = report.collect()
    n = len(rows)
    return {
        "measured_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "engine_version": engine_version,
        "n_categories": n,
        "n_verdict_ok": sum(1 for r in rows if r["verdict_ok"]),
        "n_false_negatives": sum(r["n_false_negatives"] for r in rows),
        "n_false_positives": sum(r["n_false_positives"] for r in rows),
        "failing_categories": sorted(
            r["category"] for r in rows if not r["verdict_ok"]
        ),
    }


def append_trend(summary: dict, path: str) -> None:
    """Append the summary as one JSON line — the drift-over-time log the
    reference keeps per week (report-only: never raises on regressions)."""
    with open(path, "a") as f:
        f.write(json.dumps(summary, sort_keys=True) + "\n")
