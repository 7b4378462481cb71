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


def augment_expectations(expected: DataFrame, near_dup: bool = False,
                         repetition: bool = False) -> DataFrame:
    """Fixture-golden expectations for the OPT-IN gates, layered onto the
    base labeled table (partition_key, category, should_pass,
    expected_violation_types).

    The base golden (sources.pages.CATEGORIES) describes the default
    suite; the opt-in detectors have their own golden facts on the
    synthetic corpus, verified empirically and pinned here so the
    report tier can score them:

    - ``near_dup``: the generator's template prose gives EVERY crawl
      day a cross-doc near-dup population above the gate, so all 15
      days gain ``NearDuplicationAnomaly`` and no day passes.  This is
      the report-tier tripwire for the round-5 LSH recall bug class
      (candidate metric != verify metric -> silent false negatives on
      hot blocks): a recall regression surfaces as FN > 0 here.
    - ``repetition``: only PaddedText's filler lines repeat within a
      document, so exactly that day gains ``RepetitionAnomaly``.

    Custom corpora should ship their own opt-in labels instead.
    """
    from pyspark.sql import functions as F

    out = expected
    if near_dup:
        out = out.withColumn(
            "expected_violation_types",
            F.array_union(
                "expected_violation_types",
                F.array(F.lit("NearDuplicationAnomaly")),
            ),
        ).withColumn("should_pass", F.lit(False))
    if repetition:
        from audio_quality_checker_spark.sources.pages import partition_day

        rep_day = partition_day("PaddedText")
        out = out.withColumn(
            "expected_violation_types",
            F.when(
                F.col("partition_key") == rep_day,
                F.array_union(
                    "expected_violation_types",
                    F.array(F.lit("RepetitionAnomaly")),
                ),
            ).otherwise(F.col("expected_violation_types")),
        ).withColumn(
            "should_pass",
            F.when(F.col("partition_key") == rep_day, F.lit(False))
            .otherwise(F.col("should_pass")),
        )
    return out


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
