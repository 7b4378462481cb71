"""spark-submit entry point: the report-only regression tier
(regression_test.rs:141-144 analog — track detector quality over time
WITHOUT failing CI).

    spark-submit --py-files aqcs.zip jobs/quality_report.py \
        --warehouse /tmp/aqcs_wh [--trend /path/trend.jsonl]

Reads the labeled fixture warehouse (pages + expected_verdicts), scores
the current engine against it, prints the per-category FP/FN table and
ONE JSON summary line, and appends the summary to the trend log.  Exit
code is ALWAYS 0 on a completed run: regressions become a trend line,
not a red build (the hard-fail qualification tier lives in pytest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="report-only quality regression")
    ap.add_argument("--warehouse", required=True,
                    help="fixture warehouse root (pages, ref_hosts, "
                         "baseline_snapshot, expected_verdicts)")
    ap.add_argument("--trend", default=None, help="JSONL trend log to append")
    ap.add_argument("--full", action="store_true",
                    help="score the full-tier suite (re-extract every row)")
    ap.add_argument("--repetition", action="store_true",
                    help="also score the opt-in within-doc repetition "
                         "gate against its fixture-golden expectations")
    ap.add_argument("--near-dup", action="store_true",
                    help="also score the opt-in cross-doc near-dup gate "
                         "against its fixture-golden expectations (the "
                         "report-tier recall tripwire)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    import dataclasses

    from audio_quality_checker_spark import __version__
    from audio_quality_checker_spark.config import FULL, CheckSuite
    from audio_quality_checker_spark.plans.regression_report import (
        append_trend,
        augment_expectations,
        quality_report,
        report_summary,
    )
    from audio_quality_checker_spark.session import get_spark

    suite = FULL if args.full else CheckSuite()
    if args.repetition:
        suite = dataclasses.replace(suite, check_repetition=True)
    if args.near_dup:
        suite = dataclasses.replace(suite, check_near_dup=True)
    spark = get_spark(app_name="aqcs-quality-report", cores=args.cores)
    wh = args.warehouse
    expected = augment_expectations(
        spark.read.parquet(f"{wh}/expected_verdicts"),
        near_dup=args.near_dup,
        repetition=args.repetition,
    )
    rep = quality_report(
        spark,
        spark.read.parquet(f"{wh}/pages"),
        spark.read.parquet(f"{wh}/ref_hosts"),
        spark.read.parquet(f"{wh}/baseline_snapshot"),
        expected,
        suite=suite,
    )
    for r in rep.orderBy("partition_key").collect():
        mark = "ok  " if r["verdict_ok"] else "DIFF"
        print(
            f"{r['partition_key']}  {mark}  {r['category']:20s} "
            f"FN={r['n_false_negatives']} FP={r['n_false_positives']} "
            f"missing={r['missing_types']} unexpected={r['unexpected_types']}"
        )
    summary = report_summary(rep, engine_version=__version__)
    # tag the trend point with the scored tier so points remain
    # comparable across a log that mixes base and opt-in runs
    summary["opt_ins"] = sorted(
        n for n, on in
        [("full", args.full), ("repetition", args.repetition),
         ("near_dup", args.near_dup)] if on
    )
    print(json.dumps(summary, sort_keys=True))
    if args.trend:
        append_trend(summary, args.trend)
    return 0  # report-only: never fails the pipeline


if __name__ == "__main__":
    sys.exit(main())
