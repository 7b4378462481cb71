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
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from audio_quality_checker_spark import __version__
    from audio_quality_checker_spark.plans.regression_report import (
        append_trend,
        quality_report,
        report_summary,
    )
    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="aqcs-quality-report", cores=args.cores)
    wh = args.warehouse
    rep = quality_report(
        spark,
        spark.read.parquet(f"{wh}/pages"),
        spark.read.parquet(f"{wh}/ref_hosts"),
        spark.read.parquet(f"{wh}/baseline_snapshot"),
        spark.read.parquet(f"{wh}/expected_verdicts"),
    )
    for r in rep.orderBy("partition_key").collect():
        mark = "ok  " if r["verdict_ok"] else "DIFF"
        print(
            f"{r['partition_key']}  {mark}  {r['category']:20s} "
            f"FN={r['n_false_negatives']} FP={r['n_false_positives']} "
            f"missing={r['missing_types']} unexpected={r['unexpected_types']}"
        )
    summary = report_summary(rep, engine_version=__version__)
    print(json.dumps(summary, sort_keys=True))
    if args.trend:
        append_trend(summary, args.trend)
    return 0  # report-only: never fails the pipeline


if __name__ == "__main__":
    sys.exit(main())
