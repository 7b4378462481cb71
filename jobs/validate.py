"""spark-submit entry point: validate a pages table end-to-end.

    spark-submit --py-files aqcs.zip jobs/validate.py \
        --pages /path/pages --ref-hosts /path/ref_hosts \
        --baseline /path/baseline_snapshot --out /path/results [--quick]

CLI analog of main.rs:31-124 (args -> config -> per-file loop -> report):
args -> CheckSuite -> lazy DataFrame DAG -> one action -> report + sinks.
"""

from __future__ import annotations

import argparse
import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="validate a pages table")
    ap.add_argument("--pages", required=True, help="parquet path of the pages table")
    ap.add_argument("--ref-hosts", default=None)
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--out", default=None, help="results root (parquet)")
    ap.add_argument("--quick", action="store_true", help="cheap structural checks only")
    ap.add_argument("--full", action="store_true", help="re-extract every row")
    ap.add_argument("--json", action="store_true", help="emit verdicts as JSON lines")
    ap.add_argument("--repetition", action="store_true",
                    help="opt-in within-doc repetition gate (dup-line "
                         "fraction; RepetitionAnomaly violations)")
    ap.add_argument("--near-dup", action="store_true",
                    help="opt-in cross-doc near-dup rate gate (guarded "
                         "MinHash pair surface per partition; "
                         "NearDuplicationAnomaly violations)")
    ap.add_argument("--resumable", action="store_true",
                    help="checkpointed per-partition lineage + resume: "
                         "skip partitions already DONE in "
                         "<out>/lineage, write results idempotently "
                         "per partition (requires --out)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    if args.resumable and not args.out:
        ap.error("--resumable requires --out (the lineage table lives "
                 "under the results root)")

    import dataclasses

    from audio_quality_checker_spark.config import FULL, QUICK, CheckSuite
    from audio_quality_checker_spark.plans.validate import print_report, validate
    from audio_quality_checker_spark.session import get_spark

    suite = QUICK if args.quick else (FULL if args.full else CheckSuite())
    if args.repetition:
        suite = dataclasses.replace(suite, check_repetition=True)
    if args.near_dup:
        suite = dataclasses.replace(suite, check_near_dup=True)
    spark = get_spark(app_name="aqcs-validate", cores=args.cores)
    t0 = time.time()
    if args.resumable:
        from audio_quality_checker_spark.plans.lineage import (
            validate_resumable,
        )

        res = validate_resumable(
            spark,
            pages_path=args.pages,
            results_root=args.out,
            ref_hosts_path=args.ref_hosts,
            baseline_path=args.baseline,
            suite=suite,
        )
        if res is None:
            print("-- all partitions already DONE (no-op resume)",
                  file=sys.stderr)
            print("-- validated 0 docs in 0.00s (resume no-op)",
                  file=sys.stderr)
            return 0
    else:
        res = validate(
            spark,
            pages_path=args.pages,
            ref_hosts_path=args.ref_hosts,
            baseline_path=args.baseline,
            suite=suite,
            results_root=args.out,
        )
    if args.json:
        # distributed JSON-lines serialization (F.to_json rides codegen;
        # only the already-tiny per-partition verdict rows are collected)
        from audio_quality_checker_spark.functions.json_io import (
            verdicts_to_json,
        )

        for r in verdicts_to_json(
            res.verdicts.orderBy("partition_key")
        ).collect():
            print(r["json"])
    else:
        print_report(res)
    n = res.verdicts.agg({"n_rows": "sum"}).collect()[0][0] or 0
    dt = time.time() - t0
    print(f"-- validated {n} docs in {dt:.2f}s ({n / max(dt, 1e-9):.0f} docs/sec)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
