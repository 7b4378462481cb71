"""One leg of a scaling experiment: run the full validation pass at a
given taskset CPU budget and fused task width, print one JSON line.

Usage (run under taskset by the caller):
    taskset -c 0-15 python3 scripts/scale_experiment.py \
        --budget 16 --width 8 --data /dev/shm/aqcs_1m --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, required=True)
    ap.add_argument("--width", type=int, default=0, help="fused task width (0=default)")
    ap.add_argument("--data", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v")
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_DRIVER_JAVA_OPTS",
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, args.budget // 2)}",
    )
    from audio_quality_checker_spark.config import CheckSuite
    from audio_quality_checker_spark.plans.validate import run_checks
    from audio_quality_checker_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        app_name=f"scale-{args.budget}-{args.width}",
        cores=args.budget,
        shuffle_partitions=2 * args.budget,
        extra_conf=extra,
    )
    pages = spark.read.parquet(f"{args.data}/pages")
    hosts = spark.read.parquet(f"{args.data}/ref_hosts")
    base = spark.read.parquet(f"{args.data}/baseline_snapshot")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    n_docs = pages.count()

    suite = CheckSuite(
        check_extraction_full=True,
        fused_task_width=args.width or None,
    )
    times, verdicts = [], None
    for _ in range(args.reps):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        res = run_checks(spark, pages, hosts, base, suite=suite)
        res.violations.count()
        verdicts = res.verdicts.collect()
        times.append(time.time() - t0)
        res.unpersist()
    dt = min(times)
    print(json.dumps({
        "budget": args.budget, "width": args.width, "n_docs": n_docs,
        "seconds": round(dt, 2), "all": [round(t, 2) for t in times],
        "docs_per_sec": round(n_docs / dt, 1),
        "verdicts": sorted((r["partition_key"], bool(r["passed"]))
                           for r in verdicts),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
