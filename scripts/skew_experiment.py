"""Skew leg of the scaling bench: pathological-host corpus, salted vs
unsalted host-window work, at a taskset CPU budget.

The validation pass itself keys on p_day (balanced by construction), so
the operator that actually suffers host skew is a Window partitioned by
host — every row of the hot host lands in ONE task.  This script times:

  1. the full validation pass on the skewed corpus (robustness: verdicts
     must be identical to the non-skewed expectation for these
     categories, and throughput should match the normal-corpus legs),
  2. top-k urls per host by text_len, unsalted (one task sorts the hot
     host) vs salted (operators/skew.py two-level top-k), asserting the
     results are identical.

Corpus:   python3 jobs/gen_fixtures.py --out /dev/shm/aqcs_skew \
              --rows 667000 --distributed --hot-host-frac 0.4
One leg:  taskset -c 0-15 python3 scripts/skew_experiment.py \
              --budget 16 --data /dev/shm/aqcs_skew --reps 2
Prints one JSON line per leg; BENCH/BASELINE.md records the analysis.
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
    ap.add_argument("--data", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-validate", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from audio_quality_checker_spark.operators.skew import (
        salted_topk,
        topk_per_key,
    )
    from audio_quality_checker_spark.operators.stats import (
        derive_row_features,
        with_partition_key,
    )
    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="aqcs-skew", cores=args.budget,
                      shuffle_partitions=2 * args.budget)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    pages = spark.read.parquet(f"{args.data}/pages")
    n_docs = pages.count()

    out: dict = {"budget": args.budget, "n_docs": n_docs}

    # host profile frame: (host, url, text_len) — built once, cached, so
    # the A/B below times ONLY the window strategies, not the scan
    feats = derive_row_features(with_partition_key(pages)).select(
        "host", "url", "text_len"
    )
    feats = feats.where(F.col("text_len").isNotNull())
    feats.persist()
    feats.count()
    hot = (
        feats.groupBy("host").count().orderBy(F.desc("count")).first()
    )
    out["hot_host_frac"] = round(hot["count"] / n_docs, 4)

    def best_of(fn) -> float:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    out["topk_unsalted_s"] = best_of(
        lambda: topk_per_key(feats, "host", "text_len", 10, "url")
    )
    out["topk_salted_s"] = best_of(
        lambda: salted_topk(feats, "host", "text_len", 10, "url",
                            n_salts=4 * args.budget)
    )
    a = {tuple(r) for r in
         topk_per_key(feats, "host", "text_len", 10, "url").collect()}
    b = {tuple(r) for r in
         salted_topk(feats, "host", "text_len", 10, "url",
                     n_salts=4 * args.budget).collect()}
    out["topk_identical"] = a == b
    feats.unpersist()

    if not args.skip_validate:
        from audio_quality_checker_spark.plans.validate import run_checks

        ref_hosts = spark.read.parquet(f"{args.data}/ref_hosts")
        baseline = spark.read.parquet(f"{args.data}/baseline_snapshot")
        best = float("inf")
        verdicts = None
        for _ in range(args.reps):
            t0 = time.time()
            res = run_checks(spark, pages, ref_hosts, baseline)
            verdicts = sorted(
                (r["partition_key"], r["passed"], r["n_violations"])
                for r in res.verdicts.collect()
            )
            res.unpersist()
            best = min(best, time.time() - t0)
        out["validate_s"] = round(best, 2)
        out["validate_docs_per_s"] = round(n_docs / best)
        out["verdicts"] = [
            f"{d}:{'P' if p else 'F'}{n}" for d, p, n in verdicts
        ]

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
