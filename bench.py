"""Driver bench harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect).  The headline metric is the wall-clock sum over the
suite.  The separate two-parallelism scaling bench for the validation
pass lives in scripts/bench_scaling.py and reports to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# every REGISTRY query is headline — resolved at runtime so a new
# queries() entry is automatically benched (a hardcoded list silently
# dropped two round-3 queries before this)
HEADLINE = None


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from audio_quality_checker_spark.entry_queries import REGISTRY
    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="aqcs-bench", cores=cpus,
                      shuffle_partitions=2 * cpus)

    # warmup: JVM codegen + the Python worker daemons (each imports
    # pandas/numpy once per session, ~1.5s/worker — steady-state cost is
    # zero because workers are reused), not counted
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import pandas as _pd

    def _noop(batches):
        for b in batches:
            yield _pd.DataFrame({"id": b["id"]})

    spark.range(0, 10_000, 1, cpus).mapInPandas(
        _noop, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    # parquet reader/codec init is also one-time: touch each table once so
    # the first timed query doesn't absorb format warm-up
    for t in ("documents", "lineitem", "events", "embeddings", "orders"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(100).collect()

    timings: dict[str, float] = {}
    for name in (HEADLINE or list(REGISTRY)):
        fn, _ = REGISTRY[name]
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
