"""Capture .explain("formatted") for registry queries into plans/r07/.

Usage: python scripts/capture_plans.py <suffix> [query,query,...]
Writes plans/r07/<query>_<suffix>.txt for each query (default: all).

NOTE: queries that materialize eagerly inside fn() (the guarded dedup
family persists + counts its output) run their full compute here and
their top-level plan is an InMemoryRelation scan; for those the
interesting plans are captured separately by the operator-level
harnesses in bench_extra runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_quality_checker_spark.entry_queries import REGISTRY  # noqa: E402
from audio_quality_checker_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="aqcs-plan-capture", cores=cpus,
                      shuffle_partitions=2 * cpus)
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
