"""Two-parallelism scaling bench for the full validation pass.

The north rule's cluster-size criterion ("N and 4N executors, throughput
scaling efficiency >= 0.8") is evidenced in this sandbox by running the
SAME job on the SAME input at two CPU budgets:
efficiency = (thr_4N / thr_N) / 4.

The CPU budget is enforced with `taskset` (OS affinity), NOT just
`local[n]`: a pandas-UDF pipeline runs its Python workers *outside* the
JVM task threads, so bare local[4] actually consumes ~8 CPUs and
understates scaling.  Each leg gets cpus = budget, with local[budget/2]
task slots so the other half of the budget feeds the Python workers —
exactly how a real executor node's cores are split between the JVM and
pyspark workers (spark.executor.pyspark.memory/cores provisioning).

Each run is a fresh subprocess (a JVM cannot change master); timing is
the validation pass itself — DAG build + all checks + verdict collect —
excluding SparkSession startup and input generation, i.e. the boundary a
cluster scheduler would bill for the job's stages.  min over --reps
passes (least-contended) is reported; verdict equality across legs is
asserted.

Usage: python3 scripts/bench_scaling.py [--rows-per-cat 420000]
       [--out BENCH/BASELINE.md] [--data /tmp/aqcs_bench_pages]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from audio_quality_checker_spark.session import get_spark
from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks

cpu_budget = int(sys.argv[1]); data = sys.argv[2]; reps = int(sys.argv[3])
# JVM-only stages get the whole budget as task slots; the engine itself
# halves the slot width of its one Python-heavy stage (extraction) so
# worker+feeder pairs fit the same budget.  Both components then scale
# proportionally with the budget.
cores = cpu_budget
os.environ.setdefault("SPARK_DRIVER_JAVA_OPTS",
                      f"-XX:+UseParallelGC -XX:ParallelGCThreads={{max(2, cpu_budget // 2)}}")
spark = get_spark(app_name=f"aqcs-scale-{{cpu_budget}}", cores=cores,
                  shuffle_partitions=2 * cores)
pages = spark.read.parquet(f"{{data}}/pages")
hosts = spark.read.parquet(f"{{data}}/ref_hosts")
base = spark.read.parquet(f"{{data}}/baseline_snapshot")
# warmup: JVM JIT + python worker daemons + OS page cache, outside the clock
spark.range(10_000_000).selectExpr("sum(id)").collect()
n_docs = pages.count()

suite = CheckSuite(check_extraction_full=True)  # compute-bound regime
times, verdicts, n_viol = [], None, None
for _ in range(reps):
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    t0 = time.time()
    res = run_checks(spark, pages, hosts, base, suite=suite)
    n_viol = res.violations.count()
    verdicts = res.verdicts.collect()
    times.append(time.time() - t0)
    res.unpersist()
dt = min(times)  # min over reps: least-contended = true capability
print(json.dumps({{"cores": cpu_budget, "n_docs": n_docs, "seconds": round(dt, 2),
                 "all_seconds": [round(t, 2) for t in times],
                 "docs_per_sec": round(n_docs / dt, 1),
                 "n_violations": n_viol,
                 "verdicts": sorted((r['partition_key'], bool(r['passed']))
                                     for r in verdicts)}}))
"""


def run_at(cpu_budget: int, data: str, reps: int = 3) -> dict:
    script = RUN_ONE.format(repo=REPO)
    cmd = ["taskset", "-c", f"0-{cpu_budget - 1}",
           sys.executable, "-c", script, str(cpu_budget), data, str(reps)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"run at {cpu_budget} cpus failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-cat", type=int, default=667_000)
    # default to ramdisk: the disk-independent A/B leg (see BENCH/BASELINE.md)
    ap.add_argument("--data", default="/dev/shm/aqcs_bench_pages")
    # writes the raw run table; the analyzed narrative lives in
    # BENCH/BASELINE.md (hand-maintained) — don't clobber it
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling_run.md"))
    # CPU budgets (taskset affinity): N=4 CPUs vs 4N=16 CPUs.  16 < 32
    # machine CPUs so the large leg is never host-contended.
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--large", type=int, default=16)
    ap.add_argument("--reuse-data", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not args.reuse_data or not os.path.exists(f"{args.data}/pages"):
        print(f"generating {args.rows_per_cat} rows/category to {args.data} ...")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "gen_fixtures.py"),
             "--out", args.data, "--rows", str(args.rows_per_cat),
             "--distributed"],
            check=True, cwd=REPO,
        )

    print(f"run 1/2: {args.small} cpus")
    r_small = run_at(args.small, args.data, args.reps)
    print(r_small)
    print(f"run 2/2: {args.large} cpus")
    r_large = run_at(args.large, args.data, args.reps)
    print(r_large)

    assert r_small["verdicts"] == r_large["verdicts"], "verdicts differ across parallelism!"
    speedup = r_large["docs_per_sec"] / r_small["docs_per_sec"]
    ratio = args.large / args.small
    eff = speedup / ratio
    summary = {
        "n_docs": r_small["n_docs"],
        f"docs_per_sec_{args.small}cpu": r_small["docs_per_sec"],
        f"docs_per_sec_{args.large}cpu": r_large["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured validation-pass throughput

Full stats + constraints + drift pass (`run_checks`, all checks enabled,
`check_extraction_full=True` so every row is re-extracted) over the
deterministic synthetic `pages` corpus, {r_small['n_docs']:,} docs
({args.rows_per_cat:,} rows per defect category, avg ~3 KB html/row).

Cluster-size scaling evidenced per the sandbox rule by two parallelism
CPU budgets on the same input ({args.small} CPUs via taskset standing in
for N executors, {args.large} CPUs for 4N; within each budget half the
CPUs drive JVM task slots and half the pandas-UDF python workers, as on
a real executor node).  Timing covers the validation job itself (all
Spark stages + verdict collect, min over {args.reps} passes), excluding
session startup and input generation.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| {args.small} CPUs, taskset (N) | {r_small['seconds']} | {r_small['docs_per_sec']:,} |
| {args.large} CPUs, taskset (4N) | {r_large['seconds']} | {r_large['docs_per_sec']:,} |

**Speedup {args.small}->{args.large} cores: {speedup:.2f}x of {ratio:.0f}x ideal
-> scaling efficiency = {eff:.3f}** (target >= 0.8).

Correctness invariance: per-partition verdicts identical at both
parallelism levels ({len(r_small['verdicts'])} partitions compared).

Reproduce: `python3 scripts/bench_scaling.py --rows-per-cat {args.rows_per_cat}`.
""")
    print(f"wrote {args.out}")
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
