"""Result-identity harness for the optimization rounds: compute an
order-insensitive fingerprint of a query's FULL result so
before/after-optimization outputs can be compared bit-for-bit, at any
result size (the hash is computed distributedly — no driver collect).

Usage:
  python scripts/golden_dump.py dump  <out_dir> <sf_dir> [query ...]
  python scripts/golden_dump.py check <out_dir> <sf_dir> [query ...]

Fingerprint per query: (n_rows, sorted column list, bit_xor of per-row
xxhash64 under two seeds, sum of high hash bits).  Doubles are
normalized via round(v, 9) before stringification — same tolerance
scripts/check_oracles.py uses to emulate the driver hash.  Any value,
schema or multiplicity change flips the fingerprint.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fingerprint(df) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    cols = sorted(df.columns)
    norm = []
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, (DoubleType, FloatType)):
            col = F.round(col.cast("double"), 9)
        norm.append(F.coalesce(col.cast("string"), F.lit("∅")))
    rowstr = F.concat_ws("\x1f", *norm)
    agg = df.select(
        F.xxhash64(rowstr).alias("h1"),
        F.xxhash64(rowstr, F.lit(7919)).alias("h2"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(h1)").alias("x1"),
        F.expr("bit_xor(h2)").alias("x2"),
        F.sum(F.shiftrightunsigned("h1", 32)).alias("s1"),
    ).first()
    return {
        "rows": agg["n"], "cols": ",".join(cols),
        "x1": agg["x1"], "x2": agg["x2"], "s1": agg["s1"],
    }


def main() -> int:
    mode, out_dir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from audio_quality_checker_spark.entry_queries import REGISTRY
    from audio_quality_checker_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="aqcs-golden", cores=cpus,
                      shuffle_partitions=2 * cpus)
    names = names or list(REGISTRY)
    failed = []
    for name in names:
        fn, _ = REGISTRY[name]
        rec = {"query": name, **fingerprint(fn(spark, sf_dir))}
        path = os.path.join(out_dir, f"{name}.hash")
        if mode == "dump":
            with open(path, "w") as f:
                json.dump(rec, f)
            print(f"dumped {name}: rows={rec['rows']} x1={rec['x1']}",
                  flush=True)
        else:
            with open(path) as f:
                want = json.load(f)
            ok = want == rec
            print(f"{'OK  ' if ok else 'FAIL'} {name}: rows={rec['rows']} "
                  f"x1={rec['x1']} want_rows={want['rows']} "
                  f"want_x1={want['x1']}", flush=True)
            if not ok:
                failed.append(name)
    if failed:
        print(f"MISMATCH: {failed}")
        return 1
    print("all match" if mode == "check" else "dump complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
