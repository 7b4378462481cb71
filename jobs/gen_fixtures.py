"""spark-submit entry point: materialize the synthetic fixture warehouse.

    spark-submit jobs/gen_fixtures.py --out /tmp/warehouse --rows 2000
"""

from __future__ import annotations

import argparse
import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="generate the fixture warehouse")
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=170, help="rows per category")
    ap.add_argument("--distributed", action="store_true",
                    help="generate via mapInPandas (bench tier)")
    ap.add_argument("--hot-host-frac", type=float, default=None,
                    help="pathological-host corpus: ONE host owns this "
                         "fraction of every category (skew bench tier)")
    args = ap.parse_args(argv)

    from audio_quality_checker_spark.session import get_spark
    from audio_quality_checker_spark.sources import pages as P

    spark = get_spark(app_name="aqcs-gen-fixtures")
    if args.distributed:
        df = P.gen_pages_spark(spark, args.rows, hot_frac=args.hot_host_frac)
        df.write.mode("overwrite").partitionBy("p_day").parquet(f"{args.out}/pages")
        spark.createDataFrame(P.ref_hosts_pdf()).write.mode("overwrite").parquet(
            f"{args.out}/ref_hosts"
        )
        spark.createDataFrame(P.baseline_snapshot_pdf()).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/baseline_snapshot")
        spark.createDataFrame(P.expected_verdicts_pdf()).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/expected_verdicts")
    else:
        P.write_fixture_warehouse(spark, args.out, rows_per_category=args.rows)
    print(f"fixture warehouse written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
