"""spark-submit surface for cross-crawl incremental dedup.

    spark-submit --py-files pkg.zip jobs/dedup_incremental.py \
        --docs /path/crawl_N.parquet --state /path/dedup_state \
        --crawl-id 2025-47 [--threshold 0.7]

Dedups the incoming crawl against the accumulated signature state
(operators/crawl_state.py): near-dups of ANY prior crawl are dropped,
within-crawl clusters keep one representative, and the survivors'
MinHash signatures are appended under the crawl's state partition via
a deterministic partition overwrite — killing and re-running the job
converges to identical state.  Prints one JSON line of counters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="incremental crawl dedup")
    ap.add_argument("--docs", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--crawl-id", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.7)
    args = ap.parse_args(argv)

    from audio_quality_checker_spark.operators.crawl_state import ingest_crawl
    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="aqcs-dedup-incremental")
    docs = spark.read.parquet(args.docs)
    counters = ingest_crawl(
        spark, docs, args.state, args.crawl_id,
        id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold,
    )
    print(json.dumps(counters))
    return 0


if __name__ == "__main__":
    sys.exit(main())
