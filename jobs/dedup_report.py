"""spark-submit surface for the dedup family over a documents table.

    spark-submit --py-files pkg.zip jobs/dedup_report.py \
        --docs /path/documents.parquet --out /path/dedup_report \
        [--threshold 0.5] [--block-cap 5000] [--simhash-radius 3]

Runs the engine's production near-dup surfaces and writes one parquet
table per family plus a one-line JSON summary to stdout:

  exact/      (content_hash, n_dups, doc_ids)    hash-groupBy
  near_dup/   (id_a, id_b, jaccard)              guarded hybrid
              (exact inside bounded blocks, block-keyed LSH beyond)
  simhash/    (id_a, id_b, hamming)              pigeonhole/multi-table
              by radius, exact-signature collapse on
  components/ (doc_id, component)                connected components
              over exact + near-dup edges: component != doc_id marks a
              document the keep-one-per-cluster filter drops
"""

from __future__ import annotations

import argparse
import json
import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="near-duplicate report")
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--block-cap", type=int, default=5_000)
    ap.add_argument("--simhash-radius", type=int, default=3)
    args = ap.parse_args(argv)

    from audio_quality_checker_spark.operators.dedup import (
        exact_dup_groups,
        jaccard_pairs_guarded,
        simhash_near_dups,
    )
    from pyspark.sql import functions as F

    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="aqcs-dedup-report")
    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()

    # NULL-text documents (extraction failures) all md5 to NULL and would
    # form one giant pseudo-duplicate group, corrupting the keep-one
    # counts downstream (round-3 advice) — they are not duplicates of
    # anything, so exclude them from the exact stage entirely.
    exact = exact_dup_groups(
        docs.where(F.col(args.text_col).isNotNull()),
        args.id_col, args.text_col,
    )
    exact.write.mode("overwrite").parquet(f"{args.out}/exact")
    n_exact_groups = spark.read.parquet(f"{args.out}/exact").count()

    near = jaccard_pairs_guarded(
        docs, args.id_col, args.text_col, args.lang_col,
        threshold=args.threshold, block_cap=args.block_cap,
    )
    near.write.mode("overwrite").parquet(f"{args.out}/near_dup")
    near.unpersist()
    n_near = spark.read.parquet(f"{args.out}/near_dup").count()

    sim = simhash_near_dups(
        docs, args.id_col, args.text_col, max_hamming=args.simhash_radius,
    )
    sim.write.mode("overwrite").parquet(f"{args.out}/simhash")
    n_sim = spark.read.parquet(f"{args.out}/simhash").count()

    # duplicate clusters over exact + near-dup edges -> keep-one filter
    from audio_quality_checker_spark.operators.components import (
        connected_components,
    )

    exact_pairs = (
        spark.read.parquet(f"{args.out}/exact")
        .select(
            F.col("doc_ids")[0].alias("id_a"),
            F.explode("doc_ids").alias("id_b"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )
    all_pairs = exact_pairs.unionByName(
        spark.read.parquet(f"{args.out}/near_dup").select("id_a", "id_b")
    )
    comps = connected_components(all_pairs)
    comps.write.mode("overwrite").parquet(f"{args.out}/components")
    comps = spark.read.parquet(f"{args.out}/components")
    n_dropped = comps.where(F.col("component") != F.col("doc_id")).count()

    print(json.dumps({
        "n_docs": n_docs,
        "exact_dup_groups": n_exact_groups,
        "near_dup_pairs": n_near,
        "simhash_pairs": n_sim,
        "dup_cluster_members_dropped": n_dropped,
        "n_docs_after_keep_one": n_docs - n_dropped,
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
