"""Checkpointed per-partition lineage + resume (north rule: "resumable
from checkpoint with per-partition lineage + metrics").

The reference is one-shot per file; its closest precedent is the test
harness re-running only failed categories.  At 10^12 rows a failed job
must NOT redo finished partitions, so the engine keeps a driver-managed
status table keyed by (partition_key, attempt):

    lineage(partition_key string, attempt int, status string,
            n_rows long, quality_score double, passed boolean,
            started_at timestamp, finished_at timestamp, engine_version string)

Protocol (batch-incremental, no Structured Streaming needed —
SURVEY.md §2.10):
 1. read lineage, collect DONE partition keys (tiny)
 2. prune the input scan to the remaining partitions — a partition-column
    predicate, so Iceberg/parquet skips finished files entirely
 3. run the validation pass on the remainder
 4. write results idempotently per partition (overwrite partition dirs;
    with Iceberg: `overwritePartitions()`), then append DONE rows

Crash between 3 and 4 re-runs those partitions; the per-partition
overwrite makes the redo idempotent — exactly-once RESULTS without
exactly-once execution (SURVEY.md §7 known-hard #3).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from audio_quality_checker_spark import __version__
from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import ValidationResult, run_checks

LINEAGE_DDL = (
    "partition_key string, attempt int, status string, n_rows long, "
    "quality_score double, passed boolean, started_at timestamp, "
    "finished_at timestamp, engine_version string"
)


def _read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    """Read the lineage table, returning None when it does not exist yet.

    Existence is probed by attempting the read and catching the missing-path
    AnalysisException: an os.path.exists() check is driver-local and always
    False on HDFS/S3 — which would silently discard the DONE set and reset
    the attempt counter on exactly the deployments this module targets."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(lineage_path)
        df.schema  # force resolution (lazy readers defer the path check)
        return df
    except AnalysisException:
        return None


def read_done_partitions(spark: SparkSession, lineage_path: str) -> set[str]:
    lineage = _read_lineage(spark, lineage_path)
    if lineage is None:
        return set()
    return {
        r["partition_key"]
        for r in lineage.where(F.col("status") == "DONE")
        .select("partition_key")
        .distinct()
        .collect()
    }


def next_attempt(spark: SparkSession, lineage_path: str) -> int:
    lineage = _read_lineage(spark, lineage_path)
    if lineage is None:
        return 1
    row = lineage.agg(F.max("attempt")).collect()[0]
    return (row[0] or 0) + 1


def validate_resumable(
    spark: SparkSession,
    pages_path: str,
    results_root: str,
    ref_hosts_path: str | None = None,
    baseline_path: str | None = None,
    suite: CheckSuite | None = None,
    partition_col: str = "p_day",
) -> ValidationResult | None:
    """Run the validation pass over NOT-yet-DONE partitions only, write
    per-partition results idempotently, record lineage.  Returns None when
    everything is already DONE (the no-op resume)."""
    lineage_path = f"{results_root}/lineage"
    done = read_done_partitions(spark, lineage_path)
    attempt = next_attempt(spark, lineage_path)

    pages = spark.read.parquet(pages_path)
    if done:
        # partition-column predicate -> file pruning: finished crawl days
        # are never read again (the scan-level skip, not a post-filter).
        # Literals must match the column's type (partitioned parquet
        # infers p_day as DATE) or the cast blocks partition pruning.
        from pyspark.sql.types import DateType

        vals: list = sorted(done)
        if isinstance(pages.schema[partition_col].dataType, DateType):
            vals = [dt.date.fromisoformat(v) for v in vals]
        # keep null partition keys: ~isin() is three-valued and would
        # silently drop null-p_day rows once any partition is DONE
        pages = pages.where(
            ~F.col(partition_col).isin(vals) | F.col(partition_col).isNull()
        )
    if pages.limit(1).count() == 0:
        return None

    ref_hosts = spark.read.parquet(ref_hosts_path) if ref_hosts_path else None
    baseline = spark.read.parquet(baseline_path) if baseline_path else None
    started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    res = run_checks(spark, pages, ref_hosts, baseline, suite)

    # idempotent per-partition write: same layout as Iceberg
    # overwritePartitions — a redo of a partition replaces, never duplicates
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    res.verdicts.withColumn("pk", F.col("partition_key")).write.mode(
        "overwrite"
    ).partitionBy("pk").parquet(f"{results_root}/verdicts")
    res.violations.withColumn("pk", F.col("partition_key")).write.mode(
        "overwrite"
    ).partitionBy("pk").parquet(f"{results_root}/violations")

    finished = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    lineage_rows = res.verdicts.select(
        "partition_key",
        F.lit(attempt).alias("attempt"),
        F.lit("DONE").alias("status"),
        "n_rows",
        "quality_score",
        "passed",
        F.lit(started).alias("started_at"),
        F.lit(finished).alias("finished_at"),
        F.lit(__version__).alias("engine_version"),
    )
    lineage_rows.write.mode("append").parquet(lineage_path)
    return res
