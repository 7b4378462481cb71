"""Resume protocol: kill-and-resume yields identical results to an
uninterrupted run, finished partitions are never reprocessed
(SURVEY.md §7 known-hard #3)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.plans.lineage import (
    read_done_partitions,
    validate_resumable,
)
from audio_quality_checker_spark.sources.pages import (
    baseline_snapshot_pdf,
    gen_pages_pdf,
    ref_hosts_pdf,
)


@pytest.fixture()
def warehouse(spark, tmp_path):
    root = str(tmp_path)
    cats = ["Control_Clean", "NullStorm", "DupUrl", "SkewHost"]
    pages = spark.createDataFrame(gen_pages_pdf(150, categories=cats))
    pages.write.mode("overwrite").partitionBy("p_day").parquet(f"{root}/pages")
    spark.createDataFrame(ref_hosts_pdf()).write.parquet(f"{root}/ref_hosts")
    spark.createDataFrame(baseline_snapshot_pdf(1500)).write.parquet(
        f"{root}/baseline"
    )
    return root


def _verdict_map(spark, results):
    return {
        r["partition_key"]: (r["passed"], r["quality_score"], r["n_violations"])
        for r in spark.read.parquet(f"{results}/verdicts").collect()
    }


def test_full_run_then_resume_is_noop(spark, warehouse):
    results = f"{warehouse}/results"
    res = validate_resumable(
        spark, f"{warehouse}/pages", results,
        f"{warehouse}/ref_hosts", f"{warehouse}/baseline",
    )
    assert res is not None
    first = _verdict_map(spark, results)
    assert len(first) == 4

    # resume: everything DONE -> no-op, results unchanged
    res2 = validate_resumable(
        spark, f"{warehouse}/pages", results,
        f"{warehouse}/ref_hosts", f"{warehouse}/baseline",
    )
    assert res2 is None
    assert _verdict_map(spark, results) == first


def test_partial_failure_resume_matches_uninterrupted(spark, warehouse, tmp_path):
    results = f"{warehouse}/results_partial"
    # simulate a run that died after finishing 2 of 4 partitions: run the
    # full pass on a pruned input, as the protocol would have recorded
    pages = spark.read.parquet(f"{warehouse}/pages")
    # partition-column inference yields DATE; lineage keys are strings
    pages = pages.withColumn("p_day", F.col("p_day").cast("string"))
    two_days = sorted(
        r["p_day"] for r in pages.select("p_day").distinct().collect()
    )[:2]
    pruned = f"{warehouse}/pages_pruned"
    pages.where(F.col("p_day").isin(two_days)).write.partitionBy("p_day").parquet(
        pruned
    )
    validate_resumable(
        spark, pruned, results, f"{warehouse}/ref_hosts", f"{warehouse}/baseline"
    )
    assert read_done_partitions(spark, f"{results}/lineage") == set(two_days)

    # resume against the FULL input: only the remaining 2 partitions run
    res = validate_resumable(
        spark, f"{warehouse}/pages", results,
        f"{warehouse}/ref_hosts", f"{warehouse}/baseline",
    )
    assert res is not None
    resumed_days = {r["partition_key"] for r in res.verdicts.collect()}
    assert resumed_days.isdisjoint(two_days)

    # final state == one uninterrupted run over everything
    reference_results = f"{warehouse}/results_reference"
    validate_resumable(
        spark, f"{warehouse}/pages", reference_results,
        f"{warehouse}/ref_hosts", f"{warehouse}/baseline",
    )
    assert _verdict_map(spark, results) == _verdict_map(spark, reference_results)

    lineage = spark.read.parquet(f"{results}/lineage")
    assert lineage.where(F.col("status") == "DONE").count() == 4
    assert {r["attempt"] for r in lineage.collect()} == {1, 2}
