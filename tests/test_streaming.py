"""Streaming surface: micro-batch validation through the same run_checks
DAG, and watermarked windowed ingest stats."""

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.sources.pages import (
    baseline_snapshot_pdf,
    gen_pages_pdf,
    ref_hosts_pdf,
)
from audio_quality_checker_spark.streaming.incremental import (
    stream_ingest_stats,
    stream_validate,
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    root = str(tmp_path)
    cats = ["Control_Clean", "NullStorm"]
    pages = spark.createDataFrame(gen_pages_pdf(120, categories=cats))
    pages.write.mode("overwrite").parquet(f"{root}/pages_in")
    return root


def test_stream_validate_matches_batch_semantics(spark, stream_dir):
    hosts = spark.createDataFrame(ref_hosts_pdf())
    base = spark.createDataFrame(baseline_snapshot_pdf(1000))
    q = stream_validate(
        spark, f"{stream_dir}/pages_in", f"{stream_dir}/out", hosts, base
    )
    q.awaitTermination(120)
    verdicts = {
        r["partition_key"]: r["passed"]
        for r in spark.read.parquet(f"{stream_dir}/out/stream_verdicts").collect()
    }
    assert verdicts["2025-11-01"] is True   # Control_Clean
    assert verdicts["2025-11-02"] is False  # NullStorm
    types = {
        r["violation_type"]
        for r in spark.read.parquet(
            f"{stream_dir}/out/stream_violations"
        ).collect()
    }
    assert "NullRateExceeded" in types


def test_stream_ingest_stats_windows(spark, stream_dir):
    q = stream_ingest_stats(spark, f"{stream_dir}/pages_in", window="1 day")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ingest_stats").collect()
    assert len(rows) > 0
    days = {r["window_start"].strftime("%Y-%m-%d") for r in rows}
    assert {"2025-11-01", "2025-11-02"} <= days
    assert all(r["n"] > 0 for r in rows)


def test_stream_dedup_keeps_first_arrival(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate urls inside the horizon
    collapse to one row across micro-batches; state expires with the
    watermark instead of growing forever."""
    from audio_quality_checker_spark.streaming.incremental import stream_dedup

    root = str(tmp_path)
    cats = ["DupUrl"]  # ~10% planted duplicate urls within the day
    pages = spark.createDataFrame(gen_pages_pdf(150, categories=cats))
    n_rows = pages.count()
    n_urls = pages.select("url").distinct().count()
    assert n_urls < n_rows, "fixture must contain duplicate urls"
    pages.write.mode("overwrite").parquet(f"{root}/pages_in")

    q = stream_dedup(spark, f"{root}/pages_in", f"{root}/out")
    q.awaitTermination(120)
    out = spark.read.parquet(f"{root}/out/deduped")
    assert out.count() == n_urls
    assert out.select("url").distinct().count() == n_urls

    # restart with MORE data: previously-seen urls (still within the
    # watermark horizon) must not reappear
    extra = spark.createDataFrame(gen_pages_pdf(170, categories=cats))
    extra.write.mode("append").parquet(f"{root}/pages_in")
    q2 = stream_dedup(spark, f"{root}/pages_in", f"{root}/out")
    q2.awaitTermination(120)
    out2 = spark.read.parquet(f"{root}/out/deduped")
    n_urls_total = (
        spark.read.parquet(f"{root}/pages_in").select("url").distinct().count()
    )
    assert out2.select("url").distinct().count() == n_urls_total
    assert out2.groupBy("url").count().agg({"count": "max"}).first()[0] == 1


def test_stream_ingest_dedup_across_batches(spark, tmp_path):
    """Two micro-batches through the near-dup ingest: batch-2 dups of
    batch-1 are dropped from the state, within-batch clusters keep one
    representative, and restarting the stream over the same input adds
    nothing (checkpoint + deterministic partition overwrite)."""
    import pandas as pd

    from audio_quality_checker_spark.operators.crawl_state import read_state
    from audio_quality_checker_spark.streaming.incremental import (
        stream_ingest_dedup,
    )

    def doc(i, n=60):
        return " ".join(f"s{i:04d}t{j:03d}" for j in range(n))

    def near(i, n=60, swap=4):
        toks = doc(i, n).split()
        toks[-swap:] = [f"sw{j}" for j in range(swap)]
        return " ".join(toks)

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    b1 = pd.DataFrame(
        [(i, doc(i)) for i in range(10)] + [(105, near(5))],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(docs_dir)

    q = stream_ingest_dedup(spark, docs_dir, state, threshold=0.5,
                            max_files_per_trigger=1)
    q.awaitTermination(120)
    ids1 = {r["doc_id"] for r in read_state(spark, state).collect()}
    assert 5 in ids1 and 105 not in ids1 and len(ids1) == 10

    # batch 2: a near-dup of batch-1 doc 7, an exact dup of doc 3, and
    # two fresh docs
    b2 = pd.DataFrame(
        [(200, near(7)), (201, doc(3)), (202, doc(202)), (203, doc(203))],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(docs_dir)
    q2 = stream_ingest_dedup(spark, docs_dir, state, threshold=0.5,
                             max_files_per_trigger=1)
    q2.awaitTermination(120)
    ids2 = {r["doc_id"] for r in read_state(spark, state).collect()}
    assert ids2 == ids1 | {202, 203}, ids2

    # restart over fully-processed input: no state change
    q3 = stream_ingest_dedup(spark, docs_dir, state, threshold=0.5)
    q3.awaitTermination(120)
    snap = sorted(
        (r["doc_id"], r["crawl_id"]) for r in read_state(spark, state).collect()
    )
    ids3 = {d for d, _ in snap}
    assert ids3 == ids2
