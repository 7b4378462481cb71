"""Streaming ingestion of new crawl data through the SAME validation checks.

The reference is strictly batch (SURVEY.md §2.10) and the engine's primary
resumability story is batch-incremental (plans/lineage.py).  This module
is the optional continuous-ingestion surface: a Structured Streaming
query that watches a pages directory and validates each micro-batch with
the identical `run_checks` DAG via `foreachBatch` — one codepath for batch
and streaming, which is the point of the DataFrame abstraction.

`foreachBatch` (not a streaming agg) because the checks need multi-pass
per-batch semantics (persist + several aggregations) that a single
streaming aggregation cannot express; each micro-batch is effectively one
crawl-slice validated exactly like a batch partition, with results written
via dynamic partition overwrite keyed by batch_id (idempotent on replay:
a re-executed epoch replaces its own partition instead of appending
duplicates).

Also included: a pure streaming stat — per-window ingest counts with
watermarked event time on `warc_ts` — demonstrating the watermark/window
surface for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.plans.validate import run_checks

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "p_day string"
)


def stream_validate(
    spark: SparkSession,
    pages_dir: str,
    results_root: str,
    ref_hosts: DataFrame | None = None,
    baseline: DataFrame | None = None,
    suite: CheckSuite | None = None,
    max_files_per_trigger: int = 8,
):
    """Start a streaming query validating newly-arrived page files.

    Returns the StreamingQuery; callers drive it with
    `processAllAvailable()` (tests) or let it run with a trigger.
    """
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = run_checks(spark, batch_df, ref_hosts, baseline, suite)
        # idempotent on replay: after a crash Structured Streaming re-runs
        # the last epoch with the SAME batch_id, so the write must replace
        # that batch's partition, not append a duplicate of it — dynamic
        # partition overwrite keyed by batch_id touches only the replayed
        # partition and leaves every earlier batch's output intact.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            res.verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(f"{results_root}/stream_verdicts")
        )
        (
            res.violations.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(f"{results_root}/stream_violations")
        )
        res.unpersist()

    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", f"{results_root}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_stats(spark: SparkSession, pages_dir: str,
                        window: str = "1 day", watermark: str = "2 days"):
    """Watermarked tumbling-window ingest counts on event time (warc_ts) —
    the canonical late-data-tolerant streaming aggregation, writing to an
    in-memory sink for inspection.  Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("text")).alias("avg_len"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n", "avg_len")
    )
    # complete mode: append-mode windowed aggs only emit once the watermark
    # passes a window's end, so the newest windows would stay pending
    # forever in a bounded smoke run; complete re-emits the full result per
    # trigger, which is exactly what an inspection sink wants.
    return (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ingest_stats")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(spark: SparkSession, pages_dir: str, out_dir: str,
                 key: str = "url", ts_col: str = "warc_ts",
                 watermark: str = "2 days", query_name: str = "stream_dedup"):
    """Streaming exact dedup: keep the FIRST arrival per `key` within the
    watermark horizon — the ingest-time half of corpus dedup (the batch
    half is jobs/dedup_report.py; this stops duplicate urls from ever
    landing in the raw table).

    `dropDuplicatesWithinWatermark` keys the state store on `key` and
    expires entries once the event-time watermark passes, so state is
    bounded by the dedup horizon instead of growing with the stream —
    the only correct shape at an unbounded 10^12-doc ingest (a plain
    dropDuplicates would pin every key forever).  Returns the
    StreamingQuery; output appends deduplicated rows to parquet under
    ``out_dir`` with a checkpoint for exactly-once resume.
    """
    stream = (
        spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    return (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/deduped")
        .option("checkpointLocation", f"{out_dir}/_checkpoint_dedup")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_dedup(spark: SparkSession, docs_dir: str, state_path: str,
                        threshold: float = 0.7,
                        id_col: str = "doc_id", text_col: str = "text",
                        checkpoint: str | None = None,
                        query_name: str = "stream_ingest_dedup",
                        max_files_per_trigger: int = 8):
    """Streaming NEAR-dup cross-crawl dedup: every micro-batch runs the
    full `ingest_crawl` protocol (operators/crawl_state.py) against the
    accumulated signature state — near-dups of ANY earlier batch (or
    earlier crawl ingested by the batch job; the state table is shared)
    are dropped, within-batch clusters keep one representative, and
    survivors' signatures append under the batch's state partition.

    `foreachBatch` + crawl_id = f"stream-{batch_id}" makes replay
    exactly-once by construction: a re-executed epoch re-runs a
    DETERMINISTIC ingest whose state append overwrites its own
    partition (the plans/lineage.py idempotency pattern — the same
    guarantee `ingest_crawl`'s kill/re-run test pins in batch mode).
    `stream_dedup` above handles EXACT url dedup in-stream with bounded
    state; this surface handles near-dup content, whose signature state
    is the durable table by design.  Returns the StreamingQuery.
    """
    from audio_quality_checker_spark.operators.crawl_state import (
        ingest_crawl,
    )

    docs_ddl = f"{id_col} long, {text_col} string"
    stream = (
        spark.readStream.schema(docs_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_crawl(
            spark, batch_df, state_path, f"stream-{batch_id}",
            id_col=id_col, text_col=text_col, threshold=threshold,
        )

    return (
        stream.writeStream.foreachBatch(per_batch)
        .option(
            "checkpointLocation",
            checkpoint or f"{state_path}/_checkpoint_ingest",
        )
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
