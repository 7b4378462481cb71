"""Custom stateful streaming operator via applyInPandasWithState: a
per-language EWMA drift monitor over the ingest stream.

The batch engine compares each crawl day against a STORED baseline
(operators/drift.py); the streaming counterpart keeps the baseline as
LIVE STATE — per lang: total rows, running mean text length, and an
exponentially weighted moving average updated once per micro-batch — and
flags a batch whose EWMA diverges from the long-run mean.  This is the
`applyInPandasWithState` surface (arbitrary user state + pandas batches,
checkpointed by the engine): the state survives query restarts, so an
`availableNow` run tomorrow continues today's averages (asserted in
tests/test_stateful_streaming.py).

State is per-key and bytes-sized (3 numbers per lang), so at any corpus
scale the state store holds |langs| rows — the operator's cost is the
shuffle to co-locate keys, exactly like the batch groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from audio_quality_checker_spark.streaming.incremental import PAGES_DDL

STATE_DDL = "n long, mean_len double, ewma_len double"
OUT_DDL = (
    "lang string, batch_rows long, total_rows long, batch_mean double, "
    "mean_len double, ewma_len double, drift_ratio double, drifting boolean"
)


def _update_factory(alpha: float, drift_factor: float):
    def update(key, pdfs, state: GroupState):
        lang = key[0]
        total = 0
        sum_len = 0.0
        for pdf in pdfs:
            v = pdf["text_len"].dropna()
            total += len(v)
            sum_len += float(v.sum()) if len(v) else 0.0
        if total == 0:
            return
        batch_mean = sum_len / total
        if state.exists:
            n, mean_len, ewma = state.get
            new_n = n + total
            new_mean = (mean_len * n + sum_len) / new_n
            new_ewma = alpha * batch_mean + (1 - alpha) * ewma
        else:
            new_n, new_mean, new_ewma = total, batch_mean, batch_mean
        state.update((new_n, new_mean, new_ewma))
        ratio = new_ewma / new_mean if new_mean else 1.0
        drifting = bool(
            ratio > drift_factor or ratio < 1.0 / drift_factor
        )
        yield pd.DataFrame(
            [
                {
                    "lang": lang,
                    "batch_rows": total,
                    "total_rows": new_n,
                    "batch_mean": round(batch_mean, 6),
                    "mean_len": round(new_mean, 6),
                    "ewma_len": round(new_ewma, 6),
                    "drift_ratio": round(ratio, 6),
                    "drifting": drifting,
                }
            ]
        )

    return update


def ewma_drift_stream(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    alpha: float = 0.3,
    drift_factor: float = 1.5,
):
    """Start the stateful monitor; returns the StreamingQuery.  Output
    goes to a parquet table partitioned by batch_id via foreachBatch
    (dynamic partition overwrite — idempotent on epoch replay, and unlike
    the memory sink it supports checkpoint RECOVERY).  Restarting with
    the same checkpoint RESUMES the per-lang state — the streaming analog
    of plans/lineage.py's batch resume.
    """
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
    src = stream.select(
        F.coalesce(F.col("lang"), F.lit("__null__")).alias("lang"),
        F.length("text").cast("double").alias("text_len"),
    )
    out = src.groupBy("lang").applyInPandasWithState(
        _update_factory(alpha, drift_factor),
        OUT_DDL,
        STATE_DDL,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        out.writeStream.foreachBatch(per_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
