"""SparkSession factory tuned for the validation engine.

Local-mode defaults mirror what a cluster deployment would set per
executor; the knobs that matter at 100 TB (AQE, skew-join handling,
shuffle partitions sized to input, Arrow batch size) are all explicit
here so the same module configures ``spark-submit`` jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One Arrow batch is the unit of work inside every pandas UDF.  10k rows
# of ~2 KB html ≈ 20 MB per batch — large enough to amortize Arrow
# transfer, small enough to never blow executor memory (the analog of the
# reference's 4096-sample true-peak chunking, true_peak.rs:104-117).
ARROW_BATCH_ROWS = 10_000


def get_spark(
    app_name: str = "audio_quality_checker_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``.  ``shuffle_partitions`` defaults to
    2x cores locally — on a real cluster this is set from input size
    (bytes / 128MB target partition), see plans/validate.py.
    """
    cores_str = "*" if cores is None else str(cores)
    n_cores = os.cpu_count() or 4 if cores is None else cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * n_cores)

    builder = (
        SparkSession.builder.master(f"local[{cores_str}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        # local mode = driver-only: the driver heap IS the cluster memory.
        # Sized so the features cache for bench-tier corpora (columnar,
        # compressed) plus shuffle buffers fit without GC thrash.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # ParallelGC over G1: scans of multi-KB binary columns decompress
        # through JNI critical regions on every task thread; G1's GCLocker
        # stalls under that at high core counts ("Retried waiting for
        # GCLocker too often"), measured 2x slower than ParallelGC on the
        # 32-thread extraction scan (61s vs 33s).
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
