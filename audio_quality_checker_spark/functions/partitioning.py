"""Scan-width guard for compute-heavy map stages.

A single-file (or single-row-group) parquet table arrives as ONE input
split, and every expensive map-side pass fused onto that scan —
interpreted higher-order functions, regexp chains, Arrow/pandas kernels
— then runs on one core (measured at sf1: the driver fixture writes
one-row-group files, so the decontamination tokenizer, the PII regexp
chain and the chunking HOFs all ran single-task on a 32-core host).

``widen`` repartitions ONLY when the input is narrower than the target
(default: defaultParallelism).  At production scale inputs carry
thousands of splits and this is a structural no-op — the conditional is
what keeps the map-only plans map-only where parallelism already
exists, so the no-Exchange scale stories in PLANS.md still hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default
    defaultParallelism) iff it is currently narrower.

    Width is probed via ``inputFiles()`` (a file listing, no RDD plan
    conversion).  File count lower-bounds split count, so the only
    false positive is a few-huge-multi-row-group-files scan, where an
    extra repartition of a narrow projection is cheap relative to the
    compute stage it feeds.  Non-file relations (cached/in-memory
    frames) probe the actual partition count before shuffling."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or max(2, sc.defaultParallelism)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:
            pass
    return df.repartition(target)
