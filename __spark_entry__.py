"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship per-source document quality gate on
sf0.001; `queries()` / `oracle_sql()` expose every implemented operator
(SURVEY.md §2) with value-matched DuckDB oracles.  Implementations live
in audio_quality_checker_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validation engine's verdict shape applied to the
    shared `documents` table — per-source column stats, lang-distribution
    entropy, exact dup rate, and a penalty-scored pass/fail verdict
    (the QualityReport analog, detector.rs:97-140)."""
    from pyspark.sql import functions as F

    from audio_quality_checker_spark.entry_queries import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    total = F.sum("c").over(W.partitionBy("source"))
    entropy = counts.withColumn("p", F.col("c") / total).groupBy("source").agg(
        F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("lang_entropy")
    )
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count_distinct("text").alias("n_distinct_text"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("text_nulls"),
    )
    rep = stats.join(entropy, "source")
    dup_rate = 1.0 - F.col("n_distinct_text") / F.col("n_rows")
    null_rate = F.col("text_nulls") / F.col("n_rows")
    score = F.round(
        (1.0 - 0.5 * F.least(dup_rate * 10, F.lit(1.0)))
        * (1.0 - 0.5 * F.least(null_rate * 10, F.lit(1.0))),
        6,
    )
    return rep.select(
        "source", "n_rows", "avg_chars", "min_chars", "max_chars",
        "lang_entropy",
        F.round(dup_rate, 6).alias("dup_rate"),
        score.alias("quality_score"),
        (score > 0.7).alias("passed"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from audio_quality_checker_spark.entry_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from audio_quality_checker_spark.entry_queries import oracle_sql as _o

    return _o()
