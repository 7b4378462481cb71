"""Verdict assembly: violations -> per-partition score + pass/fail.

Heir of the reference's verdict trio:
 - min-confidence filter            (detector.rs:374-376)
 - multiplicative quality score     (detector.rs:744-772):
       score = prod over defects of (1 - penalty * confidence), floored 0
   computed distributively as exp(sum(ln(1 - penalty*conf))) — an
   associative+commutative aggregate, so it runs partial/final like any
   sum (SURVEY.md §2.4).
 - pass iff score > threshold AND no critical-class violation
                                     (detector.rs:360-371)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import VIOLATION_COLS


def combine_violations(frames: list[DataFrame], suite: CheckSuite) -> DataFrame:
    """unionByName of the per-check violation frames (the defect-vector
    accumulation analog, detector.rs:180) + the final min-confidence
    filter."""
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr.select(*VIOLATION_COLS))
    return out.where(F.col("confidence") >= F.lit(suite.min_confidence))


def assemble_verdicts(
    violations: DataFrame, stats: DataFrame, suite: CheckSuite
) -> DataFrame:
    """One row per partition: score, verdict, violation summary.

    LEFT join from stats so partitions with zero violations still get a
    verdict row (score 1.0, PASS) — every scanned file gets a report in
    the reference (main.rs:115-124).
    """
    penalty = F.lit(suite.default_penalty)
    for vtype, p in suite.penalties.items():
        penalty = F.when(F.col("violation_type") == vtype, F.lit(p)).otherwise(penalty)
    per_part = violations.groupBy("partition_key").agg(
        F.exp(
            F.sum(
                F.log(
                    F.greatest(
                        F.lit(1.0) - penalty * F.col("confidence"), F.lit(1e-6)
                    )
                )
            )
        ).alias("raw_score"),
        F.count(F.lit(1)).alias("n_violations"),
        F.sort_array(F.collect_set("violation_type")).alias("violation_types"),
        F.max(
            F.when(
                F.col("violation_type").isin(*suite.critical_types), F.lit(True)
            ).otherwise(F.lit(False))
        ).alias("has_critical"),
    )
    joined = stats.select(
        F.col("p_day").alias("partition_key"), "n_rows"
    ).join(per_part, "partition_key", "left")
    score = F.coalesce(F.col("raw_score"), F.lit(1.0))
    return joined.select(
        "partition_key",
        "n_rows",
        F.round(score, 6).alias("quality_score"),
        (
            (score > F.lit(suite.pass_score_threshold))
            & ~F.coalesce(F.col("has_critical"), F.lit(False))
        ).alias("passed"),
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        F.coalesce(
            F.col("violation_types"), F.array().cast("array<string>")
        ).alias("violation_types"),
    )
