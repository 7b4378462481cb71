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

from pyspark.sql import DataFrame, Window as W, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import VIOLATION_COLS


def corroborate(violations: DataFrame, suite: CheckSuite) -> DataFrame:
    """Agreement boost + corroboration gate over the raw violation rows.

    1. **Agreement boost** (upsampling.rs:351-398): when two independent
       checks detect the SAME violation type on one partition (e.g. PSI
       and KS both flag DistributionDrift, on different columns), each
       detection's confidence rises by `agreement_boost`, capped.
    2. **Corroboration gate** (detector.rs:341-358): a detection still at
       the weakest reportable tier after boosting survives only when at
       least one OTHER violation fires on the same partition — a lone
       borderline signal is suppressed (prefer false negatives,
       detector.rs:421).

    Window functions over the tiny violations frame — row counts here are
    per-partition defect counts, never data-scale.
    """
    wp = W.partitionBy("partition_key")
    wt = W.partitionBy("partition_key", "violation_type")
    n_all = F.count(F.lit(1)).over(wp)
    n_same_type = F.count(F.lit(1)).over(wt)
    boosted = F.when(
        n_same_type >= 2,
        F.least(
            F.col("confidence") + F.lit(suite.agreement_boost),
            F.lit(suite.max_boosted_confidence),
        ),
    ).otherwise(F.col("confidence"))
    out = violations.withColumn("_n_all", n_all).withColumn(
        "confidence", boosted
    )
    if suite.corroboration_gate:
        out = out.where(
            (F.col("confidence") > F.lit(suite.corroboration_weak_tier))
            | (F.col("_n_all") >= 2)
        )
    return out.drop("_n_all")


def combine_violations(frames: list[DataFrame], suite: CheckSuite) -> DataFrame:
    """unionByName of the per-check violation frames (the defect-vector
    accumulation analog, detector.rs:180), corroboration, then the final
    min-confidence filter."""
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr.select(*VIOLATION_COLS))
    # violations are per-(partition, check) rows — KB-sized by contract —
    # but the corroboration windows would still fan out to
    # spark.sql.shuffle.partitions tasks; one partition keeps the whole
    # verdict tail a handful of single-task stages.  repartition (a real
    # exchange), NOT coalesce: coalesce(1) propagates up the stage and
    # would collapse every upstream check — including per-day
    # applyInPandas kernels — into a single task.
    out = corroborate(out.repartition(1), suite)
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
