"""Distribution-drift checks: PSI and binned two-sample KS vs a baseline.

Heir of encoder-signature matching (spectral.rs:492-541) and the
null-test comparison (upsampling.rs:170-260): compare the measured
distribution against a stored expectation and score the divergence.

Scale shape: the drift comparison joins **aggregated histograms** (a few
bins per partition) against a broadcast baseline — never raw rows — so
the whole check is one tiny shuffle after the distribution_counts
aggregation (SURVEY.md §2.3 "the only big-big operation is the drift
comparison, which joins aggregated histograms").

PSI = sum_bins (p - q) * ln(p / q)  with additive smoothing (alpha=0.5)
so empty bins never produce infinities.  KS on the *ordered* text-length
bins = sup |CDF_obs - CDF_base| — the binned approximation documented in
SURVEY.md §7 (known-hard #4); the exact oracle lives in tests (numpy
two-sample KS on raw lengths, no global sort in the engine path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)
from audio_quality_checker_spark.sources.pages import LEN_BIN_LABELS

_ALPHA = 0.5  # additive smoothing per bin


def drift_metrics(dist: DataFrame, baseline: DataFrame) -> DataFrame:
    """(p_day, column_name, psi, ks) from observed distribution counts and
    the baseline snapshot.  `dist` is distribution_counts() output;
    `baseline` the snapshot table (snapshot_id, column_name, bin, count,
    total).  Both are tiny; every join is broadcast."""
    base = baseline.select(
        "column_name", "bin",
        F.col("count").alias("b_count"), F.col("total").alias("b_total"),
    )
    obs = dist.select(
        "p_day", "column_name", "bin",
        F.col("count").alias("o_count"), F.col("total").alias("o_total"),
    )

    # bin universe per (p_day, column): union of observed and baseline bins,
    # so mass that vanished (baseline-only bins) still contributes drift
    pdays = obs.select("p_day", "column_name", "o_total").distinct()
    bins = (
        obs.select("column_name", "bin")
        .union(base.select("column_name", "bin"))
        .distinct()
    )
    univ = pdays.join(F.broadcast(bins), "column_name")
    j = (
        univ.join(obs, ["p_day", "column_name", "bin", "o_total"], "left")
        .join(F.broadcast(base), ["column_name", "bin"], "left")
        .fillna({"o_count": 0, "b_count": 0, "b_total": 0})
    )

    n_bins = F.count(F.lit(1)).over(W.partitionBy("p_day", "column_name"))
    p = (F.col("o_count") + _ALPHA) / (F.col("o_total") + _ALPHA * n_bins)
    # b_total is constant per column; fill rows that joined nothing via max
    b_total = F.max("b_total").over(W.partitionBy("column_name"))
    q = (F.col("b_count") + _ALPHA) / (b_total + _ALPHA * n_bins)
    j = j.withColumn("p", p).withColumn("q", q)

    # ordered-bin CDFs for KS (only meaningful for the ordered text_len bins)
    order_expr = F.array_position(
        F.array(*[F.lit(x) for x in LEN_BIN_LABELS]), F.col("bin")
    )
    wcum = (
        W.partitionBy("p_day", "column_name")
        .orderBy(order_expr)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    j = j.withColumn("cum_p", F.sum("p").over(wcum)).withColumn(
        "cum_q", F.sum("q").over(wcum)
    )

    return j.groupBy("p_day", "column_name").agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.when(
            F.first("column_name") == "text_len",
            F.max(F.abs(F.col("cum_p") - F.col("cum_q"))),
        ).alias("ks"),
    )


def drift_violations(dist: DataFrame, baseline: DataFrame, suite: CheckSuite) -> DataFrame:
    m = drift_metrics(dist, baseline)
    pk = F.col("p_day")
    psi_v = m.select(
        *violation_row(
            pk,
            "DistributionDrift",
            F.col("column_name"),
            graded_confidence(F.col("psi"), suite.max_psi),
            F.format_string(
                "PSI %.4f exceeds %.4f on %s", F.col("psi"),
                F.lit(suite.max_psi), F.col("column_name"),
            ),
            {"metric": F.lit("psi"), "value": F.col("psi")},
        )
    ).where(F.col("confidence") > 0)
    ks_v = m.where(F.col("ks").isNotNull()).select(
        *violation_row(
            pk,
            "DistributionDrift",
            F.col("column_name"),
            graded_confidence(F.col("ks"), suite.max_ks_stat),
            F.format_string(
                "binned KS %.4f exceeds %.4f on %s", F.col("ks"),
                F.lit(suite.max_ks_stat), F.col("column_name"),
            ),
            {"metric": F.lit("ks_binned"), "value": F.col("ks")},
        )
    ).where(F.col("confidence") > 0)
    return psi_v.unionByName(ks_v)


def exact_ks_numpy(a: np.ndarray, b: np.ndarray) -> float:
    """Exact two-sample KS statistic (numpy, no scipy) — the small-scale
    oracle for the binned KS (SURVEY.md §7 known-hard #4)."""
    a = np.sort(np.asarray(a, dtype=np.float64))
    b = np.sort(np.asarray(b, dtype=np.float64))
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / len(a)
    cdf_b = np.searchsorted(b, allv, side="right") / len(b)
    return float(np.abs(cdf_a - cdf_b).max())
