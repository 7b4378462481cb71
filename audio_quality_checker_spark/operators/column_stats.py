"""Column-stat checks: null rates, length-distribution anomalies, p50 floor.

The per-column null-rate gate is the engine's canonical column stat — the
clipping-fraction shape (`detect_clipping`, true_peak.rs:127-140: conditional
count / total against a threshold).  The short/long length gates are the
LengthDistributionAnomaly detectors: TruncatedText is the analog of a
bit-depth mismatch (payload carries less information than claimed,
tests/README.md:178), PaddedText of 16->24-bit zero padding (Upscale16,
tests/README.md:156-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)

# columns whose null rate is gated (url/html/warc_ts nulls are schema-level
# breakage; text/lang are content-level)
NULL_CHECKED = ["url", "html", "text", "lang", "warc_ts"]

SHORT_RATE_MAX = 0.10
LONG_RATE_MAX = 0.10


def column_stat_violations(stats: DataFrame, suite: CheckSuite) -> DataFrame:
    """stats (one row per partition) -> violation rows. Pure expressions."""
    pk = F.col("p_day")
    n = F.col("n_rows").cast("double")
    frames = []

    for col in NULL_CHECKED:
        rate = F.col(f"{col}_nulls") / n
        conf = graded_confidence(rate, suite.max_null_rate)
        frames.append(
            stats.select(
                *violation_row(
                    pk,
                    "NullRateExceeded",
                    col,
                    conf,
                    F.format_string(
                        "null rate %.4f exceeds %.4f on `" + col + "`",
                        rate,
                        F.lit(suite.max_null_rate),
                    ),
                    {"null_rate": rate, "threshold": F.lit(suite.max_null_rate)},
                )
            ).where(F.col("confidence") > 0)
        )

    short_rate = F.col("n_short_text") / n
    long_rate = F.col("n_long_text") / n
    for name, rate, thr, tag in [
        ("short", short_rate, SHORT_RATE_MAX, "truncated-suspect"),
        ("long", long_rate, LONG_RATE_MAX, "padded-suspect"),
    ]:
        conf = graded_confidence(rate, thr)
        frames.append(
            stats.select(
                *violation_row(
                    pk,
                    "LengthDistributionAnomaly",
                    "text",
                    conf,
                    F.format_string(
                        tag + ": %s-text rate %.4f exceeds %.4f",
                        F.lit(name),
                        rate,
                        F.lit(thr),
                    ),
                    {"kind": F.lit(name), "rate": rate, "threshold": F.lit(thr)},
                )
            ).where(F.col("confidence") > 0)
        )

    # median-length floor (min_text_len_p50): a whole partition of stunted
    # documents is anomalous even if no single gate rate trips
    p50_deficit = (F.lit(suite.min_text_len_p50) - F.col("len_p50")) / F.lit(
        suite.min_text_len_p50
    )
    frames.append(
        stats.select(
            *violation_row(
                pk,
                "LengthDistributionAnomaly",
                "text",
                graded_confidence(p50_deficit, 0.0001),
                F.format_string(
                    "median text length %.0f below floor %.0f",
                    F.col("len_p50").cast("double"),
                    F.lit(suite.min_text_len_p50),
                ),
                {"len_p50": F.col("len_p50"), "floor": F.lit(suite.min_text_len_p50)},
            )
        ).where(F.col("confidence") > 0)
    )

    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def uniqueness_violations(stats: DataFrame, suite: CheckSuite) -> DataFrame:
    """Duplicate-url gate from the HLL++ (or exact) distinct count already
    in the stats frame — no extra scan.  Heir of the unique-values-ratio
    method (bit_depth.rs:199-250) per the north rule."""
    pk = F.col("p_day")
    dup_rate = F.lit(1.0) - F.col("n_urls_distinct") / F.col("n_rows").cast("double")
    conf = graded_confidence(dup_rate, suite.max_dup_rate)
    return stats.select(
        *violation_row(
            pk,
            "UniquenessViolation",
            "url",
            conf,
            F.format_string(
                "duplicate-url rate %.4f exceeds %.4f (distinct=%d of %d)",
                dup_rate,
                F.lit(suite.max_dup_rate),
                F.col("n_urls_distinct"),
                F.col("n_rows"),
            ),
            {
                "dup_rate": dup_rate,
                "n_urls_distinct": F.col("n_urls_distinct"),
                "n_rows": F.col("n_rows"),
            },
        )
    ).where(F.col("confidence") > 0)
