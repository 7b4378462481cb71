"""Driver-side drift finalize must be semantically identical to the
distributed path (same smoothing, bin universe, ordered-bin KS)."""

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.drift import drift_violations
from audio_quality_checker_spark.operators.stats import (
    derive_row_features,
    distribution_counts_all,
)


def test_driver_finalize_equals_distributed(spark, golden):
    feats = derive_row_features(golden["pages"]).drop("html", "text")
    dist = distribution_counts_all(feats)
    dist.persist()
    suite = CheckSuite()

    def key(rows):
        return sorted(
            (r["partition_key"], r["violation_type"], r["column_name"],
             r["confidence"], r["evidence"])
            for r in rows
        )

    distributed = key(
        drift_violations(dist, golden["baseline"], suite,
                         driver_finalize=False).collect()
    )
    driver = key(
        drift_violations(dist, golden["baseline"], suite,
                         driver_finalize=True).collect()
    )
    assert driver == distributed
    assert distributed, "golden corpus must produce drift violations"
    dist.unpersist()
