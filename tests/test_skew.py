"""Salted aggregation equals unsalted aggregation (correctness) and the
salt actually spreads the hot key across reducer inputs."""

from pyspark.sql import functions as F

from audio_quality_checker_spark.operators.skew import (
    host_counts_salted,
    with_salt,
)
from audio_quality_checker_spark.operators.stats import derive_row_features
from audio_quality_checker_spark.sources.pages import gen_pages_pdf


def test_salted_counts_match_plain(spark):
    pages = spark.createDataFrame(
        gen_pages_pdf(400, categories=["SkewHost"])
    )
    features = derive_row_features(pages)
    plain = {
        r["host"]: r["n"]
        for r in features.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["host"]: r["n_rows"] for r in host_counts_salted(features).collect()
    }
    assert salted == plain
    # the fixture's hot host really is hot (~40%)
    assert max(plain.values()) > 0.3 * sum(plain.values())


def test_salt_spreads_hot_key(spark):
    pages = spark.createDataFrame(gen_pages_pdf(400, categories=["SkewHost"]))
    features = with_salt(derive_row_features(pages), n_salts=16, unique_col="url")
    hot = (
        features.groupBy("host")
        .count()
        .orderBy(F.desc("count"))
        .first()["host"]
    )
    per_salt = (
        features.where(F.col("host") == hot).groupBy("_salt").count().collect()
    )
    counts = [r["count"] for r in per_salt]
    assert len(counts) == 16  # every salt bucket hit
    expected = sum(counts) / 16
    # binomial spread at ~160 rows is wide; bound the max bucket at 3x the
    # mean — what matters for skew relief is no bucket re-concentrating
    assert max(counts) < 3 * expected, counts


def test_salt_deterministic(spark):
    pages = spark.createDataFrame(gen_pages_pdf(50, categories=["Control_Clean"]))
    f = derive_row_features(pages)
    a = {r["url"]: r["_salt"] for r in with_salt(f, unique_col="url").collect()}
    b = {r["url"]: r["_salt"] for r in with_salt(f, unique_col="url").collect()}
    assert a == b
