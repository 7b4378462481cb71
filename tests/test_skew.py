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


def test_salted_topk_equals_unsalted(spark):
    """Exactness of the two-level top-k: the global top-k of a key is a
    subset of the union of its per-salt top-k, so the salted plan must
    reproduce the unsalted result bit-for-bit on a 40%-hot key."""
    import numpy as np
    import pandas as pd

    from audio_quality_checker_spark.operators.skew import (
        salted_topk,
        topk_per_key,
    )

    rng = np.random.default_rng(11)
    n = 10_000
    hosts = np.where(
        rng.uniform(size=n) < 0.4, "hot.example",
        np.char.add("h", rng.integers(0, 40, n).astype(str)),
    )
    pdf = pd.DataFrame(
        {"host": hosts, "text_len": rng.integers(0, 100_000, n),
         "url": [f"u{i:06d}" for i in range(n)]}
    )
    df = spark.createDataFrame(pdf)
    plain = {(r["host"], r["url"], r["text_len"])
             for r in topk_per_key(df, "host", "text_len", 7, "url").collect()}
    salted = {(r["host"], r["url"], r["text_len"])
              for r in salted_topk(df, "host", "text_len", 7, "url").collect()}
    assert salted == plain
    hot = [t for t in plain if t[0] == "hot.example"]
    assert len(hot) == 7


def test_salted_agg_doc_contract(spark):
    """The documented call shape — bound Column partial exprs + callable
    merge fns — verbatim from the salted_agg docstring, checked against
    the plain unsalted aggregation."""
    from audio_quality_checker_spark.operators.skew import salted_agg

    pages = spark.createDataFrame(
        gen_pages_pdf(300, categories=["SkewHost"])
    )
    f = derive_row_features(pages).withColumn(
        "n_chars", F.length("text")
    )
    got = {
        (r["host"]): (r["n_rows"], r["max_chars"])
        for r in salted_agg(
            f,
            key="host",
            aggs={
                "n_rows": (F.count(F.lit(1)), F.sum),
                "max_chars": (F.max("n_chars"), F.max),
            },
            unique_col="url",
        ).collect()
    }
    want = {
        r["host"]: (r["n_rows"], r["max_chars"])
        for r in f.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("n_chars").alias("max_chars"),
        ).collect()
    }
    assert got == want
