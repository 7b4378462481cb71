"""Token-balanced sharding: determinism, balance bounds, serpentine
exactness on skewed weights."""

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.operators.sharding import (
    shard_balance_report,
    shard_by_hash,
    shard_by_weight,
)


@pytest.fixture(scope="module")
def weighted(spark):
    import random

    rng = random.Random(13)
    rows = [(i, rng.randint(50, 500)) for i in range(4000)]
    # a few giant docs that break LLN balance arguments
    rows += [(10_000 + i, 50_000) for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, bpe_tokens long")


def test_hash_sharding_deterministic_and_balanced(spark, weighted):
    a = shard_by_hash(weighted, 8)
    b = shard_by_hash(weighted, 8)
    assert (
        a.select("doc_id", "shard").subtract(b.select("doc_id", "shard"))
        .count() == 0
    )
    rep = shard_balance_report(a).collect()
    assert len(rep) == 8
    # doc-count balance: O(sqrt) concentration, generous bound
    counts = [r["n_docs"] for r in rep]
    assert max(counts) - min(counts) < 0.25 * (sum(counts) / 8)


def test_serpentine_near_exact_balance_on_skew(spark, weighted):
    out = shard_by_weight(weighted, 8)
    rep = shard_balance_report(out).collect()
    ws = [r["total_weight"] for r in rep]
    # serpentine's guarantee: the max/min spread is bounded by roughly
    # the largest single document's weight (hash sharding can stack
    # several giants on one shard; serpentine cannot)
    assert max(ws) - min(ws) <= 50_000, ws
    for r in rep:
        assert abs(r["weight_frac"] - 1 / 8) < 0.06
    # every doc assigned exactly one shard, all shards in range
    assert out.where(~F.col("shard").between(0, 7)).count() == 0
    assert out.count() == 4003


def test_serpentine_separates_giants(spark, weighted):
    out = shard_by_weight(weighted, 8)
    giants = out.where(F.col("doc_id") >= 10_000).select("shard").collect()
    assert len({r["shard"] for r in giants}) == 3
