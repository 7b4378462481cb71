"""KLL sketch: rank-error bounds vs the exact oracle (SURVEY.md §7
known-hard #2: assert error bounds, not exact equality) + mergeability
and serialization round-trips + the Spark partial/final pipeline."""

import numpy as np
import pytest

from audio_quality_checker_spark.functions.sketches import KLLSketch

QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def rank_error(data: np.ndarray, estimate: float, q: float) -> float:
    true_rank = np.searchsorted(np.sort(data), estimate, side="right") / len(data)
    return abs(true_rank - q)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_rank_error_bound(dist):
    rng = np.random.default_rng(42)
    n = 200_000
    data = {
        "uniform": rng.uniform(0, 1000, n),
        "lognormal": rng.lognormal(3, 2, n),
        "bimodal": np.concatenate([rng.normal(10, 1, n // 2), rng.normal(1000, 5, n // 2)]),
    }[dist]
    sk = KLLSketch(k=200)
    for chunk in np.array_split(data, 37):
        sk.update_many(chunk)
    assert sk.n == n
    for q in QS:
        err = rank_error(data, sk.quantile(q), q)
        assert err < 0.025, f"{dist} q={q}: rank error {err}"


def test_merge_equals_single_stream():
    """Merged per-chunk sketches must meet the same error bound as a
    single-stream sketch (mergeability is the whole point)."""
    rng = np.random.default_rng(7)
    data = rng.exponential(100, 300_000)
    parts = np.array_split(data, 16)
    sketches = []
    for p in parts:
        s = KLLSketch(k=200)
        s.update_many(p)
        sketches.append(s)
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)
    assert merged.n == len(data)
    for q in QS:
        err = rank_error(data, merged.quantile(q), q)
        assert err < 0.03, f"merged q={q}: rank error {err}"


def test_serialization_roundtrip():
    rng = np.random.default_rng(1)
    sk = KLLSketch(k=128)
    sk.update_many(rng.normal(0, 1, 50_000))
    rt = KLLSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n
    for q in QS:
        assert rt.quantile(q) == sk.quantile(q)


def test_old_wire_format_rejected():
    """A v1 blob (pre-seed header, magic KLL1) must fail loudly instead of
    unpacking shifted fields into garbage."""
    import struct

    import pytest

    from audio_quality_checker_spark.functions.sketches import KLLSketch

    v1_blob = b"KLL1" + struct.pack("<iqii", 200, 10, 0, 0)
    with pytest.raises(ValueError, match="KLL2"):
        KLLSketch.from_bytes(v1_blob)


def test_determinism():
    data = np.arange(100_000, dtype=np.float64)
    a, b = KLLSketch(), KLLSketch()
    a.update_many(data)
    b.update_many(data)
    assert a.to_bytes() == b.to_bytes()


def test_empty_and_nan():
    sk = KLLSketch()
    sk.update_many(np.array([np.nan, np.nan]))
    assert sk.n == 0
    assert np.isnan(sk.quantile(0.5))


def test_spark_pipeline_matches_exact(spark, golden):
    """End-to-end: mapInPandas partials -> applyInPandas merge -> quantiles,
    vs percentile_approx and exact percentile on the same column."""
    from pyspark.sql import functions as F

    from audio_quality_checker_spark.operators.quantiles import (
        build_sketches,
        global_quantiles,
        sketch_quantiles,
    )
    from audio_quality_checker_spark.operators.stats import derive_row_features

    features = derive_row_features(golden["pages"]).select("p_day", "text_len")
    sketches = build_sketches(features.repartition(8), "text_len")
    per_part = {
        r["p_day"]: r for r in sketch_quantiles(sketches, [0.5, 0.95]).collect()
    }
    exact = {
        r["p_day"]: r
        for r in features.groupBy("p_day")
        .agg(
            F.percentile("text_len", 0.5).alias("p50"),
            F.count("text_len").alias("n"),
        )
        .collect()
    }
    assert set(per_part) == set(exact)
    for day, r in per_part.items():
        assert r["n"] == exact[day]["n"]
        # small partitions (~200 rows): sketch never compacts, so the
        # estimate is within a couple of ranks of the exact median
        lens = sorted(
            x["text_len"]
            for x in features.where(
                (F.col("p_day") == day) & F.col("text_len").isNotNull()
            ).collect()
        )
        rank = np.searchsorted(lens, r["q_50"], side="right") / len(lens)
        assert abs(rank - 0.5) < 0.05, day

    g = global_quantiles(sketches, [0.5])
    assert g["n"] == sum(e["n"] for e in exact.values())
