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


def test_old_wire_formats_accepted_and_garbage_rejected():
    """Both historical KLL1 layouts (seedless <iqii and seeded <iqiiq —
    the seed landed before the magic bump) must parse via the
    length-consistency disambiguation; an unknown magic or a blob that
    tiles neither layout must fail loudly (round-3 advice)."""
    import struct

    import pytest

    from audio_quality_checker_spark.functions.sketches import KLLSketch

    sk = KLLSketch(k=128)
    sk.update_many(np.random.default_rng(3).normal(0, 1, 5_000))

    # seeded KLL1 (layout == current KLL2): swap the magic only
    seeded = b"KLL1" + sk.to_bytes()[4:]
    rt = KLLSketch.from_bytes(seeded)
    assert rt.n == sk.n and rt.seed == sk.seed
    for q in QS:
        assert rt.quantile(q) == sk.quantile(q)

    # original seedless KLL1: <iqii header, same size table + payloads
    head = b"KLL1" + struct.pack(
        "<iqii", sk.k, sk.n, sk._compactions, len(sk.levels)
    )
    sizes = struct.pack(
        f"<{len(sk.levels)}i", *[a.size for a in sk.levels]
    )
    body = b"".join(
        np.ascontiguousarray(a).tobytes() for a in sk.levels
    )
    rt1 = KLLSketch.from_bytes(head + sizes + body)
    assert rt1.n == sk.n and rt1.seed == 42
    for q in QS:
        assert rt1.quantile(q) == sk.quantile(q)

    with pytest.raises(ValueError):
        KLLSketch.from_bytes(b"KLLX" + sk.to_bytes()[4:])
    with pytest.raises(ValueError, match="neither"):
        KLLSketch.from_bytes(b"KLL1" + struct.pack("<iqii", 200, 10, 0, 0))


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
