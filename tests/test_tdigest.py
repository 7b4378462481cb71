"""t-digest: rank-error bounds vs exact (tail-weighted), mergeability
within the accuracy bound, serialization round trip, edge cases."""

import numpy as np
import pytest

from audio_quality_checker_spark.functions.tdigest import TDigest

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


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
        "bimodal": np.concatenate(
            [rng.normal(10, 1, n // 2), rng.normal(1000, 5, n // 2)]
        ),
    }[dist]
    td = TDigest(delta=100)
    for chunk in np.array_split(data, 37):
        td.update_many(chunk)
    for q in QS:
        err = rank_error(data, td.quantile(q), q)
        # k1 scale function: cluster q-width <= ~1/delta at the middle,
        # shrinking toward the tails — 0.02 is a conservative envelope
        assert err < 0.02, f"{dist} q={q}: rank error {err}"
        # tails must be tighter than the middle bound (the t-digest point)
        if q in (0.01, 0.99):
            assert err < 0.005, f"{dist} tail q={q}: rank error {err}"


def test_merge_within_bound():
    rng = np.random.default_rng(7)
    data = rng.lognormal(2, 1.5, 120_000)
    parts = np.array_split(data, 16)
    digests = [TDigest().update_many(p) for p in parts]
    merged = digests[0]
    for d in digests[1:]:
        merged = merged.merge(d)
    assert merged.n == len(data)
    for q in QS:
        err = rank_error(data, merged.quantile(q), q)
        assert err < 0.02, f"merged q={q}: rank error {err}"


def test_serialization_roundtrip():
    rng = np.random.default_rng(3)
    td = TDigest().update_many(rng.uniform(0, 1, 50_000))
    rt = TDigest.from_bytes(td.to_bytes())
    for q in QS:
        assert rt.quantile(q) == td.quantile(q)
    assert (rt.n, rt.min, rt.max) == (td.n, td.min, td.max)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="TDG1"):
        TDigest.from_bytes(b"XXXX" + b"\x00" * 64)


def test_empty_small_and_nan():
    assert np.isnan(TDigest().quantile(0.5))
    td = TDigest().update_many([5.0, np.nan])
    assert td.quantile(0.5) == 5.0
    td2 = TDigest().update_many([1.0, 2.0, 3.0, 4.0])
    assert 1.0 <= td2.quantile(0.25) <= 2.5
    assert td2.min == 1.0 and td2.max == 4.0


def test_exact_extremes():
    rng = np.random.default_rng(9)
    data = rng.normal(0, 100, 30_000)
    td = TDigest().update_many(data)
    assert td.quantile(0.0) == pytest.approx(data.min())
    assert td.quantile(1.0) == pytest.approx(data.max())
