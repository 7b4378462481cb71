"""Property-based tests (hypothesis) for the pure kernels: totality and
determinism of the extraction function over ARBITRARY bytes, KLL rank
error and merge-order invariance, PSI non-negativity, splitmix64
dispersion.  No Spark session needed — these are the same functions the
UDFs close over."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from audio_quality_checker_spark.functions.extract import (
    ExtractionError,
    extract_text,
    extract_text_safe,
)
from audio_quality_checker_spark.functions.hashing import splitmix64
from audio_quality_checker_spark.functions.sketches import KLLSketch

# ---------------------------------------------------------------------------
# extraction kernel: total, deterministic, idempotent error classification
# ---------------------------------------------------------------------------


@given(st.binary(max_size=2000))
@settings(max_examples=300, deadline=None)
def test_extract_total_over_arbitrary_bytes(raw):
    """A poison payload must NEVER raise out of the safe wrapper — the
    corrupt-frame-skip contract (decoder.rs:138-143): any bytes yield
    either (text, None) or (None, error)."""
    text, err = extract_text_safe(raw)
    assert (text is None) != (err is None)
    # determinism: same bytes, same outcome
    assert extract_text_safe(raw) == (text, err)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_valid_utf8_never_errors(s):
    """Any valid UTF-8 input decodes; the only failure mode of the pinned
    extractor is invalid UTF-8 outside stripped regions."""
    out = extract_text(s.encode("utf-8"))
    assert isinstance(out, str)
    # output is whitespace-normalized: no runs of horizontal space, no
    # blank lines, no leading/trailing whitespace
    assert out == out.strip()
    assert "  " not in out and "\t" not in out and "\n\n" not in out


@given(st.binary(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_error_iff_invalid_utf8_after_strip(raw):
    try:
        extract_text(raw)
    except ExtractionError:
        # the raw bytes must genuinely be undecodable after stripping --
        # never a spurious error on valid input
        import re

        stripped = re.sub(rb"<!--.*?-->", b"", raw, flags=re.DOTALL)
        stripped = re.sub(rb"<script\b.*?</script\s*>", b"", stripped,
                          flags=re.DOTALL | re.IGNORECASE)
        stripped = re.sub(rb"<style\b.*?</style\s*>", b"", stripped,
                          flags=re.DOTALL | re.IGNORECASE)
        try:
            stripped.decode("utf-8", "strict")
            raise AssertionError("ExtractionError on decodable input")
        except UnicodeDecodeError:
            pass


# ---------------------------------------------------------------------------
# KLL sketch: rank-error bound and merge-order invariance of n
# ---------------------------------------------------------------------------


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=50, max_size=2000),
    st.integers(0, 99),
)
@settings(max_examples=50, deadline=None)
def test_kll_rank_error_bound(values, qpct):
    q = qpct / 100.0
    sk = KLLSketch(k=200)
    sk.update_many(np.array(values))
    est = sk.quantile(q)
    v = np.sort(np.array(values))
    # with ties the estimate occupies a rank INTERVAL [left, right]; the
    # target rank must fall within ~5% of that interval (k=200 gives ~1%
    # expected; 5% is the hard CI bound used in the unit suite)
    lo = np.searchsorted(v, est, side="left") / len(v)
    hi = np.searchsorted(v, est, side="right") / len(v)
    tol = 0.05 + 1.0 / len(v)
    assert lo - tol <= q <= hi + tol, (q, est, lo, hi)


@given(
    st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=10, max_size=500),
    st.integers(1, 5),
)
@settings(max_examples=50, deadline=None)
def test_kll_merge_preserves_count_and_bounds(values, nsplit):
    arr = np.array(values)
    parts = np.array_split(arr, nsplit)
    merged = KLLSketch(k=200)
    for p in parts:
        s = KLLSketch(k=200)
        s.update_many(p)
        merged = merged.merge(s)
    assert merged.n == len(arr)
    # a merged sketch's quantiles stay inside the data range
    for q in (0.0, 0.5, 1.0):
        est = merged.quantile(q)
        assert arr.min() <= est <= arr.max()


@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=20, max_size=300))
@settings(max_examples=30, deadline=None)
def test_kll_serialization_roundtrip_identical(values):
    s = KLLSketch(k=64, seed=7)
    s.update_many(np.array(values))
    rt = KLLSketch.from_bytes(s.to_bytes())
    assert rt.n == s.n and rt.seed == s.seed
    qs = [i / 10 for i in range(11)]
    assert rt.quantiles(qs) == s.quantiles(qs)


# ---------------------------------------------------------------------------
# PSI non-negativity (the smoothed divergence is a sum of terms
# (p-q)ln(p/q), each >= 0) and splitmix64 dispersion
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(0, 10_000), min_size=2, max_size=30),
    st.lists(st.integers(0, 10_000), min_size=2, max_size=30),
)
@settings(max_examples=100, deadline=None)
def test_psi_nonnegative_and_zero_iff_equal(obs, base):
    k = max(len(obs), len(base))
    p = np.array(obs + [0] * (k - len(obs)), dtype=np.float64)
    q = np.array(base + [0] * (k - len(base)), dtype=np.float64)
    alpha = 0.5
    ps = (p + alpha) / (p.sum() + alpha * k)
    qs = (q + alpha) / (q.sum() + alpha * k)
    psi = float(((ps - qs) * np.log(ps / qs)).sum())
    assert psi >= -1e-12
    if np.array_equal(p, q):
        assert abs(psi) < 1e-12


@given(st.sets(st.integers(0, 2**63 - 1), min_size=2, max_size=500))
@settings(max_examples=50, deadline=None)
def test_splitmix64_injective_on_samples(xs):
    arr = np.array(sorted(xs), dtype=np.uint64)
    out = splitmix64(arr)
    assert len(np.unique(out)) == len(arr)  # splitmix64 is a bijection
