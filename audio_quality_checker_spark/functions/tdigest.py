"""Mergeable t-digest quantile sketch (numpy, no external deps).

The north rule names "KLL/t-digest quantile sketches"; sketches.py is
the KLL half, this is the t-digest half (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", arXiv:1902.04023 — the
MERGING variant, §2.2): centroids (mean, weight) kept sorted by mean,
compressed by a single merge pass whose cluster sizes are bounded by the
scale function

    k1(q) = (delta / 2pi) * asin(2q - 1)

so clusters stay tiny near the tails (relative accuracy where it
matters) and grow toward the middle.  Fully deterministic — no
randomness anywhere, so partial/merge trees produce reproducible
results regardless of merge order ONLY up to centroid layout; quantile
ESTIMATES stay within the accuracy bound for any order (the
associativity test asserts the bound, not bit-equality — unlike KLL,
whose compaction is seeded, t-digest merging is order-sensitive by
construction).

Same operational contract as sketches.KLLSketch: update_many / merge /
quantile(s) / to_bytes / from_bytes, so the Spark partial->merge
pipeline in operators/quantiles.py can host either sketch.
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_DELTA = 100.0
_MAGIC = b"TDG1"
_BUFFER_CAP = 4096


class TDigest:
    def __init__(self, delta: float = DEFAULT_DELTA) -> None:
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- scale function and its inverse -------------------------------
    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.asarray(q) - 1)

    def _k_inv(self, k: np.ndarray | float) -> np.ndarray | float:
        return (np.sin(np.asarray(k) * (2 * np.pi) / self.delta) + 1) / 2

    # -- updates ------------------------------------------------------
    def update_many(self, values) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n >= _BUFFER_CAP:
            self._compress()
        return self

    def update(self, value: float) -> "TDigest":
        return self.update_many([value])

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        self._compress()
        other._compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out._compress(force=True)
        return out

    def _compress(self, force: bool = False) -> None:
        if self._buf:
            new = np.concatenate(self._buf)
            self._buf, self._buf_n = [], 0
            self.min = min(self.min, float(new.min()))
            self.max = max(self.max, float(new.max()))
            means = np.concatenate([self.means, new])
            weights = np.concatenate(
                [self.weights, np.ones(new.size, dtype=np.float64)]
            )
            self.n += new.size
        elif force and self.means.size:
            means, weights = self.means, self.weights
        else:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        # single merge pass bounded by the k1 scale function
        out_m: list[float] = []
        out_w: list[float] = []
        emitted = 0.0  # running total: keeps the pass O(k), not O(k^2)
        q_limit = float(self._k_inv(self._k(0.0) + 1.0))
        acc_m, acc_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            if (emitted + acc_w + w) / self.n <= q_limit:
                acc_m = (acc_m * acc_w + m * w) / (acc_w + w)
                acc_w += w
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                emitted += acc_w
                q_limit = float(self._k_inv(self._k(emitted / self.n) + 1.0))
                acc_m, acc_w = m, w
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.float64)

    # -- queries ------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        target = q * self.n
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            # interpolate between the true min and the first centroid
            frac = target / max(cum[0], 1e-12)
            return float(self.min + frac * (self.means[0] - self.min))
        if target >= cum[-1]:
            frac = (self.n - target) / max(self.n - cum[-1], 1e-12)
            return float(self.max - frac * (self.max - self.means[-1]))
        i = int(np.searchsorted(cum, target, side="right"))
        span = cum[i] - cum[i - 1]
        frac = (target - cum[i - 1]) / max(span, 1e-12)
        return float(self.means[i - 1] + frac * (self.means[i] - self.means[i - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        head = _MAGIC + struct.pack(
            "<dddi", self.delta, self.n, 0.0, self.means.size
        ) + struct.pack("<dd", self.min, self.max)
        return (
            head
            + np.ascontiguousarray(self.means).tobytes()
            + np.ascontiguousarray(self.weights).tobytes()
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "TDigest":
        if raw[:4] != _MAGIC:
            raise ValueError(f"not a {_MAGIC.decode()} digest: {raw[:4]!r}")
        delta, n, _, size = struct.unpack_from("<dddi", raw, 4)
        off = 4 + struct.calcsize("<dddi")
        mn, mx = struct.unpack_from("<dd", raw, off)
        off += 16
        td = cls(delta)
        td.n, td.min, td.max = n, mn, mx
        td.means = np.frombuffer(raw, np.float64, size, off).copy()
        td.weights = np.frombuffer(raw, np.float64, size, off + 8 * size).copy()
        return td
