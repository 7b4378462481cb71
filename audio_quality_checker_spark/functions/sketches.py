"""Mergeable quantile sketch (KLL-style compactor hierarchy) in numpy.

The north rule names KLL/t-digest quantile sketches as the scale path for
per-column quantiles (the reference computes medians by fully sorting its
estimate vectors, dsp.rs:222-235 — fine for 30 frames, impossible for
10^12 rows).  `percentile_approx` (an internal Greenwald-Khanna-style
sketch) is Spark's built-in; this module provides an explicitly
*mergeable, serializable* sketch that the engine controls: built
per-partition inside `applyInPandas`, merged associatively in a final
narrow stage (the partial/final shape of PAPERS.md's sketch literature:
Karnin-Lang-Liberty, FOCS 2016; "KLL±" VLDB 2021).

Simplified KLL: a ladder of levels, level h holding items of weight 2^h.
A full level is sorted and compacted — every other item (random offset)
promoted to level h+1.  Deterministic: the offset bit derives from
splitmix64 of (seed, level, compaction counter), so the same input in the
same partition order yields the same sketch, and tests can assert
rank-error bounds exactly (FIXTURES.md determinism discipline).

Rank error: ~O(1/k) with k=200 giving ≈1% rank error at 99% confidence —
asserted against exact quantiles in tests.
"""

from __future__ import annotations

import struct

import numpy as np

from audio_quality_checker_spark.functions.hashing import SplitMixRNG

DEFAULT_K = 200
# Wire-format history: the ORIGINAL KLL1 header was <iqii (no seed); the
# seed was later added (<iqiiq) WITHOUT bumping the magic, then the magic
# was bumped to KLL2 with the layout unchanged.  So KLL2 is always
# <iqiiq, while a KLL1 blob is ambiguous by magic alone — from_bytes
# accepts both magics and disambiguates KLL1 by total-length consistency
# (header + size table + level payloads must tile the blob exactly;
# depth is tiny, so a false match is structurally implausible).
_MAGIC = b"KLL2"
_MAGIC_V1 = b"KLL1"


class KLLSketch:
    def __init__(self, k: int = DEFAULT_K, seed: int = 42):
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    # -- capacity of level h: k * (2/3)^(depth-1-h), floored at 8
    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        c = int(self.k * (2.0 / 3.0) ** (depth - 1 - h))
        return max(8, c)

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += v.size
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size > self._cap(h):
                arr = np.sort(self.levels[h])
                rng = SplitMixRNG(self.seed, h, self._compactions)
                self._compactions += 1
                offset = rng.randint(0, 2)
                promoted = arr[offset::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted]
                )
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(self.k, self.seed)
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.empty(0)
            b = other.levels[h] if h < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._compress()
        return out

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, 2**h, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        it, w = self._items_weights()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- serialization: fixed header + level sizes + concatenated floats --
    # the seed is part of the header: compaction offsets derive from it, so
    # a round-tripped sketch must keep compacting identically for the
    # determinism guarantee to hold with non-default seeds
    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<iqiiq", self.k, self.n, self._compactions, len(self.levels),
            self.seed,
        )
        sizes = struct.pack(f"<{len(self.levels)}i", *[a.size for a in self.levels])
        body = b"".join(np.ascontiguousarray(a).tobytes() for a in self.levels)
        return head + sizes + body

    @staticmethod
    def _layout_fits(raw: bytes, fmt: str, depth_idx: int) -> bool:
        """True when header fmt + its depth's size table + float64 level
        payloads tile `raw` exactly — the length-consistency check that
        disambiguates the two KLL1 layouts."""
        head_len = 4 + struct.calcsize(fmt)
        if len(raw) < head_len:
            return False
        fields = struct.unpack_from(fmt, raw, 4)
        depth = fields[depth_idx]
        if not (1 <= depth <= 64):
            return False
        if len(raw) < head_len + 4 * depth:
            return False
        sizes = struct.unpack_from(f"<{depth}i", raw, head_len)
        if any(s < 0 for s in sizes):
            return False
        return len(raw) == head_len + 4 * depth + 8 * sum(sizes)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KLLSketch":
        if raw[:4] not in (_MAGIC, _MAGIC_V1):
            raise ValueError(
                f"not a KLL sketch (got {raw[:4]!r})"
            )
        if raw[:4] == _MAGIC_V1 and not cls._layout_fits(raw, "<iqiiq", 3):
            # original KLL1: <iqii, no seed — read with the default seed
            if not cls._layout_fits(raw, "<iqii", 3):
                raise ValueError("KLL1 blob matches neither known layout")
            k, n, comps, depth = struct.unpack_from("<iqii", raw, 4)
            off = 4 + struct.calcsize("<iqii")
            sizes = struct.unpack_from(f"<{depth}i", raw, off)
            off += 4 * depth
            sk = cls(k)
            sk.n, sk._compactions = n, comps
            sk.levels = []
            for s in sizes:
                sk.levels.append(
                    np.frombuffer(raw, dtype=np.float64, count=s,
                                  offset=off).copy()
                )
                off += 8 * s
            return sk
        k, n, comps, depth, seed = struct.unpack_from("<iqiiq", raw, 4)
        off = 4 + struct.calcsize("<iqiiq")
        sizes = struct.unpack_from(f"<{depth}i", raw, off)
        off += 4 * depth
        sk = cls(k, seed=seed)
        sk.n, sk._compactions = n, comps
        sk.levels = []
        for s in sizes:
            sk.levels.append(
                np.frombuffer(raw, dtype=np.float64, count=s, offset=off).copy()
            )
            off += 8 * s
        return sk
