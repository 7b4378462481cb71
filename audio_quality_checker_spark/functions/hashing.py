"""Deterministic 64-bit hashing primitives (pure numpy / pure python).

Everything downstream that needs randomness-like behavior — synthetic
data generation, Bloom filters, MinHash, SimHash — derives it from
splitmix64 so results are bit-identical across partitionings, Python
versions and platforms (the determinism requirement of FIXTURES.md §6).

splitmix64 is the public-domain PRF from Steele et al., "Fast Splittable
Pseudorandom Number Generators" (OOPSLA 2014), also used as the seeding
PRF inside java.util.SplittableRandom.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        z = z ^ (z >> np.uint64(31))
    return z


def hash64_str(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an iterable of strings -> uint64 array.

    FNV-1a over utf-8 bytes then splitmix64 finalize.  Pure Python inner
    loop is only used where numpy can't vectorize variable-length byte
    strings; callers hash short tokens (hosts, shingles) so this stays
    cheap and is always inside an Arrow batch, never per-row Python UDF.
    """
    out = np.empty(len(values), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    for i, v in enumerate(values):
        h = fnv_offset
        for b in v.encode("utf-8") if isinstance(v, str) else v:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return splitmix64(out)


class SplitMixRNG:
    """Tiny deterministic per-record RNG: counter-based, O(1) state.

    Used by the synthetic pages generator so row N of category C is
    byte-identical no matter which Spark partition generates it.
    """

    __slots__ = ("_state",)

    def __init__(self, *key_parts: int):
        h = 0xCBF29CE484222325
        for p in key_parts:
            for b in int(p).to_bytes(8, "little", signed=False):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        self._state = h

    def next_u64(self) -> int:
        self._state = (self._state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = self._state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    def uniform(self) -> float:
        return self.next_u64() / 2**64

    def randint(self, lo: int, hi: int) -> int:
        """Uniform integer in [lo, hi)."""
        return lo + self.next_u64() % (hi - lo)

    def choice(self, seq):
        return seq[self.randint(0, len(seq))]

    def weighted_choice(self, items, cum_weights):
        u = self.uniform()
        for item, cw in zip(items, cum_weights):
            if u < cw:
                return item
        return items[-1]
