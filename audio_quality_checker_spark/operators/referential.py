"""Referential-integrity check via a broadcast Bloom filter.

Heir of the encoder-signature lookup (spectral.rs:492-541): score rows
against a small trusted dimension.  At 10^12 rows a join against even a
10M-host dimension per row is wasteful; a Bloom filter built once from the
dimension and broadcast to every task turns membership into a vectorized
in-memory probe with zero shuffle on the fact side.

Spark's `bloom_filter_agg` SQL surface is not exposed in this build
(probed: UNRESOLVED_ROUTINE), so the filter is a numpy bit array:
 - build: mapInPandas over the dimension -> one byte-array per input
   partition -> bitwise-OR merge (Bloom filters are trivially mergeable,
   the same partial/final shape as every sketch in PAPERS.md)
 - probe: pandas UDF, double hashing (Kirsch–Mitzenmacher, "Less Hashing,
   Same Performance", ESA 2006) over splitmix64 — fully vectorized numpy.

The exact oracle at test scale is `left_anti` join (SURVEY.md §2.3).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.functions.hashing import hash64_str, splitmix64
from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)

_H2_SALT = np.uint64(0xA24BAED4963EE407)


def _positions(h1: np.ndarray, n_hashes: int, m_bits: int) -> np.ndarray:
    """(n, k) probe positions via double hashing; h2 forced odd."""
    h2 = splitmix64(h1 ^ _H2_SALT) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return pos


class BloomFilter:
    """Fixed-size mergeable Bloom filter over strings."""

    def __init__(self, m_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.bits = (
            bits if bits is not None else np.zeros(math.ceil(m_bits / 8), dtype=np.uint8)
        )

    @classmethod
    def sized_for(cls, n_keys: int, fpp: float = 0.01) -> "BloomFilter":
        m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / max(1, n_keys) * math.log(2)))
        return cls(m, k)

    def add_many(self, values) -> None:
        if len(values) == 0:
            return
        pos = _positions(hash64_str(values), self.n_hashes, self.m_bits).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains_many(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(hash64_str(values), self.n_hashes, self.m_bits)
        byte = self.bits[(pos >> 3).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.n_hashes) == (other.m_bits, other.n_hashes)
        return BloomFilter(self.m_bits, self.n_hashes, self.bits | other.bits)


DRIVER_BUILD_MAX_KEYS = 2_000_000
# The finished filter must fit comfortably in driver memory AND ride the
# probe closure to every executor.  1 GiB of bits indexes ~860M keys at
# 1% fpp — beyond that a Bloom probe is the wrong tool (the filter
# no longer "broadcasts small"): use the exact left_anti join
# (unknown_hosts_exact), which shuffles but never funnels.
DRIVER_BLOOM_MAX_BYTES = 1 << 30


def build_bloom(dim: DataFrame, key_col: str, fpp: float = 0.01) -> BloomFilter:
    """Mergeable Bloom build.

    Small dimensions (<= 2M keys — anything you would broadcast-join)
    collect to the driver and build in one numpy pass: the distributed
    build costs two Spark jobs plus a Python-worker cold start, ~15s of
    fixed latency to index 200 hosts.  Large dimensions build one partial
    Bloom per input partition via mapInPandas and OR-merge via
    treeReduce — partials are m/8 bytes regardless of key count and the
    merge happens on executors pairwise, so the driver receives ONE
    filter, not one per partition (round-5 verdict: the collect-all-
    partials shape was O(partitions * m/8) driver memory).

    Refuses loudly when the finished filter would exceed
    DRIVER_BLOOM_MAX_BYTES: past that point the filter is no longer a
    broadcast-small object and the exact left_anti path is the right
    plan (the bounds_simhash refusal precedent; reference analog:
    bit_depth.rs:122,200 sampling caps bound cost before paying it).
    """
    n_keys = dim.count()
    proto = BloomFilter.sized_for(max(n_keys, 1), fpp)
    m_bits, n_hashes = proto.m_bits, proto.n_hashes
    if m_bits // 8 > DRIVER_BLOOM_MAX_BYTES:
        raise ValueError(
            f"bloom for {n_keys} keys at fpp={fpp} needs "
            f"{m_bits // 8 / 2**30:.1f} GiB — beyond the "
            f"{DRIVER_BLOOM_MAX_BYTES / 2**30:.0f} GiB broadcastable "
            "bound. Raise fpp or use the exact left_anti path "
            "(unknown_hosts_exact) for dimensions this large."
        )

    if n_keys <= DRIVER_BUILD_MAX_KEYS:
        out = BloomFilter(m_bits, n_hashes)
        vals = [r[0] for r in dim.select(key_col).where(
            F.col(key_col).isNotNull()).collect()]
        out.add_many(vals)
        return out

    def build(batches):
        bf = BloomFilter(m_bits, n_hashes)
        for pdf in batches:
            vals = pdf[key_col].dropna().tolist()
            bf.add_many(vals)
        yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    merged = (
        dim.select(key_col).mapInPandas(build, schema="bits binary")
        .rdd.map(lambda r: np.frombuffer(r["bits"], dtype=np.uint8))
        .treeReduce(lambda a, b: a | b, depth=2)
    )
    return BloomFilter(m_bits, n_hashes, merged.copy())


def with_membership(df: DataFrame, bloom: BloomFilter, col: str,
                    out_col: str = "host_known") -> DataFrame:
    """Vectorized probe column; the Bloom bytes ride the closure once per
    executor (Spark broadcasts task binaries), never per row."""
    m_bits, n_hashes, raw = bloom.m_bits, bloom.n_hashes, bloom.bits.tobytes()

    @F.pandas_udf("boolean")
    def probe(s: pd.Series) -> pd.Series:
        bf = BloomFilter(m_bits, n_hashes, np.frombuffer(raw, dtype=np.uint8))
        # hosts repeat heavily (few distinct per crawl slice): hash the
        # distinct values once, then broadcast the verdicts back —
        # O(distinct) string hashing instead of O(rows)
        uniq = s.dropna().unique()
        verdict = dict(zip(uniq, bf.contains_many(list(uniq)))) if len(uniq) else {}
        return s.map(lambda v: bool(verdict.get(v, False)))

    return df.withColumn(out_col, probe(F.col(col)))


def referential_violations(
    features: DataFrame, ref_hosts: DataFrame, suite: CheckSuite,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """Unknown-host rate per partition via the Bloom probe.

    A Bloom filter has false positives but NO false negatives, so every
    reported miss is a true unknown host — the check errs toward false
    negatives, matching the reference's bias (detector.rs:421).
    """
    bloom = bloom or build_bloom(ref_hosts, "host")
    probed = with_membership(features, bloom, "host")
    agg = probed.groupBy("p_day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("host").isNotNull() & ~F.col("host_known"), 1).otherwise(0)
        ).alias("n_unknown"),
    )
    rate = F.col("n_unknown") / F.col("n_rows").cast("double")
    return agg.select(
        *violation_row(
            F.col("p_day"),
            "ReferentialViolation",
            "url",
            graded_confidence(rate, suite.max_unknown_host_rate),
            F.format_string(
                "unknown-host rate %.4f exceeds %.4f (%d of %d rows)",
                rate,
                F.lit(suite.max_unknown_host_rate),
                F.col("n_unknown"),
                F.col("n_rows"),
            ),
            {"unknown_rate": rate, "n_unknown": F.col("n_unknown")},
        )
    ).where(F.col("confidence") > 0)


def unknown_hosts_exact(features: DataFrame, ref_hosts: DataFrame) -> DataFrame:
    """Exact oracle: left_anti of observed hosts against the dimension
    (SURVEY.md §2.7) — used by tests to bound the Bloom check."""
    return (
        features.select("p_day", "host")
        .where(F.col("host").isNotNull())
        .join(F.broadcast(ref_hosts.select("host")), "host", "left_anti")
        .groupBy("p_day")
        .agg(F.count(F.lit(1)).alias("n_unknown"))
    )
