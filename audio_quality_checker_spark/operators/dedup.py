"""Near-duplicate detection: MinHash+LSH, SimHash, and exact content-hash.

Training-data dedup operators over `documents(doc_id, text, ...)`-shaped
tables.  The reference's nearest ancestor is signature matching — reduce a
payload to a compact signature, compare signatures instead of payloads
(spectral.rs:492-541, mfcc.rs:308-338) — generalized here to the standard
web-scale dedup pipeline (Broder, "On the resemblance and containment of
documents", SEQUENCES 1997; Manku et al., "Detecting near-duplicates for
web crawling", WWW 2007 for SimHash):

  signature build (one scan, numpy inside Arrow batches)
    -> LSH banding (explode to (band, band_hash) keys, one shuffle)
    -> bucket self-join produces candidate pairs (skew-safe: only rows
       sharing a band hash ever meet)
    -> verification (exact similarity on the candidate pairs only)

At 10^12 docs the quadratic all-pairs stage never happens: work is
O(n * bands) + O(candidate pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.functions.hashing import splitmix64

_SEED_BASE = np.uint64(0x9E3779B97F4A7C15)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-word shingles of `text` (uint64, deduplicated)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    # FNV-1a per shingle (short strings; runs inside an Arrow batch)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return np.unique(splitmix64(out))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_hashes: int = 128,
                       shingle_k: int = 5) -> DataFrame:
    """(id, sig array<bigint>): n_hashes-permutation MinHash signature.

    The "permutations" are splitmix64(shingle_hash XOR seed_i) — one
    numpy broadcast min per batch, no per-row Python UDF.
    """
    seeds = splitmix64(
        np.arange(1, n_hashes + 1, dtype=np.uint64) * _SEED_BASE
    )

    def compute(batches):
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", shingle_k)
                if sh.size == 0:
                    sigs.append(np.full(n_hashes, np.iinfo(np.int64).max, dtype=np.int64))
                    continue
                with np.errstate(over="ignore"):
                    m = splitmix64(sh[:, None] ^ seeds[None, :]).min(axis=0)
                sigs.append(m.view(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "sig": [s.tolist() for s in sigs]})

    return df.select(id_col, text_col).mapInPandas(
        compute, schema=f"{id_col} long, sig array<bigint>"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 32) -> DataFrame:
    """Candidate pairs from LSH banding: split the signature into `bands`
    slices, hash each slice, and self-join on (band_idx, band_hash).
    Pairs sharing >= 1 band collide; with 128 hashes / 32 bands (r=4),
    P[collision] = 1-(1-j^4)^32 — ~0.97 at j=0.7, ~0.04 at j=0.2."""
    n_hashes = len(sigs.select("sig").first()["sig"])
    r = n_hashes // bands
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice("sig", i * r + 1, r).cast("array<string>"))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 128,
                      bands: int = 32, threshold: float = 0.7) -> DataFrame:
    """(id_a, id_b, est_jaccard): LSH candidates verified by signature
    agreement (estimated Jaccard = fraction of equal MinHash components)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes)
    sigs.persist()
    cands = lsh_candidate_pairs(sigs, id_col, bands)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = cands.join(sa, "id_a").join(sb, "id_b")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.size("sig_a")
    )
    return joined.select(
        "id_a", "id_b", F.round(est, 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash (Charikar LSH over token frequency vectors)
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, simhash bigint): 64-bit SimHash — sign of the weighted sum of
    token-hash bit vectors.  Near-dup docs differ in few bits."""

    def compute(batches):
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                toks = (text or "").split()
                if not toks:
                    out[i] = 0
                    continue
                hs = np.empty(len(toks), dtype=np.uint64)
                for j, t in enumerate(toks):
                    h = 0xCBF29CE484222325
                    for bch in t.encode("utf-8"):
                        h = ((h ^ bch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                    hs[j] = h
                hs = splitmix64(hs)
                bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sim = np.uint64(0)
                sim = (
                    (votes > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)
                ).sum(dtype=np.uint64)
                out[i] = np.int64(sim.astype(np.uint64).view(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(
        compute, schema=f"{id_col} long, simhash long"
    )


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming): pairs within `max_hamming` bits.

    Blocking: split the 64-bit hash into 4 x 16-bit bands; any pair with
    hamming <= 3 agrees exactly on >= 1 band (pigeonhole), so the bucket
    self-join on (band_idx, band_value) finds all of them — Manku et al.'s
    table construction, WWW 2007.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    sigs.persist()
    banded = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy) — the degenerate case, kept for completeness
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(content_hash, n_dups, doc_ids): groups of byte-identical documents."""
    h = F.md5(F.col(text_col))
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_dups") > 1)
    )
