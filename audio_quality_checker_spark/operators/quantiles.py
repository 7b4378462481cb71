"""Per-partition quantiles via mergeable sketches (KLL or t-digest).

The partial/final sketch shape (SURVEY.md §4 #3): sketches are built
per *Spark task* inside `mapInPandas` (one scan, no shuffle of raw rows),
then the tiny sketch rows shuffle to one reducer per partition key via
`applyInPandas` merge — the whole 10^12-row quantile computation moves
only O(partitions * k) floats after the scan.  `percentile_approx` is the
built-in fallback already used in stats.py; this operator exists where
the engine needs *mergeable, persistable* quantile state (baseline
snapshots for drift; resumable incremental stats).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.functions.sketches import DEFAULT_K, KLLSketch


def _kll_factory(k: int = DEFAULT_K):
    return lambda: KLLSketch(k)


def build_sketches(features: DataFrame, value_col: str = "text_len",
                   key_col: str = "p_day", k: int = DEFAULT_K,
                   sketch_factory=None, decoder=None) -> DataFrame:
    """(key, sketch binary): one mergeable sketch per partition key.

    Stage 1 (mapInPandas): one sketch per (task, key) — narrow, no shuffle.
    Stage 2 (applyInPandas): merge the per-task sketches per key — the
    shuffle moves sketches, never rows.

    Defaults to KLL; pass ``sketch_factory``/``decoder`` for any sketch
    with the same update_many/merge/to_bytes contract (e.g.
    functions.tdigest.TDigest for tail-accurate quantiles).
    """
    make = sketch_factory or _kll_factory(k)
    decode = decoder or KLLSketch.from_bytes

    def partial(batches):
        sketches: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(key_col, dropna=False):
                sk = sketches.setdefault(str(key), make())
                sk.update_many(grp[value_col].dropna().to_numpy("float64"))
        if sketches:
            yield pd.DataFrame(
                {
                    key_col: list(sketches),
                    "sketch": [s.to_bytes() for s in sketches.values()],
                }
            )

    partials = features.select(key_col, value_col).mapInPandas(
        partial, schema=f"{key_col} string, sketch binary"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = make()
        for raw in pdf["sketch"]:
            out = out.merge(decode(bytes(raw)))
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "sketch": [out.to_bytes()]}
        )

    return partials.groupBy(key_col).applyInPandas(
        merge, schema=f"{key_col} string, sketch binary"
    )


def sketch_quantiles(sketches: DataFrame, qs: list[float],
                     key_col: str = "p_day", decoder=None) -> DataFrame:
    """(key, q_50, q_95, ...) extracted from stored sketches."""
    cols = [f"q_{int(q * 100):02d}" for q in qs]
    decode = decoder or KLLSketch.from_bytes

    def extract(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            sk = decode(bytes(r["sketch"]))
            rows.append([r[key_col], float(sk.n)] + sk.quantiles(qs))
        return pd.DataFrame(rows, columns=[key_col, "n"] + cols)

    schema = f"{key_col} string, n double, " + ", ".join(
        f"{c} double" for c in cols
    )
    return sketches.groupBy(key_col).applyInPandas(extract, schema=schema)


def global_quantiles(sketches: DataFrame, qs: list[float],
                     sketch_factory=None, decoder=None) -> dict[str, float]:
    """Merge all partition sketches driver-side (they are tiny) into the
    corpus-level quantiles — the final 'merge of merges'."""
    make = sketch_factory or (lambda: KLLSketch())
    decode = decoder or KLLSketch.from_bytes
    out = make()
    for r in sketches.select("sketch").collect():
        out = out.merge(decode(bytes(r["sketch"])))
    return {f"q_{int(q * 100):02d}": out.quantile(q) for q in qs} | {
        "n": float(out.n)
    }
