"""Text-analysis kernels for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Design rule (north rule / SURVEY.md §2.9): everything that CAN be a
Catalyst expression IS one (JVM-side, codegen'd, oracle-able in SQL);
only the rolling-hash fingerprint, which needs per-character state, runs
as a numpy kernel inside an Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# language ID — n-gram/stopword-hit heuristic (expression-only)
# ---------------------------------------------------------------------------

# marker tokens per language, ordered; zh detection is charset-based
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " die ", " und "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
}
_CJK_RANGE = r"[一-鿿]"


def _count_occurrences(padded: F.Column, token: str) -> F.Column:
    return (
        F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit("")))
    ) / F.length(F.lit(token))


def lang_id_col(text_col: str = "text") -> F.Column:
    """Predicted language as a pure expression: argmax of marker-token
    hit counts, CJK-charset override for zh, 'unknown' when nothing hits.
    The filename->genre dispatch ladder re-imagined
    (regression_genre_test.rs:257-289)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(padded, t) for t in toks), F.lit(0.0)
        )
        for lang, toks in _LANG_MARKERS.items()
    }
    cjk_hits = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    best = F.lit("unknown")
    best_score = F.lit(0.0)
    for lang in sorted(_LANG_MARKERS):
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    return F.when(cjk_hits * 4 > F.length(text_col), F.lit("zh")).otherwise(best)


# ---------------------------------------------------------------------------
# quality scoring — length / punctuation / stopword / repetition ratios
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they"
).split()


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-doc quality feature columns, all JVM expressions:
    n_chars_q, n_tokens, punct_ratio, digit_ratio, stopword_ratio,
    mean_token_len, upper_ratio."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.size(toks)
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(
        (_count_occurrences(padded, f" {w} ") for w in _STOPWORDS), F.lit(0.0)
    )
    return (
        df.withColumn("n_chars_q", F.length(t))
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")) / F.length(t),
        )
        .withColumn(
            "digit_ratio", F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.length(t)
        )
        .withColumn(
            "upper_ratio", F.length(F.regexp_replace(t, r"[^A-Z]", "")) / F.length(t)
        )
        .withColumn("stopword_ratio", stop_hits / n_tokens)
        .withColumn(
            "mean_token_len",
            (F.length(t) - n_tokens + 1) / n_tokens,
        )
    )


def quality_score_col() -> F.Column:
    """Composite [0,1] quality score over the quality_features columns —
    a when-ladder of graded penalties (the multiplicative-penalty shape,
    detector.rs:744-772, as one expression)."""
    pen_short = F.when(F.col("n_tokens") < 20, 0.5).when(
        F.col("n_tokens") < 50, 0.2
    ).otherwise(0.0)
    pen_punct = F.when(F.col("punct_ratio") > 0.3, 0.5).when(
        F.col("punct_ratio") > 0.15, 0.2
    ).otherwise(0.0)
    pen_digit = F.when(F.col("digit_ratio") > 0.3, 0.4).otherwise(0.0)
    pen_stop = F.when(F.col("stopword_ratio") < 0.01, 0.2).otherwise(0.0)
    return F.round(
        (1 - pen_short) * (1 - pen_punct) * (1 - pen_digit) * (1 - pen_stop), 6
    )


# ---------------------------------------------------------------------------
# token counting — whitespace + BPE-ish subword estimate (expressions)
# ---------------------------------------------------------------------------

def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ws_tokens: whitespace split; bpe_est_tokens: a deterministic
    regex-piece count (words split into ~4-char subpieces + digits +
    punctuation singletons) approximating BPE token counts without a
    vocabulary — the budget estimator a data pipeline needs per shard."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    # every word contributes ceil(len/4); punctuation and digits 1 each
    pieces = F.aggregate(
        F.transform(
            F.split(F.trim(t), r"\s+"), lambda w: F.ceil(F.length(w) / 4)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_est_tokens", pieces)


def repetition_features(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """df + Gopher-style repetition metrics (Rae et al., "Scaling
    Language Models: ... Gopher", 2021 §A1.1 — the standard LLM-corpus
    repetition filters):

      dup_line_frac:   1 - distinct/total over non-empty lines
                       (NULL when a doc has no lines)
      top_bigram_frac: occurrences of the most frequent word bigram /
                       total bigrams (NULL when < 2 tokens)

    dup_line_frac is pure array math in-row; top_bigram_frac explodes
    (doc, bigram) and counts — a partial-aggregated groupBy keyed on
    (doc, bigram), the token-counting shuffle shape, never a per-doc
    Python loop."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )
    dup_line_frac = F.when(
        F.size(lines) > 0,
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6
        ),
    )
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    # materialize the token array in its own projection FIRST: inlining
    # the split expression into per-element accesses makes Catalyst
    # recompute the full split per bigram — O(tokens^2) per doc,
    # measured 9.4s -> 1.4s at sf0.1 for this exact query.  slice +
    # zip_with over the materialized array is O(tokens).
    staged = df.select(
        F.col(id_col).alias("_rid"),
        dup_line_frac.alias("dup_line_frac"),
        toks.alias("_toks"),
    )
    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_toks", 1, n - 1),
            F.slice("_toks", 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    )
    base = staged.select("_rid", "dup_line_frac", bigrams.alias("_bigrams"))
    # top-bigram count WITHOUT the (doc, bigram) explode+groupBy: sort
    # the bigram array in-row, then the most frequent bigram's count is
    # the longest run of equal adjacent elements — one aggregate() scan
    # over adjacency flags, zero shuffle (the explode shape moved one
    # row per bigram OCCURRENCE through an Exchange; this moves none
    # and was the suite's worst sf1 grower).  Same staging discipline:
    # the sorted array gets its OWN projection before the pairwise
    # slice+zip_with, or Catalyst re-sorts per element.
    sorted_bg = base.select(
        "_rid", "dup_line_frac", F.sort_array("_bigrams").alias("_sbg")
    )
    nb = F.size("_sbg")
    eqs = F.when(
        nb >= 2,
        F.zip_with(
            F.slice("_sbg", 1, nb - 1),
            F.slice("_sbg", 2, nb - 1),
            lambda x, y: (x == y).cast("int"),
        ),
    )
    run_best = F.aggregate(
        F.coalesce(eqs, F.array()),
        F.struct(F.lit(1).alias("run"), F.lit(1).alias("best")),
        lambda acc, x: F.struct(
            F.when(x == 1, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == 1, acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    feats = sorted_bg.select(
        "_rid",
        "dup_line_frac",
        F.when(
            nb >= 1, F.round(run_best / nb, 6)
        ).alias("top_bigram_frac"),
    )
    return df.join(
        feats.withColumnRenamed("_rid", id_col), id_col, "left"
    )


# ---------------------------------------------------------------------------
# fingerprinting — winnowed rolling hash (numpy kernel in Arrow batches)
# ---------------------------------------------------------------------------

def fingerprint_udf(k: int = 9, window: int = 8):
    """Returns a pandas UDF: text -> array<bigint> winnowing fingerprint
    (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003): rolling k-gram hashes, min per window,
    deduplicated.  Robust to small edits — two docs sharing most
    fingerprints are near-identical even when shingling order shifts."""

    @F.pandas_udf("array<bigint>")
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        B, M = np.uint64(257), np.uint64(0xFFFFFFFFFFFFFFFF)
        for t in texts:
            b = (t or "").encode("utf-8")
            if len(b) < k:
                out.append([])
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
            # polynomial rolling hash of every k-gram, vectorized:
            # h[i] = sum_{j<k} arr[i+j] * B^(k-1-j)
            with np.errstate(over="ignore"):
                h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
                for j in range(k):
                    h = (h * B + arr[j : len(arr) - k + 1 + j]) & M
            n = len(h)
            if n <= window:
                mins = np.array([h.min()], dtype=np.uint64)
            else:
                idx = np.arange(n - window + 1)[:, None] + np.arange(window)[None, :]
                mins = h[idx].min(axis=1)
            out.append(np.unique(mins).view(np.int64).tolist())
        return pd.Series(out)

    return fp


def with_fingerprints(df: DataFrame, text_col: str = "text",
                      out_col: str = "fingerprints") -> DataFrame:
    return df.withColumn(out_col, fingerprint_udf()(F.col(text_col)))
