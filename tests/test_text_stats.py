"""Text-analysis kernels: closed-form micro-fixtures (layer-1 style,
dsp.rs:553-586) + fingerprint robustness to small edits."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.functions.text_stats import (
    lang_id_col,
    quality_features,
    quality_score_col,
    token_counts,
    with_fingerprints,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog ran to the park of dreams"),
        (2, "der hund lief durch die stadt und der mann sah die frau"),
        (3, "le chat est sur le toit et la maison est grande"),
        (4, "el perro corre por los campos y el sol brilla"),
        (5, "这是一个中文文档的测试内容需要足够的中文字符来触发检测"),
        (6, "xyzzy plugh qwerty asdf zxcv"),  # no markers -> unknown
        (7, "!!! ??? ;;; ::: @@@ ### $$$ %%%"),  # punctuation storm
        (8, "1234 5678 9012 3456 7890 1234 5678"),  # digit storm
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_lang_id(spark, docs):
    got = {
        r["doc_id"]: r["pred"]
        for r in docs.select("doc_id", lang_id_col().alias("pred")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "zh"
    assert got[6] == "unknown"


def test_quality_features_closed_form(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["ab cd!"]})
    )
    r = quality_features(df).collect()[0]
    assert r["n_chars_q"] == 6
    assert r["n_tokens"] == 2
    assert r["punct_ratio"] == pytest.approx(1 / 6)
    assert r["digit_ratio"] == 0.0


def test_quality_score_penalizes_garbage(spark, docs):
    scored = quality_features(docs).withColumn("q", quality_score_col())
    got = {r["doc_id"]: r["q"] for r in scored.collect()}
    assert got[7] < got[1]  # punctuation storm scores below clean prose
    assert got[8] < got[1]  # digit storm too
    assert 0.0 <= min(got.values()) and max(got.values()) <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["alpha be gammadelta x"]})
    )
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 4
    # ceil(5/4)+ceil(2/4)+ceil(10/4)+ceil(1/4) = 2+1+3+1
    assert r["bpe_est_tokens"] == 7


def test_fingerprints_robust_to_small_edit(spark):
    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base.replace("lazy dog", "sleepy cat", 1)
    other = "completely different content about spark engines " * 20
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [base, edited, other]}
        )
    )
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in with_fingerprints(df).collect()
    }
    sim_near = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    sim_far = len(fps[1] & fps[3]) / len(fps[1] | fps[3])
    assert sim_near > 0.5, f"near-dup fingerprint overlap too low: {sim_near}"
    assert sim_far < 0.05, f"unrelated docs overlap too high: {sim_far}"


def test_fingerprints_deterministic_and_safe(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["tiny", "", None]})
    )
    rows = {r["doc_id"]: r["fingerprints"] for r in with_fingerprints(df).collect()}
    assert rows[2] == [] and rows[3] == []


def test_repetition_features_planted(spark):
    """Gopher-style repetition metrics: hand-checkable planted docs."""
    import pandas as pd

    from audio_quality_checker_spark.functions.text_stats import (
        repetition_features,
    )

    rows = [
        # 4 lines, 2 distinct -> dup_line_frac 0.5; bigrams span lines
        # (whitespace split): 11 bigrams, 'a b' x4 -> top 4/11
        (0, "a b a b\nc d\na b a b\nc d"),
        # all-distinct lines and bigrams -> 0 and 1/2
        (1, "w x\ny z"),
        # single token: no bigrams -> NULL top_bigram_frac
        (2, "solo"),
        # empty -> both NULL
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["top_bigram_frac"])
        for r in repetition_features(df).collect()
    }
    assert got[0] == (0.5, round(4 / 11, 6))
    assert got[1][0] == 0.0 and abs(got[1][1] - 1 / 3) < 1e-6
    assert got[2] == (0.0, None)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
