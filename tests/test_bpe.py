"""BPE tokenizer-token budgets: training determinism, known-merge
behavior on a hand-checkable corpus, and Spark-vs-reference-encoder
equality (the functions/bpe.py gate)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.functions.bpe import (
    bpe_token_counts,
    encode_len,
    train_bpe,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the the the quick quick brown fox"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "thequickbrownfox " * 5),
        (3, None),
        (4, ""),
        (5, "unicode élève 中文 tokens the the"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_train_is_deterministic_and_merges_frequent_pairs(spark, corpus):
    m1 = train_bpe(corpus, vocab_size=280)
    m2 = train_bpe(corpus, vocab_size=280)
    assert m1 == m2 and len(m1) > 0
    # 'th'/'he' are the most frequent byte pairs in this corpus: the
    # first merge must be one of them, and 'the' must compress to fewer
    # tokens than its byte length
    assert m1[0] in {(ord("t"), ord("h")), (ord("h"), ord("e"))}
    ranks = {p: i for i, p in enumerate(m1)}
    assert encode_len(b"the", ranks) < 3
    # a word with no trained pairs stays at byte granularity
    assert encode_len(b"zzqx", ranks) == 4


def test_spark_counts_equal_reference_encoder(spark, corpus):
    merges = train_bpe(corpus, vocab_size=280)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(corpus, merges).collect()
    }
    for r in corpus.collect():
        t = r["text"]
        expected = sum(
            encode_len(w.encode("utf-8"), ranks) for w in (t or "").split()
        )
        assert got[r["doc_id"]] == expected, r["doc_id"]
    assert got[3] == 0 and got[4] == 0  # null and empty text


def test_compression_monotone_in_vocab(spark, corpus):
    """More merges can never increase any document's token count."""
    small = train_bpe(corpus, vocab_size=260)
    big = train_bpe(corpus, vocab_size=300)
    n_small = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(corpus, small).collect()
    }
    n_big = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(corpus, big).collect()
    }
    assert all(n_big[d] <= n_small[d] for d in n_small)


def test_tiktoken_path_when_available(spark, corpus):
    pytest.importorskip("tiktoken")
    from audio_quality_checker_spark.functions.bpe import tiktoken_counts

    out = tiktoken_counts(corpus).collect()
    assert all(r["bpe_tokens"] >= 0 for r in out)
