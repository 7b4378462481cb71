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


def test_vectorized_encoder_equals_scan_encoder(spark, corpus):
    """encode_len_vectorized (rank-ordered numpy) must agree with
    encode_len (lowest-rank-first scan) on random byte strings,
    including same-byte runs that exercise overlap resolution."""
    import random

    from audio_quality_checker_spark.functions.bpe import (
        encode_len,
        encode_len_vectorized,
        train_bpe,
    )

    merges = train_bpe(corpus, vocab_size=320)
    ranks = {p: i for i, p in enumerate(merges)}
    rng = random.Random(7)
    cases = [
        bytes(rng.choices(range(256), k=n))
        for n in [0, 1, 2, 7, 33, 120, 500]
    ]
    # stress overlap: long runs of a single byte and ab repeats
    cases += [b"a" * 40, b"ab" * 60, b"aab" * 50,
              "ascii and 中文混合".encode("utf-8") * 20]
    for wb in cases:
        assert encode_len_vectorized(wb, merges) == encode_len(wb, ranks), wb


def test_unsegmented_script_docs_stay_exact_and_fast(spark):
    """A large zh-style unsegmented document is ONE whitespace word —
    the round-4 scan loop was O(len * merges) Python with a guaranteed
    memo miss.  The vectorized route must stay exact (vs the scan
    encoder on a truncated prefix where the scan is affordable) and
    encode a 100 KB document in bounded time."""
    import time

    from audio_quality_checker_spark.functions.bpe import (
        bpe_token_counts,
        encode_len,
        encode_len_vectorized,
        train_bpe,
    )

    rng = __import__("random").Random(3)
    cjk = "".join(
        rng.choice("中文处理测试文档")
        for _ in range(40_000)
    )  # ~120 KB utf-8, zero whitespace
    en = " ".join(f"tok{i % 97}" for i in range(2_000))
    docs = spark.createDataFrame(
        [(0, cjk), (1, en), (2, cjk[:300])],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, vocab_size=320)
    ranks = {p: i for i, p in enumerate(merges)}

    # exactness on an affordable prefix: both encoders agree
    prefix = cjk[:300].encode("utf-8")
    assert encode_len_vectorized(prefix, merges) == encode_len(prefix, ranks)

    t0 = time.time()
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    wall = time.time() - t0
    assert got[2] == encode_len(prefix, ranks)
    assert got[0] > 0 and got[1] > 0
    # driver-side direct encode of the full doc for exactness
    assert got[0] == encode_len_vectorized(cjk.encode("utf-8"), merges)
    # the whole 3-doc job (Spark overhead included) must be seconds,
    # not the minutes the scan loop takes on 120 KB
    assert wall < 30, wall
    t1 = time.time()
    encode_len_vectorized(cjk.encode("utf-8"), merges)
    assert time.time() - t1 < 1.0  # ~10 ms expected
