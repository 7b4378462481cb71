"""The composed corpus-prep job: every stage's effect visible in the
counters, planted rows land on the right side of each gate, and the
output corpus carries the attached per-doc columns."""

import json

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def prep_result(spark, tmp_path_factory):
    from jobs.corpus_prep import main

    rng = __import__("random").Random(11)

    def prose(i, n=80):
        return " ".join(
            rng.choice(["the", "a", "of", "and", "is", "on", "for", "with"])
            if j % 3 == 0 else f"d{i}w{j}"
            for j in range(n)
        )

    rows = []
    # 40 clean unique docs
    for i in range(40):
        rows.append((i, "en", prose(i)))
    # 3 exact copies of doc 0
    for i in range(100, 103):
        rows.append((i, "en", rows[0][2]))
    # 2 near-dups of doc 1 (tail tokens swapped)
    t1 = rows[1][2].split()
    for k, i in enumerate((200, 201)):
        t = list(t1)
        t[-4:] = [f"swap{k}{j}" for j in range(4)]
        rows.append((i, "en", " ".join(t)))
    # 1 repetitive doc (dup-line fraction ~0.9)
    rows.append((300, "en", ("same line here\n" * 12).strip()))
    # 1 junk doc (all punctuation -> quality gate)
    rows.append((301, "en", "!!! ??? ;;; ::: %%% $$$ ### @@@ &&& *** " * 6))
    # 2 unusable docs (null / whitespace text)
    rows.append((400, "en", None))
    rows.append((401, "en", "   "))

    root = str(tmp_path_factory.mktemp("prep"))
    docs = f"{root}/documents.parquet"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    ).write.mode("overwrite").parquet(docs)

    out = f"{root}/out"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--docs", docs, "--out", out, "--block-cap", "50",
                   "--threshold", "0.5"])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    return report, out


def test_stage_counters(spark, prep_result):
    report, _ = prep_result
    assert report["n_input"] == 49
    assert report["n_usable"] == 47            # null + whitespace dropped
    assert report["n_after_exact_dedup"] == 44  # 3 exact copies of doc 0
    assert report["n_after_near_dedup"] == 42   # 200/201 fold into doc 1
    assert report["n_after_filters"] == 40      # repetitive + junk dropped
    assert report["total_bpe_tokens"] > 0
    assert report["n_bpe_merges"] > 0


def test_output_corpus(spark, prep_result):
    report, out = prep_result
    corpus = spark.read.parquet(f"{out}/corpus")
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert len(ids) == report["n_after_filters"]
    # representatives kept, duplicates and planted bad docs gone
    assert 0 in ids and 1 in ids
    assert ids.isdisjoint({100, 101, 102, 200, 201, 300, 301, 400, 401})
    cols = set(corpus.columns)
    assert {"quality", "dup_line_frac", "top_bigram_frac",
            "lang_id"} <= cols
    budget = spark.read.parquet(f"{out}/budget").collect()
    assert sum(r["n_docs"] for r in budget) == report["n_after_filters"]
    assert sum(r["total_bpe_tokens"] for r in budget) == report[
        "total_bpe_tokens"
    ]
