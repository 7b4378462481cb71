"""The composed corpus-prep job: every stage's effect visible in the
counters, planted rows land on the right side of each gate, and the
output corpus carries the attached per-doc columns."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F


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
    assert report["n_after_url_dedup"] == 49   # no url column: counted no-op
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


def test_decontamination_and_budget_stages(spark, tmp_path):
    """Stage 5/7: a planted eval-overlap doc is quarantined (and ONLY
    it), and --token-budget keeps the per-lang deterministic prefix —
    budget reached, overshoot < one doc, bpe_tokens attached."""
    import contextlib
    import io

    from jobs.corpus_prep import main

    rng = __import__("random").Random(13)

    def prose(i):
        return " ".join(f"c{i}w{j}{rng.randrange(9)}" for j in range(60))

    rows = [(i, "en" if i % 2 else "de", prose(i)) for i in range(30)]
    # doc 50 embeds a verbatim 8-token run from eval doc 0's text
    span = " ".join(rows[0][2].split()[10:18])
    rows.append((50, "en", f"{prose(50)} {span} trailing words here"))

    root = str(tmp_path)
    docs = f"{root}/documents.parquet"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    ).write.mode("overwrite").parquet(docs)
    # eval set = doc 0's text (so doc 0 self-hits and doc 50 hits)
    ev = f"{root}/eval.parquet"
    spark.createDataFrame(
        pd.DataFrame([rows[0]], columns=["doc_id", "lang", "text"])
    ).write.mode("overwrite").parquet(ev)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--docs", docs, "--out", f"{root}/out",
                   "--min-quality", "0.0", "--eval-set", ev,
                   "--token-budget", "400"])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_after_filters"] == 31
    # exactly doc 0 (self-hit) and doc 50 (planted span) quarantined
    assert report["n_after_decontamination"] == 29
    assert report["n_after_budget"] < 29
    corpus = spark.read.parquet(f"{root}/out/corpus")
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert ids.isdisjoint({0, 50})
    assert "bpe_tokens" in corpus.columns
    # budget semantics per lang: reached, overshoot < one doc
    per = corpus.groupBy("lang").agg(
        F.sum("bpe_tokens").alias("tot"),
        F.max("bpe_tokens").alias("mx"),
    ).collect()
    assert len(per) == 2
    for r in per:
        assert r["tot"] >= 400
        assert r["tot"] - r["mx"] < 400
    # total_bpe_tokens reflects the BUDGETED corpus
    assert report["total_bpe_tokens"] == sum(r["tot"] for r in per)


def test_line_dedup_stage(spark, tmp_path):
    """Stage 1b (--line-dedup-df): a nav line shared by every doc is
    stripped (counter counts instances), unique bodies survive, a doc
    that was ONLY boilerplate drops out at the re-usability gate, and
    without the flag the counters are passthrough."""
    import contextlib
    import io

    from jobs.corpus_prep import main

    rng = __import__("random").Random(23)

    def prose(i):
        return " ".join(f"b{i}w{j}{rng.randrange(9)}" for j in range(60))

    nav = "home | products | contact"
    rows = [(i, "en" if i % 2 else "de", f"{nav}\n{prose(i)}")
            for i in range(20)]
    rows.append((90, "en", nav))          # boiler-only page
    root = str(tmp_path)
    docs = f"{root}/documents.parquet"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    ).write.mode("overwrite").parquet(docs)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--docs", docs, "--out", f"{root}/out",
                   "--min-quality", "0.0", "--line-dedup-df", "3"])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_usable"] == 21
    assert report["n_after_line_dedup"] == 20      # boiler-only doc out
    assert report["n_boiler_lines_removed"] == 21  # one instance per doc
    corpus = spark.read.parquet(f"{root}/out/corpus")
    assert corpus.where(F.col("text").contains(nav)).count() == 0
    assert corpus.where(F.col("doc_id") == 90).count() == 0

    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = main(["--docs", docs, "--out", f"{root}/out2",
                   "--min-quality", "0.0"])
    assert rc == 0
    report2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert report2["n_after_line_dedup"] == 21
    assert report2["n_boiler_lines_removed"] == 0


def test_pii_scrub_stage(spark, tmp_path):
    """Stage 6 (--scrub-pii): planted email/phone docs are masked in
    the output corpus (sentinels present, raw PII gone), the counter
    records exactly the docs that carried PII, and without the flag
    the text ships untouched."""
    import contextlib
    import io

    from jobs.corpus_prep import main

    rng = __import__("random").Random(17)

    def prose(i):
        return " ".join(f"p{i}w{j}{rng.randrange(9)}" for j in range(60))

    rows = [(i, "en" if i % 2 else "de", prose(i)) for i in range(20)]
    rows.append((70, "en", prose(70) + " reach me at bob@example.org ok"))
    rows.append((71, "de", prose(71) + " call +1 555-867-5309 now"))

    root = str(tmp_path)
    docs = f"{root}/documents.parquet"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    ).write.mode("overwrite").parquet(docs)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--docs", docs, "--out", f"{root}/out",
                   "--min-quality", "0.0", "--scrub-pii"])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_docs_pii_masked"] == 2
    corpus = spark.read.parquet(f"{root}/out/corpus")
    pii_rows = {r["doc_id"]: r["text"]
                for r in corpus.where(F.col("doc_id") >= 70).collect()}
    assert "<EMAIL>" in pii_rows[70] and "bob@example.org" not in pii_rows[70]
    assert "<PHONE>" in pii_rows[71] and "555-867-5309" not in pii_rows[71]

    # without the flag: counter 0, raw PII ships
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = main(["--docs", docs, "--out", f"{root}/out2",
                   "--min-quality", "0.0"])
    assert rc == 0
    report2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert report2["n_docs_pii_masked"] == 0
    raw = spark.read.parquet(f"{root}/out2/corpus").where(
        F.col("doc_id") == 70
    ).collect()[0]["text"]
    assert "bob@example.org" in raw


def test_url_collapse_stage(spark, tmp_path):
    """Stage 0: planted canonical-url variants collapse to the
    first-crawled doc; docs without variants (and docs with null url)
    survive unchanged."""
    import contextlib
    import io

    from jobs.corpus_prep import main

    rng = __import__("random").Random(7)

    def prose(i):
        return " ".join(f"u{i}w{j}{rng.randrange(9)}" for j in range(60))

    rows = []
    # 20 unique docs with unique urls
    for i in range(20):
        rows.append((i, "en", prose(i), f"https://www.site{i}.example/page"))
    # 3 url-variants of doc 0's page, DIFFERENT content (so only the
    # url stage can collapse them)
    rows.append((100, "en", prose(100),
                 "https://WWW.SITE0.example/page#frag"))
    rows.append((101, "en", prose(101),
                 "https://www.site0.example:443/page?utm_source=x"))
    rows.append((102, "en", prose(102),
                 "https://www.site0.example/page"))
    # 2 docs with null url: must both survive (no null-key collapse)
    rows.append((200, "en", prose(200), None))
    rows.append((201, "en", prose(201), None))

    import pandas as pd
    root = str(tmp_path)
    docs = f"{root}/documents.parquet"
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text", "url"])
    ).write.mode("overwrite").parquet(docs)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--docs", docs, "--out", f"{root}/out",
                   "--min-quality", "0.0"])
    assert rc == 0
    import json
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["n_input"] == 25
    # doc 0's url canonicalizes with case/default-port/fragment/utm
    # normalized (www is NOT stripped — hosts must match);
    # variants 100-102 collapse into it -> 3 dropped, nulls survive
    assert report["n_after_url_dedup"] == 22
    corpus = spark.read.parquet(f"{root}/out/corpus")
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert 0 in ids and ids.isdisjoint({100, 101, 102})
    assert {200, 201} <= ids
    assert set(range(20)) <= ids
