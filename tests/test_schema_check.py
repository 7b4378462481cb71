"""Schema validation: the claimed/actual/inferred provenance triple
(decoder.rs:81-91/165-198, detector.rs:102-103 re-imagined for tables),
structural breaks failing every partition, and value-domain conformance."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema_check import (
    PAGES_EXPECTATION,
    ColumnExpectation,
    TableExpectation,
    schema_report,
    structural_violations,
    with_conformance_flags,
)
from audio_quality_checker_spark.plans.validate import run_checks

TS = dt.datetime(2025, 11, 1, 12, 0, 0)


def _pages(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, p_day string",
    )


def test_schema_report_statuses(spark):
    """ok / type_mismatch / missing / derived / inferred all in one table."""
    exp = TableExpectation(
        columns=(
            ColumnExpectation("url", ("string",)),
            ColumnExpectation("warc_ts", ("timestamp",)),
            ColumnExpectation("gone", ("string",)),           # absent: missing
            ColumnExpectation("p_day", ("string",), required=False),
        )
    )
    df = spark.createDataFrame(
        [("u", 1, 2.5)], "url string, warc_ts int, extra double"
    )  # warc_ts wrongly typed; extra undeclared; p_day absent but derivable
    rep = {r["column"]: r for r in schema_report(spark, df, exp).collect()}
    assert rep["url"]["status"] == "ok"
    assert rep["warc_ts"]["status"] == "type_mismatch"
    assert rep["warc_ts"]["actual_type"] == "int"
    assert rep["gone"]["status"] == "missing"
    assert rep["p_day"]["status"] == "derived"
    # observed-but-undeclared column: expectation inferred from the data,
    # the bit-depth fallback-chain provenance
    assert rep["extra"]["provenance"] == "inferred"
    assert rep["extra"]["status"] == "inferred"
    assert rep["extra"]["claimed_type"] == "double"


def test_structural_violation_rows(spark):
    df = spark.createDataFrame([("u", 1)], "url string, warc_ts int")
    rows = structural_violations(spark, df, PAGES_EXPECTATION).collect()
    got = {(r["column_name"], r["params"]["status"]) for r in rows}
    assert ("warc_ts", "type_mismatch") in got
    assert ("html", "missing") in got
    assert all(r["violation_type"] == "SchemaViolation" for r in rows)


def test_conformance_flags(spark):
    rows = [
        ("https://ok.example/x", TS, b"<p>a</p>", "a", "en", "2025-11-01"),
        ("notaurl", TS, b"<p>a</p>", "a", "en", "2025-11-01"),          # bad url
        ("https://ok.example/y", TS, b"<p>a</p>", "a", "english", "2025-11-01"),  # bad lang
        ("https://ok.example/z", dt.datetime(1970, 1, 2), b"<p>a</p>", "a",
         "en", "2025-11-01"),                                           # bad ts
        (None, TS, b"<p>a</p>", "a", None, "2025-11-01"),               # null url
    ]
    flagged = with_conformance_flags(_pages(spark, rows), PAGES_EXPECTATION)
    got = flagged.select("sv_url", "sv_lang", "sv_warc_ts").collect()
    assert [tuple(r) for r in got] == [
        (False, False, False),
        (True, False, False),
        (False, True, False),
        (False, False, True),
        (True, False, False),  # null url violates nullable=False
    ]
    # null lang is allowed (nullable column): no flag on row 5
    assert got[4]["sv_lang"] is False


def test_structural_break_fails_every_partition(spark):
    """A wrongly-typed column poisons the whole run: every crawl-day
    partition must fail, not just one."""
    rows = [
        (f"https://h{i}.example/x", TS + dt.timedelta(days=i % 2),
         "html-as-string", "a", "en", f"2025-11-0{1 + i % 2}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html string, text string, "
        "lang string, p_day string",
    )  # html declared binary, observed string
    res = run_checks(spark, df, None, None, suite=CheckSuite(), exact=True)
    verdicts = {r["partition_key"]: r for r in res.verdicts.collect()}
    res.unpersist()
    assert set(verdicts) == {"2025-11-01", "2025-11-02"}
    for pk, r in verdicts.items():
        assert not r["passed"], f"{pk} passed despite structural schema break"
        assert "SchemaViolation" in r["violation_types"]


def test_disabled_schema_check_emits_nothing(spark):
    rows = [("notaurl", TS, b"<p>a</p>", "a", "english", "2025-11-01")] * 5
    df = _pages(spark, rows)
    res = run_checks(
        spark, df, None, None, suite=CheckSuite(check_schema=False), exact=True
    )
    types = {r["violation_type"] for r in res.violations.collect()}
    res.unpersist()
    assert "SchemaViolation" not in types


def test_repetition_check_opt_in(spark):
    """check_repetition (opt-in): a partition where most docs repeat
    their own lines gets a RepetitionAnomaly; a clean partition and the
    default suite (check off) get none."""
    import pandas as pd

    from audio_quality_checker_spark.config import CheckSuite
    from audio_quality_checker_spark.plans.validate import run_checks
    from audio_quality_checker_spark.sources.pages import gen_pages_pdf

    pdf = gen_pages_pdf(40, categories=["Control_Clean"])
    pdf["p_day"] = "2025-11-01"
    rep = pdf.copy()
    rep["p_day"] = "2025-11-02"
    # 60% of docs: the same line pasted 10x (dup_line_frac 0.9)
    rep_text = ("boilerplate nav footer line\n" * 10).strip()
    rep.loc[rep.index[: int(len(rep) * 0.6)], "text"] = rep_text
    pages = spark.createDataFrame(pd.concat([pdf, rep]))

    suite = CheckSuite(
        check_schema=False, check_uniqueness=False,
        check_referential=False, check_drift=False,
        check_extraction=False, check_repetition=True,
    )
    res = run_checks(spark, pages, None, None, suite)
    v = {
        (r["partition_key"], r["violation_type"])
        for r in res.violations.collect()
    }
    assert ("2025-11-02", "RepetitionAnomaly") in v
    assert ("2025-11-01", "RepetitionAnomaly") not in v
    res.unpersist()

    # default suite: the check never runs
    res2 = run_checks(spark, pages, None, None, CheckSuite(
        check_schema=False, check_uniqueness=False,
        check_referential=False, check_drift=False,
        check_extraction=False,
    ))
    assert not any(
        r["violation_type"] == "RepetitionAnomaly"
        for r in res2.violations.collect()
    )
    res2.unpersist()


def test_repetition_check_fused_mode(spark):
    """--full --repetition: in fused mode `features` is None, so the
    repetition gate must read text from the source scan (the round-4
    wiring crashed here with AttributeError)."""
    import pandas as pd

    from audio_quality_checker_spark.config import CheckSuite
    from audio_quality_checker_spark.plans.validate import run_checks
    from audio_quality_checker_spark.sources.pages import gen_pages_pdf

    pdf = gen_pages_pdf(30, categories=["Control_Clean"])
    pdf["p_day"] = "2025-11-01"
    rep = pdf.copy()
    rep["p_day"] = "2025-11-02"
    rep_text = ("boilerplate nav footer line\n" * 10).strip()
    rep.loc[rep.index[: int(len(rep) * 0.6)], "text"] = rep_text
    pages = spark.createDataFrame(pd.concat([pdf, rep]))

    suite = CheckSuite(
        check_schema=False, check_uniqueness=False,
        check_referential=False, check_drift=False,
        check_extraction=True, check_extraction_full=True,
        check_repetition=True,
    )
    res = run_checks(spark, pages, None, None, suite)
    v = {
        (r["partition_key"], r["violation_type"])
        for r in res.violations.collect()
    }
    res.unpersist()
    assert ("2025-11-02", "RepetitionAnomaly") in v
    assert ("2025-11-01", "RepetitionAnomaly") not in v


def test_near_dup_check_opt_in_flips_verdict(spark):
    """check_near_dup (opt-in): a partition where most docs are
    near-copies of each other flips to FAIL with NearDuplicationAnomaly;
    a clean partition stays PASS, and the default suite never runs the
    pair search."""
    import pandas as pd

    from audio_quality_checker_spark.config import CheckSuite
    from audio_quality_checker_spark.plans.validate import run_checks
    from audio_quality_checker_spark.sources.pages import gen_pages_pdf

    pdf = gen_pages_pdf(40, categories=["Control_Clean"])
    pdf["p_day"] = "2025-11-01"
    # the generator's synthetic prose is itself template-heavy, which is
    # exactly what this gate detects — give the CLEAN partition
    # genuinely distinct token sets so it stays below the rate gate
    pdf["text"] = [
        " ".join(f"doc{i}w{j}" for j in range(40)) for i in range(len(pdf))
    ]
    dup = gen_pages_pdf(40, categories=["Control_Clean"])
    dup["p_day"] = "2025-11-02"
    dup["text"] = [
        " ".join(f"dup{i}w{j}" for j in range(40))
        for i in range(len(dup))
    ]
    # 60% of docs: near-copies of one template (small suffix variation)
    tmpl = "the quick template body " * 30
    n = int(len(dup) * 0.6)
    dup.loc[dup.index[:n], "text"] = [
        tmpl + f"variant token{i}" for i in range(n)
    ]
    pages = spark.createDataFrame(pd.concat([pdf, dup]))

    suite = CheckSuite(
        check_schema=False, check_uniqueness=False,
        check_referential=False, check_drift=False,
        check_extraction=False, check_near_dup=True,
    )
    res = run_checks(spark, pages, None, None, suite)
    v = {
        (r["partition_key"], r["violation_type"])
        for r in res.violations.collect()
    }
    verdicts = {r["partition_key"]: r["passed"] for r in res.verdicts.collect()}
    res.unpersist()
    assert ("2025-11-02", "NearDuplicationAnomaly") in v
    assert ("2025-11-01", "NearDuplicationAnomaly") not in v
    assert verdicts["2025-11-02"] is False
    assert verdicts["2025-11-01"] is True

    # default suite: the check never runs, verdicts unchanged
    res2 = run_checks(spark, pages, None, None, CheckSuite(
        check_schema=False, check_uniqueness=False,
        check_referential=False, check_drift=False,
        check_extraction=False,
    ))
    assert not any(
        r["violation_type"] == "NearDuplicationAnomaly"
        for r in res2.violations.collect()
    )
    res2.unpersist()
