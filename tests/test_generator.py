"""Fixture-generator determinism (FIXTURES.md §6) and distributed-vs-driver
generation identity."""

import pandas as pd

from audio_quality_checker_spark.sources.pages import (
    CATEGORY_NAMES,
    gen_pages_pdf,
    gen_pages_spark,
    make_page,
)


def test_make_page_deterministic():
    a = make_page("Control_Clean", 7)
    b = make_page("Control_Clean", 7)
    assert a == b
    c = make_page("Control_Clean", 8)
    assert c["url"] != a["url"]


def test_regeneration_byte_identical():
    p1 = gen_pages_pdf(50)
    p2 = gen_pages_pdf(50)
    pd.testing.assert_frame_equal(p1, p2)


def test_text_matches_extractor_on_clean_categories():
    from audio_quality_checker_spark.functions.extract import extract_text_safe

    pdf = gen_pages_pdf(60, categories=["Control_Clean", "SkewHost", "DupUrl"])
    for _, r in pdf.iterrows():
        text, err = extract_text_safe(r["html"])
        assert err is None
        assert text == r["text"]


def test_spark_generation_matches_driver_generation(spark):
    driver = gen_pages_pdf(30).sort_values(["p_day", "url"]).reset_index(drop=True)
    dist = (
        gen_pages_spark(spark, 30, parallelism=8)
        .toPandas()
        .sort_values(["p_day", "url"])
        .reset_index(drop=True)
    )
    assert len(driver) == len(dist) == 30 * len(CATEGORY_NAMES)
    for col in ["url", "text", "lang", "p_day"]:
        assert driver[col].fillna("∅").tolist() == dist[col].fillna("∅").tolist(), col
    assert [bytes(x) for x in driver["html"]] == [bytes(x) for x in dist["html"]]
