"""Source-format round trips: JSONL (base64 html) and ORC must preserve
the pages table byte-identically — the extraction byte-identity contract
starts at ingestion."""

from pyspark.sql import functions as F

from audio_quality_checker_spark.sources.ingest import (
    pages_from_jsonl,
    pages_from_orc,
    pages_to_jsonl,
    pages_to_orc,
)

COLS = ["url", "warc_ts", "html", "text", "lang", "p_day"]


def _as_map(rows):
    return {
        r["url"]: (r["warc_ts"], bytes(r["html"]) if r["html"] is not None
                   else None, r["text"], r["lang"], r["p_day"])
        for r in rows
    }


def test_jsonl_round_trip_byte_identical(spark, golden, tmp_path):
    pages = golden["pages"].select(*COLS)
    path = str(tmp_path / "pages_jsonl")
    pages_to_jsonl(pages, path)
    back = pages_from_jsonl(spark, path).select(*COLS)
    a, b = _as_map(pages.collect()), _as_map(back.collect())
    assert a == b, "JSONL round trip changed rows"
    # the MalformedHtml category carries invalid-UTF-8 bytes: base64 must
    # have moved them losslessly
    bad = [v for v in b.values() if v[1] and b"\xff\xfe" in v[1]]
    assert bad, "corrupt-payload rows missing after round trip"


def test_orc_round_trip_byte_identical(spark, golden, tmp_path):
    pages = golden["pages"].select(*COLS)
    path = str(tmp_path / "pages_orc")
    pages_to_orc(pages, path)
    back = pages_from_orc(spark, path).select(*COLS)
    assert _as_map(pages.collect()) == _as_map(back.collect())


def test_jsonl_schema_is_declared_not_inferred(spark, golden, tmp_path):
    """Reading with the explicit DDL: a JSONL batch missing a column
    yields nulls in that column, not a schema drift — which the schema
    check then flags (declared-schema discipline end to end)."""
    pages = golden["pages"].select(*COLS).limit(20)
    path = str(tmp_path / "partial_jsonl")
    pages_to_jsonl(pages.drop("lang"), path)
    back = pages_from_jsonl(spark, path)
    assert "lang" in back.columns
    assert back.where(F.col("lang").isNull()).count() == 20
