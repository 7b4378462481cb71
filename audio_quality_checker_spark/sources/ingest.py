"""Alternate source formats for the pages table: JSON-lines (crawl
interchange) and ORC — parquet remains the primary store.

Crawl pipelines commonly hand off batches as JSONL; a binary html payload
cannot ride raw JSON, so the interchange convention is base64 (`unbase64`
/ `base64` are JVM expressions, so encode/decode never leaves codegen).
Round-trip byte-identity of the payload is asserted in
tests/test_ingest.py — the same contract the extraction kernel pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_JSONL_DDL = (
    "url string, warc_ts timestamp, html_b64 string, text string, "
    "lang string, p_day string"
)


def pages_to_jsonl(pages: DataFrame, path: str,
                   mode: str = "overwrite") -> None:
    """Write a pages frame as JSON-lines with base64 html (distributed;
    the encode is a Catalyst expression)."""
    (
        pages.withColumn("html_b64", F.base64("html"))
        .drop("html")
        .write.mode(mode)
        .json(path)
    )


def pages_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL pages batch back to the canonical schema (html binary).

    The schema is EXPLICIT, never inferred: schema inference reads the
    data twice and happily types a corrupted column as string — the
    declared-schema discipline of operators/schema_check.py starts at
    ingestion."""
    raw = spark.read.schema(PAGES_JSONL_DDL).json(path)
    return raw.withColumn("html", F.unbase64("html_b64")).drop("html_b64")


def pages_to_orc(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (binary columns are first-class in ORC, no encoding)."""
    pages.write.mode(mode).orc(path)


def pages_from_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
