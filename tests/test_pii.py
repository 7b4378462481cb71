"""PII scrubbing (functions/pii.py): masks every planted PII form,
touches nothing else, is idempotent, and the false-positive guards
hold (version strings, plain digit runs, prose never match)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.functions.pii import (
    pii_count_cols, residual_pii_col, scrub_pii_col,
)


CASES = [
    # (raw, scrubbed, email, phone, ipv4)
    ("mail me at jane.doe+spam@sub.example.co.uk today",
     "mail me at <EMAIL> today", 1, 0, 0),
    ("call +1 555-867-5309 or 212-555-0147 now",
     "call <PHONE> or <PHONE> now", 0, 2, 0),
    ("dotted 192.168.1.1 and 10.0.0.255 quads",
     "dotted <IP> and <IP> quads", 0, 0, 2),
    ("mixed a@b.io from 127.0.0.1 dial 800.555.1212",
     "mixed <EMAIL> from <IP> dial <PHONE>", 1, 1, 1),
    # false-positive guards
    ("version 1.2.3 build 20250817 and 123456789 ids",
     "version 1.2.3 build 20250817 and 123456789 ids", 0, 0, 0),
    ("the meeting is on 2025-08-17 at 10.30", None, 0, 0, 0),
    ("unicode ümläut 中文 text stays", None, 0, 0, 0),
    ("", None, 0, 0, 0),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)),
                      "t": [c[0] for c in CASES]})
    )
    counts = pii_count_cols("t")
    return {
        r["i"]: r
        for r in df.select(
            "i", "t",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("ip"),
            scrub_pii_col("t").alias("clean"),
            scrub_pii_col(scrub_pii_col("t")).alias("clean2"),
            residual_pii_col(scrub_pii_col("t")).alias("resid"),
        ).collect()
    }


def test_scrub_and_counts(scrubbed):
    for i, (raw, want, e, p, ip) in enumerate(CASES):
        row = scrubbed[i]
        assert row["clean"] == (want if want is not None else raw), raw
        assert (row["e"], row["p"], row["ip"]) == (e, p, ip), raw


def test_idempotent_and_residual_zero(scrubbed):
    for i in range(len(CASES)):
        assert scrubbed[i]["clean2"] == scrubbed[i]["clean"]
        assert scrubbed[i]["resid"] == 0


def test_null_text_passthrough(spark):
    df = spark.createDataFrame([(None,)], "t string")
    row = df.select(scrub_pii_col("t").alias("c")).collect()[0]
    assert row["c"] is None
