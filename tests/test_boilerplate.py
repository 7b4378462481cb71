"""Line-level boilerplate dedup (operators/boilerplate.py): document
frequency drives removal, order is restored exactly, empty lines are
structure (never boilerplate), an all-boiler doc comes back empty."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.operators.boilerplate import (
    line_doc_freq, remove_boilerplate_lines,
)

NAV = "home | products | contact"
FOOT = "copyright 2025 example inc"


@pytest.fixture(scope="module")
def result(spark):
    rows = []
    for i in range(6):
        rows.append((i, f"{NAV}\nunique body {i} text\n\n{FOOT}"))
    # in-doc repetition does NOT make a line boilerplate (df counts
    # distinct docs): doc 10's tagline appears twice in ONE doc only
    rows.append((10, "tagline\ntagline\nmore body ten"))
    # all-boiler doc: every line is shared
    rows.append((11, f"{NAV}\n{FOOT}"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, min_doc_freq=3).collect()
    }
    freq = {r["line"]: r["doc_freq"] for r in line_doc_freq(df).collect()}
    return out, freq


def test_doc_freq(result):
    _, freq = result
    assert freq[NAV] == 7 and freq[FOOT] == 7
    assert freq["tagline"] == 1          # distinct docs, not instances
    assert "" not in freq                # empties never counted


def test_removal_and_order(result):
    out, _ = result
    for i in range(6):
        # nav+foot gone, body and the EMPTY line survive in order
        assert out[i]["text"] == f"unique body {i} text\n"
        assert out[i]["n_lines_removed"] == 2


def test_in_doc_repetition_kept(result):
    out, _ = result
    assert out[10]["text"] == "tagline\ntagline\nmore body ten"
    assert out[10]["n_lines_removed"] == 0


def test_all_boiler_doc_empty(result):
    out, _ = result
    assert out[11]["text"] == ""
    assert out[11]["n_lines_removed"] == 2


def test_min_doc_freq_guard(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        remove_boilerplate_lines(df, min_doc_freq=1)
