"""applyInPandasWithState EWMA drift monitor: math vs a hand model, and
state survival across query restarts (the streaming resume analog)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.streaming.stateful import ewma_drift_stream

TS = dt.datetime(2025, 11, 1, 12, 0, 0)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        [("http://h/x", TS, b"<p>x</p>", "x" * n, lang, "2025-11-01")
         for lang, n in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, p_day string",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _latest(spark, out_dir):
    """Latest state row per lang (total_rows is monotone in batch order)."""
    df = spark.read.parquet(out_dir)
    rows = {}
    for r in df.collect():
        cur = rows.get(r["lang"])
        if cur is None or r["total_rows"] > cur["total_rows"]:
            rows[r["lang"]] = r
    return rows


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "pages"), str(tmp_path / "ckpt"), str(tmp_path / "out")


def test_ewma_math_and_restart_resume(spark, dirs):
    pages, ckpt, out = dirs
    alpha = 0.3

    # batch 1: en docs of length 100
    _write_batch(spark, pages, [("en", 100)] * 10)
    q = ewma_drift_stream(spark, pages, ckpt, out, alpha=alpha)
    q.awaitTermination()
    en = _latest(spark, out)["en"]
    assert en["total_rows"] == 10
    assert en["ewma_len"] == 100.0
    assert en["mean_len"] == 100.0
    assert en["drifting"] is False

    # batch 2 (same checkpoint -> state resumes): lengths jump to 400
    _write_batch(spark, pages, [("en", 400)] * 10)
    q2 = ewma_drift_stream(spark, pages, ckpt, out, alpha=alpha)
    q2.awaitTermination()
    en = _latest(spark, out)["en"]
    # state resumed: totals accumulate across runs
    assert en["total_rows"] == 20
    assert en["mean_len"] == 250.0  # (10*100 + 10*400) / 20
    # ewma = 0.3*400 + 0.7*100 = 190
    assert abs(en["ewma_len"] - 190.0) < 1e-6
    assert abs(en["drift_ratio"] - 190.0 / 250.0) < 1e-6
    assert en["drifting"] is False  # 0.76 within the 1/1.5 band

    # batch 3: another sustained batch continues the EWMA from state
    _write_batch(spark, pages, [("en", 400)] * 30)
    q3 = ewma_drift_stream(spark, pages, ckpt, out, alpha=alpha)
    q3.awaitTermination()
    en = _latest(spark, out)["en"]
    assert en["total_rows"] == 50
    # ewma = 0.3*400 + 0.7*190 = 253; mean = (1000+4000+12000)/50 = 340
    assert abs(en["ewma_len"] - 253.0) < 1e-6
    assert abs(en["mean_len"] - 340.0) < 1e-6


def test_keys_are_independent_and_drift_flags(spark, dirs):
    pages, ckpt, out = dirs
    _write_batch(spark, pages, [("en", 100)] * 5 + [("de", 300)] * 5)
    q = ewma_drift_stream(spark, pages, ckpt, out)
    q.awaitTermination()
    rows = _latest(spark, out)
    assert rows["en"]["mean_len"] == 100.0
    assert rows["de"]["mean_len"] == 300.0
    assert not rows["en"]["drifting"] and not rows["de"]["drifting"]
    # null lang rides its own key
    _write_batch(spark, pages, [(None, 50)] * 3)
    q2 = ewma_drift_stream(spark, pages, ckpt, out)
    q2.awaitTermination()
    rows = _latest(spark, out)
    assert rows["__null__"]["total_rows"] == 3
