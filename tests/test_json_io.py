"""JSON export/ingestion round trips (main.rs:128-151 analog)."""

import json

from pyspark.sql import functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.functions.json_io import (
    suite_from_json,
    suite_to_json,
    to_json_lines,
    violations_to_json,
)
from audio_quality_checker_spark.operators.schema import VIOLATION_SCHEMA


def test_violations_json_round_trip(spark):
    rows = [
        ("2025-11-02", "NullRateExceeded", "text", 0.95,
         "null rate 0.2 exceeds 0.05", {"null_rate": "0.2"}),
        ("2025-11-05", "UniquenessViolation", "url", 0.85, None, None),
    ]
    v = spark.createDataFrame(rows, VIOLATION_SCHEMA)
    lines = [r["json"] for r in violations_to_json(v).collect()]
    parsed = sorted(
        (json.loads(ln) for ln in lines), key=lambda d: d["partition_key"]
    )
    assert parsed[0]["partition_key"] == "2025-11-02"
    assert parsed[0]["params"] == {"null_rate": "0.2"}
    assert parsed[1]["violation_type"] == "UniquenessViolation"
    # inverse: from_json with the same schema recovers the struct
    back = (
        spark.createDataFrame([(ln,) for ln in lines], "j string")
        .select(F.from_json("j", VIOLATION_SCHEMA).alias("v"))
        .select("v.*")
    )
    orig = {tuple(r)[:4] for r in v.collect()}
    rt = {tuple(r)[:4] for r in back.collect()}
    assert rt == orig


def test_to_json_is_distributed_expression(spark):
    """The serialization must be a column expression, not a driver loop:
    the plan contains to_json, and no collect happens before the action."""
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("x"))
    plan = to_json_lines(df)._jdf.queryExecution().optimizedPlan().toString()
    # Spark 4 prints the expression as StructsToJson(Evaluator)
    assert "StructsToJson" in plan or "to_json" in plan


def test_suite_json_round_trip(spark):
    suite = CheckSuite(max_null_rate=0.11, check_trend=True, trend_window=9)
    rt = suite_from_json(spark, suite_to_json(suite))
    assert rt.max_null_rate == 0.11
    assert rt.check_trend is True
    assert rt.trend_window == 9
    # untouched fields keep defaults
    assert rt.max_psi == CheckSuite().max_psi


def test_suite_from_json_partial_and_unknown_keys(spark):
    cfg = '{"max_dup_rate": 0.5, "not_a_real_knob": 42}'
    s = suite_from_json(spark, cfg)
    assert s.max_dup_rate == 0.5
    assert s.max_null_rate == CheckSuite().max_null_rate
