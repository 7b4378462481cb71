"""Violation / result schemas and shared expression helpers.

``DetectedDefect {type, confidence, evidence}`` (detector.rs:89-94) with a
13-variant payload enum (detector.rs:23-86) becomes a flat violations row:
Spark has no sum types, so the variant is a string discriminant and the
typed payload a sparse string map (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("violation_type", T.StringType(), False),
        T.StructField("column_name", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("evidence", T.StringType(), True),
        T.StructField("params", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

VIOLATION_COLS = [f.name for f in VIOLATION_SCHEMA.fields]


def graded_confidence(measured: F.Column, threshold: float) -> F.Column:
    """Graded-evidence confidence ladder, the hysteresis-band analog of the
    reference's tiered thresholds (detector.rs:456-526): confidence rises
    with how far past the gate the measurement lands, never a knife-edge
    0/1 at the cutpoint.  Prefer false negatives over false positives
    (detector.rs:421): below 1x threshold -> no violation is emitted at all
    (callers filter), and just-past-threshold earns only 0.65.
    """
    t = F.lit(float(threshold))
    return (
        F.when(measured >= 4 * t, F.lit(0.95))
        .when(measured >= 2 * t, F.lit(0.85))
        .when(measured > t, F.lit(0.65))
        .otherwise(F.lit(0.0))
    )


def violation_row(
    partition_key: F.Column,
    violation_type: str,
    column_name,
    confidence: F.Column,
    evidence: F.Column,
    params: dict[str, F.Column] | None = None,
) -> list[F.Column]:
    """Select-list for one violation row in the shared schema order.
    ``column_name`` may be a literal string, a Column, or None."""
    if params:
        entries = []
        for k, v in params.items():
            entries.extend([F.lit(k), v.cast("string")])
        params_col = F.create_map(*entries)
    else:
        params_col = F.lit(None).cast("map<string,string>")
    if column_name is None:
        col_col = F.lit(None).cast("string")
    elif isinstance(column_name, str):
        col_col = F.lit(column_name)
    else:
        col_col = column_name
    return [
        partition_key.alias("partition_key"),
        F.lit(violation_type).alias("violation_type"),
        col_col.alias("column_name"),
        confidence.cast("double").alias("confidence"),
        evidence.cast("string").alias("evidence"),
        params_col.alias("params"),
    ]


def empty_violations(spark):
    return spark.createDataFrame([], VIOLATION_SCHEMA)
