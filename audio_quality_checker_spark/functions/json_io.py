"""JSON export / ingestion surface (main.rs:128-151 analog: the reference
serializes its report struct to JSON with serde; here the serialization is
a COLUMN expression so a 10^12-row violations table exports distributively
— `F.to_json(F.struct(...))` runs in whole-stage codegen, never on the
driver).  The inverse direction (`F.from_json`) ingests threshold configs
shipped as JSON, the `--config file.json` analog."""

from __future__ import annotations

from dataclasses import fields

from pyspark.sql import DataFrame, SparkSession, functions as F

from audio_quality_checker_spark.config import CheckSuite


def to_json_lines(df: DataFrame, col_name: str = "json") -> DataFrame:
    """One JSON-object string column per row, from ALL columns — the
    JSON-lines report sink.  Distributed: to_json is a Catalyst expression,
    so this composes with any writer (text sink, Kafka value, ...)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias(col_name))


def violations_to_json(violations: DataFrame) -> DataFrame:
    return to_json_lines(violations)


def verdicts_to_json(verdicts: DataFrame) -> DataFrame:
    return to_json_lines(verdicts)


# -- config ingestion: JSON -> CheckSuite ------------------------------------

# every scalar CheckSuite field is ingestable; dict/tuple fields (penalties,
# critical_types) keep their defaults unless given
_SCALAR_TYPES = {bool: "boolean", int: "int", float: "double", str: "string"}


def _suite_ddl() -> str:
    parts = []
    for f in fields(CheckSuite):
        t = _SCALAR_TYPES.get(f.type if isinstance(f.type, type) else None)
        if t is None:
            # dataclass stores annotations as strings under
            # `from __future__ import annotations`
            t = {"bool": "boolean", "int": "int", "float": "double",
                 "str": "string"}.get(str(f.type))
        if t:
            parts.append(f"{f.name} {t}")
    return ", ".join(parts)


def suite_from_json(spark: SparkSession, json_str: str) -> CheckSuite:
    """Parse a JSON config document into a CheckSuite via F.from_json —
    unknown keys are ignored, absent keys keep their defaults (the
    forward-compatible config contract)."""
    row = (
        spark.createDataFrame([(json_str,)], "j string")
        .select(F.from_json("j", _suite_ddl()).alias("s"))
        .select("s.*")
        .collect()[0]
    )
    overrides = {k: v for k, v in row.asDict().items() if v is not None}
    return CheckSuite(**overrides)


def suite_to_json(suite: CheckSuite) -> str:
    """Inverse of suite_from_json for the scalar fields (round-trip
    tested).  Driver-side on purpose: a config is one tiny document."""
    import json

    out = {}
    for f in fields(suite):
        v = getattr(suite, f.name)
        if isinstance(v, (bool, int, float, str)):
            out[f.name] = v
    return json.dumps(out, sort_keys=True)
