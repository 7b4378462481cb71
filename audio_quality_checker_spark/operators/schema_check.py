"""Schema + value-conformance validation — the engine's namesake check.

The reference's core structural check is the bit-depth provenance triple:
the container CLAIMS a depth (decoder.rs:81-91), decode observes the
ACTUAL samples (decoder.rs:165-198), and when the claim is absent or
untrustworthy an expectation is INFERRED from the data itself
(detector.rs:102-103).  Re-imagined for tables, that is declared-vs-
observed schema checking:

 - **structural**: the observed DataFrame schema (column names, types)
   vs a declared ``TableExpectation`` — a missing or wrongly-typed column
   is a table-level catastrophe (the claimed-depth mismatch analog), so a
   structural violation fails every partition of the run.
 - **value conformance**: per-row predicates from the declared domain
   (allowed value sets, regex patterns, ranges, non-null columns) — pure
   Catalyst expressions folded into the existing one-pass stats
   aggregation, so the namesake check costs ZERO extra scans or shuffles.
 - **provenance**: columns observed but not declared get an expectation
   inferred from the observed schema, tagged ``provenance='inferred'``
   (the bit-depth fallback chain) in ``schema_report``.

Violation type: ``SchemaViolation`` (critical — config.py critical_types;
a schema break fails the partition outright, the hard defect-class
semantics of detector.rs:362-371).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)

# the 184 two-letter ISO-639-1 language codes (public standard)
ISO_639_1 = frozenset(
    "aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs ca ce "
    "ch co cr cs cu cv cy da de dv dz ee el en eo es et eu fa ff fi fj fo fr "
    "fy ga gd gl gn gu gv ha he hi ho hr ht hu hy hz ia id ie ig ii ik io is "
    "it iu ja jv ka kg ki kj kk kl km kn ko kr ks ku kv kw ky la lb lg li ln "
    "lo lt lu lv mg mh mi mk ml mn mr ms mt my na nb nd ne ng nl nn no nr nv "
    "ny oc oj om or os pa pi pl ps pt qu rm rn ro ru rw sa sc sd se sg si sk "
    "sl sm sn so sq sr ss st su sv sw ta te tg th ti tk tl tn to tr ts tt tw "
    "ty ug uk ur uz ve vi vo wa wo xh yi yo za zh zu".split()
)


@dataclass(frozen=True)
class ColumnExpectation:
    """Declared expectation for one column (the CLAIMED side of the
    claimed/actual/inferred triple).  ``dtype`` accepts several Spark
    simpleString spellings when a column legitimately varies by source
    (e.g. a partition key inferred as date by partitioned parquet)."""

    name: str
    dtype: tuple[str, ...] = ()           # () = don't check the type
    nullable: bool = True                 # False -> any null is a violation
    allowed_values: frozenset[str] | None = None
    pattern: str | None = None            # rlike regex for string values
    min_ts: str | None = None             # ISO timestamp lower bound
    max_ts: str | None = None             # ISO timestamp upper bound (excl)
    min_num: float | None = None          # numeric lower bound (incl)
    max_num: float | None = None          # numeric upper bound (incl)
    required: bool = True                 # False: absence is OK (derivable)
    provenance: str = "declared"


@dataclass(frozen=True)
class TableExpectation:
    columns: tuple[ColumnExpectation, ...] = field(default_factory=tuple)

    def by_name(self) -> dict[str, ColumnExpectation]:
        return {c.name: c for c in self.columns}


# The declared expectation for the Common-Crawl-style pages table
# (BASELINE.json input_hint: url:string, warc_ts:timestamp, html:binary,
# text:string, lang:string).
PAGES_EXPECTATION = TableExpectation(
    columns=(
        ColumnExpectation("url", ("string",), nullable=False,
                          pattern=r"^https?://[^\s/]+"),
        ColumnExpectation("warc_ts", ("timestamp", "timestamp_ntz"),
                          nullable=False,
                          min_ts="2020-01-01 00:00:00",
                          max_ts="2027-01-01 00:00:00"),
        ColumnExpectation("html", ("binary",)),
        ColumnExpectation("text", ("string",)),
        ColumnExpectation("lang", ("string",), allowed_values=ISO_639_1),
        # partitioned-parquet reads infer `p_day=` dirs as DATE; both are
        # fine, and the key is derivable from warc_ts when absent entirely
        ColumnExpectation("p_day", ("string", "date"),
                          pattern=r"^\d{4}-\d{2}-\d{2}$", required=False),
    )
)


def _conformance_predicate(exp: ColumnExpectation) -> Column | None:
    """Boolean column: TRUE when the row VIOLATES the declared domain.
    Pure Catalyst expressions — rides whole-stage codegen."""
    c = F.col(exp.name)
    preds: list[Column] = []
    if not exp.nullable:
        preds.append(c.isNull())
    if exp.allowed_values is not None:
        preds.append(c.isNotNull() & ~c.isin(*sorted(exp.allowed_values)))
    if exp.pattern is not None:
        preds.append(c.isNotNull() & ~c.cast("string").rlike(exp.pattern))
    if exp.min_ts is not None:
        preds.append(c.isNotNull() & (c < F.lit(exp.min_ts).cast("timestamp")))
    if exp.max_ts is not None:
        preds.append(c.isNotNull() & (c >= F.lit(exp.max_ts).cast("timestamp")))
    if exp.min_num is not None:
        preds.append(c.isNotNull() & (c < F.lit(exp.min_num)))
    if exp.max_num is not None:
        preds.append(c.isNotNull() & (c > F.lit(exp.max_num)))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def with_conformance_flags(df: DataFrame,
                           expected: TableExpectation) -> DataFrame:
    """df + one boolean ``sv_<col>`` flag per constrained declared column.
    partition_stats counts any sv_* columns in its single wide pass, so
    the schema check adds NO scan and NO shuffle of its own."""
    for exp in expected.columns:
        if exp.name not in df.columns:
            continue  # structural check reports the missing column
        pred = _conformance_predicate(exp)
        if pred is not None:
            df = df.withColumn(f"sv_{exp.name}", pred)
    return df


def schema_violations(stats: DataFrame, suite,
                      expected: TableExpectation) -> DataFrame:
    """Per-partition SchemaViolation rows from the n_sv_* stats counts —
    the same explode-over-the-tiny-stats-frame shape as
    column_stats.stats_violations."""
    n = F.col("n_rows").cast("double")
    structs = []
    for exp in expected.columns:
        cnt_col = f"n_sv_{exp.name}"
        if cnt_col not in stats.columns:
            continue
        rate = F.col(cnt_col) / n
        structs.append(
            F.struct(
                F.lit(exp.name).alias("column_name"),
                graded_confidence(
                    rate, suite.max_schema_violation_rate
                ).alias("confidence"),
                F.format_string(
                    "declared-domain violation rate %.4f exceeds %.4f on `"
                    + exp.name + "` (%d of %d rows)",
                    rate, F.lit(suite.max_schema_violation_rate),
                    F.col(cnt_col), F.col("n_rows"),
                ).alias("evidence"),
                F.create_map(
                    F.lit("violation_rate"), rate.cast("string"),
                    F.lit("n_bad"), F.col(cnt_col).cast("string"),
                    F.lit("provenance"), F.lit(exp.provenance),
                ).alias("params"),
            )
        )
    if not structs:
        from audio_quality_checker_spark.operators.schema import (
            empty_violations,
        )

        return empty_violations(stats.sparkSession)
    exploded = stats.select(
        F.col("p_day").alias("partition_key"),
        F.explode(F.array(*structs)).alias("v"),
    )
    return exploded.select(
        "partition_key",
        F.lit("SchemaViolation").alias("violation_type"),
        F.col("v.column_name").alias("column_name"),
        F.col("v.confidence").alias("confidence"),
        F.col("v.evidence").alias("evidence"),
        F.col("v.params").alias("params"),
    ).where(F.col("confidence") > 0)


# ---------------------------------------------------------------------------
# Structural check + claimed/actual/inferred report
# ---------------------------------------------------------------------------

def schema_report(spark: SparkSession, df: DataFrame,
                  expected: TableExpectation) -> DataFrame:
    """(column, claimed_type, actual_type, provenance, status): the
    claimed/actual/inferred provenance triple over the observed schema.

    Metadata-only — no job runs.  Statuses: ok, type_mismatch, missing
    (declared but absent), inferred (observed but undeclared: the
    expectation is inferred from the observed schema itself, the
    bit-depth fallback chain, decoder.rs:81-91 / detector.rs:102-103).
    """
    observed = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    declared = expected.by_name()
    rows = []
    for exp in expected.columns:
        actual = observed.get(exp.name)
        claimed = "|".join(exp.dtype) if exp.dtype else "any"
        if actual is None:
            status = "missing" if exp.required else "derived"
        elif exp.dtype and actual not in exp.dtype:
            status = "type_mismatch"
        else:
            status = "ok"
        rows.append((exp.name, claimed, actual, exp.provenance, status))
    for name, actual in observed.items():
        if name not in declared:
            rows.append((name, actual, actual, "inferred", "inferred"))
    return spark.createDataFrame(
        rows,
        "column string, claimed_type string, actual_type string, "
        "provenance string, status string",
    )


def structural_violations(spark: SparkSession, df: DataFrame,
                          expected: TableExpectation) -> DataFrame:
    """Table-level SchemaViolation rows (no partition_key — the caller
    attaches every partition key, because a missing/wrongly-typed column
    poisons the whole run, not one crawl day)."""
    report = schema_report(spark, df, expected)
    bad = report.where(F.col("status").isin("missing", "type_mismatch"))
    return bad.select(
        *violation_row(
            F.lit(None).cast("string"),
            "SchemaViolation",
            F.col("column"),
            F.lit(0.95),
            F.format_string(
                "structural %s: declared %s, observed %s",
                F.col("status"), F.col("claimed_type"),
                F.coalesce(F.col("actual_type"), F.lit("<absent>")),
            ),
            {"status": F.col("status"), "claimed": F.col("claimed_type"),
             "actual": F.coalesce(F.col("actual_type"), F.lit("<absent>"))},
        )
    )
