"""Diagnostic / threshold-suggestion layer (diagnostic_test.rs:32-189,
suggestion logic 520-526): dump verbose per-partition metrics on labeled
corpora and PROPOSE thresholds from the control-vs-defect separation.

The reference's diagnostic tier prints every intermediate detector metric
for control files and suggests a threshold at the midpoint between the
worst control value and the best defect value.  Engine analog: the
per-partition stats frame already carries every gated measure; given
labeled partitions (clean vs defect for a measure), the suggested gate is
the midpoint of the separation band, with the margin reported so a human
can see how much head-room the gate has.
"""

from __future__ import annotations

from dataclasses import fields

from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite

# measure name -> (expression factory, CheckSuite gate field, needed cols)
# factories, not expressions: building a Column requires an active
# SparkContext, which must not be a module-import-time requirement
MEASURES: dict[str, tuple] = {
    "null_rate_text": (
        lambda: F.col("text_nulls") / F.col("n_rows"), "max_null_rate",
        ("text_nulls", "n_rows"),
    ),
    "null_rate_lang": (
        lambda: F.col("lang_nulls") / F.col("n_rows"), "max_null_rate",
        ("lang_nulls", "n_rows"),
    ),
    "dup_rate": (
        lambda: F.lit(1.0) - F.col("n_urls_distinct") / F.col("n_rows"),
        "max_dup_rate", ("n_urls_distinct", "n_rows"),
    ),
    "extraction_error_rate": (
        lambda: F.col("n_html_bad_utf8") / F.col("n_rows"),
        "max_extraction_error_rate", ("n_html_bad_utf8", "n_rows"),
    ),
    "short_text_rate": (
        lambda: F.col("n_short_text") / F.col("n_rows"), None,
        ("n_short_text", "n_rows"),
    ),
    "long_text_rate": (
        lambda: F.col("n_long_text") / F.col("n_rows"), None,
        ("n_long_text", "n_rows"),
    ),
}


def diagnostic_metrics(stats: DataFrame) -> DataFrame:
    """(p_day, measure, value): the verbose per-partition metric dump —
    every gated measure the stats row supports, long-form for inspection
    (the control-file metric dump, diagnostic_test.rs:32-189)."""
    cols = [
        F.struct(F.lit(name).alias("measure"),
                 make().cast("double").alias("value"))
        for name, (make, _, needed) in MEASURES.items()
        if all(c in stats.columns for c in needed)
    ]
    ex = stats.select("p_day", F.explode(F.array(*cols)).alias("m"))
    return ex.select(
        "p_day", F.col("m.measure").alias("measure"),
        F.col("m.value").alias("value"),
    )


def suggest_thresholds(
    stats: DataFrame,
    labels: dict[str, dict[str, bool]],
    suite: CheckSuite | None = None,
) -> list[dict]:
    """Propose a gate per measure from labeled partitions.

    ``labels``: measure -> {partition_key: is_defect}.  Partitions absent
    from a measure's map are ignored for that measure (a DupUrl day says
    nothing about null-rate gates).  Suggestion = midpoint between the
    max clean value and the min defect value (the control-vs-defect
    midpoint rule, diagnostic_test.rs:520-526); the relative margin shows
    the head-room.  Rows where the populations overlap report
    ``separable=False`` instead of a bogus gate.
    """
    suite = suite or CheckSuite()
    m = diagnostic_metrics(stats)
    vals = {
        (r["p_day"], r["measure"]): r["value"] for r in m.collect()
    }
    out = []
    for measure, (_, gate_field, _needed) in MEASURES.items():
        lab = labels.get(measure)
        if not lab:
            continue
        clean = [
            v for (pk, mm), v in vals.items()
            if mm == measure and lab.get(pk) is False and v is not None
        ]
        defect = [
            v for (pk, mm), v in vals.items()
            if mm == measure and lab.get(pk) is True and v is not None
        ]
        if not clean or not defect:
            continue
        hi_clean, lo_defect = max(clean), min(defect)
        separable = lo_defect > hi_clean
        suggested = (hi_clean + lo_defect) / 2 if separable else None
        current = getattr(suite, gate_field) if gate_field else None
        out.append({
            "measure": measure,
            "gate_field": gate_field,
            "max_clean": hi_clean,
            "min_defect": lo_defect,
            "separable": separable,
            "suggested_threshold": suggested,
            "current_threshold": current,
            "current_inside_band": (
                separable and current is not None
                and hi_clean < current < lo_defect
            ),
            "margin": (lo_defect - hi_clean) if separable else 0.0,
        })
    return out


def suite_with_suggestions(suggestions: list[dict],
                           base: CheckSuite | None = None) -> CheckSuite:
    """Apply separable suggestions onto a CheckSuite (fluent, returns a
    new one) — the auto-tuned config the diagnostic tier hands back."""
    base = base or CheckSuite()
    valid = {f.name for f in fields(CheckSuite)}
    overrides = {
        s["gate_field"]: round(s["suggested_threshold"], 6)
        for s in suggestions
        if s["separable"] and s["gate_field"] in valid
        and s["suggested_threshold"] is not None
    }
    return base.with_(**overrides)
