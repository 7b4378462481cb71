"""Extraction-identity check: stored ``text`` vs ``extract_text(html)``.

The re-derivation check (SURVEY.md §2.9): the analog of the reference's
downsample->upsample->compare null test (upsampling.rs:170-210), but with
a STRICTER contract — exact byte equality per url instead of a 0.95
correlation (BASELINE.json input_hint: "byte-identical extracted text per
url").  Also the transcode-detection analog: a stored payload that cannot
be re-derived from its claimed source is the web-data version of a lossy
transcode posing as lossless.

Two defect families, kept orthogonal:

 - ExtractionError: the html is undecodable (corrupt-packet analog,
   decoder.rs:138-143).  Since the pinned extractor's only failure mode is
   invalid UTF-8, this is counted EXACTLY over all rows by a pure-JVM
   expression in the one-pass stats aggregation (stats.n_html_bad_utf8) —
   no sampling variance, no Python.

 - ExtractionMismatch: html decodes fine but the STORED text differs from
   the re-extracted text — requires actually running the extraction
   kernel, so it runs on a seeded sample by default (the reference caps
   its null test at the first 5 s of audio, upsampling.rs:174-175);
   `check_extraction_full=True` re-extracts every row (regression mode).
   Counted only where stored text is non-null (null stored text is the
   null-rate check's jurisdiction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.functions.extract import with_extracted_text
from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)


def mismatch_stats(features: DataFrame, suite: CheckSuite) -> DataFrame:
    """(p_day, n_compared, n_mismatch) from the sampled re-extraction."""
    df = features.select("p_day", "html", "text").where(
        F.col("text").isNotNull() & F.col("html").isNotNull()
    )
    if not suite.check_extraction_full:
        df = df.sample(
            fraction=suite.extraction_sample_fraction,
            seed=suite.extraction_sample_seed,
        )
    ex = with_extracted_text(df)
    return ex.groupBy("p_day").agg(
        F.sum(
            F.when(F.col("extracted_error").isNull(), 1).otherwise(0)
        ).alias("n_compared"),
        F.sum(
            F.when(
                F.col("extracted_error").isNull()
                & (F.col("text") != F.col("extracted_text")),
                1,
            ).otherwise(0)
        ).alias("n_mismatch"),
    )


def extraction_violations(
    features: DataFrame, stats: DataFrame, suite: CheckSuite
) -> DataFrame:
    pk = F.col("p_day")
    err_rate = F.col("n_html_bad_utf8") / F.col("n_rows").cast("double")
    errors = stats.select(
        *violation_row(
            pk,
            "ExtractionError",
            "html",
            graded_confidence(err_rate, suite.max_extraction_error_rate),
            F.format_string(
                "undecodable html rate %.4f exceeds %.4f (%d of %d rows)",
                err_rate, F.lit(suite.max_extraction_error_rate),
                F.col("n_html_bad_utf8"), F.col("n_rows"),
            ),
            {"error_rate": err_rate, "n_errors": F.col("n_html_bad_utf8")},
        )
    ).where(F.col("confidence") > 0)

    ms = mismatch_stats(features, suite)
    mis_rate = F.col("n_mismatch") / F.greatest(F.col("n_compared"), F.lit(1)).cast(
        "double"
    )
    mismatches = ms.select(
        *violation_row(
            pk,
            "ExtractionMismatch",
            "text",
            graded_confidence(mis_rate, suite.max_extraction_mismatch_rate),
            F.format_string(
                "stored text != extract(html) for %.4f of compared rows (%d of %d)",
                mis_rate, F.col("n_mismatch"), F.col("n_compared"),
            ),
            {"mismatch_rate": mis_rate, "n_mismatch": F.col("n_mismatch")},
        )
    ).where(F.col("confidence") > 0)
    return errors.unionByName(mismatches)
