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

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.config import CheckSuite
from audio_quality_checker_spark.operators.schema import (
    graded_confidence,
    violation_row,
)


def mismatch_stats(features: DataFrame, suite: CheckSuite) -> DataFrame:
    """(p_day, n_compared, n_mismatch) from the sampled re-extraction.

    mapInPandas with per-batch PARTIAL COUNTS instead of a scalar UDF in a
    projection: a scalar pandas UDF makes the JVM buffer every passthrough
    row in a queue while Python works (and 32 such tasks thrash a 32-core
    box — measured 171s vs 25s at half the tasks); mapInPandas consumes
    the batch wholly in Python and emits ~one row per (batch, p_day), so
    nothing rides a queue and the downstream shuffle moves bytes, not
    rows.  Parallelism of this one Python-heavy stage is capped at half
    the cores via coalesce (no shuffle): each task needs a JVM serializer
    thread AND a Python worker, so tasks==cores oversubscribes 2x.
    """
    df = features.select("p_day", "html", "text").where(
        F.col("text").isNotNull() & F.col("html").isNotNull()
    )
    if not suite.check_extraction_full:
        df = df.sample(
            fraction=suite.extraction_sample_fraction,
            seed=suite.extraction_sample_seed,
        )
    sc = features.sparkSession.sparkContext
    # Half the task slots, never more: an extraction task occupies ~2 CPUs
    # (its Python worker plus the JVM thread feeding it Arrow batches), so
    # running this stage at full slot width oversubscribes the executor
    # (measured: 33 tasks on 32 cores = 171s, 16 tasks = 35s for the same
    # work).  coalesce to a target >= current partition count is a no-op,
    # so no .rdd plan analysis (driver-serial) is needed to guard it.
    df = df.coalesce(max(2, sc.defaultParallelism // 2))

    def partials(batches):
        from audio_quality_checker_spark.functions.extract import extract_text_safe

        for pdf in batches:
            compared = []
            mismatched = []
            for html, text in zip(pdf["html"], pdf["text"]):
                # only normalize genuine byte payloads; anything else goes
                # through as-is so extract_text_safe classifies it as a
                # per-row error (poison rows must not kill the task)
                payload = (
                    bytes(html)
                    if isinstance(html, (bytes, bytearray, memoryview))
                    else html
                )
                extracted, err = extract_text_safe(payload)
                if err is None:
                    compared.append(True)
                    mismatched.append(extracted != text)
                else:
                    compared.append(False)
                    mismatched.append(False)
            out = pd.DataFrame(
                {
                    "p_day": pdf["p_day"],
                    "c": pd.Series(compared, dtype="int64"),
                    "m": pd.Series(mismatched, dtype="int64"),
                }
            )
            yield out.groupby("p_day", as_index=False).sum()

    partial = df.mapInPandas(partials, schema="p_day string, c long, m long")
    return partial.groupBy("p_day").agg(
        F.sum("c").alias("n_compared"), F.sum("m").alias("n_mismatch")
    )


def mismatch_violations(features: DataFrame, suite: CheckSuite) -> DataFrame:
    """The sampled byte-identity check.  (The ExtractionError gate now
    rides the one-pass stats aggregation — see operators/column_stats.py —
    since is_valid_utf8 counting needs no Python extraction.)"""
    pk = F.col("p_day")
    ms = mismatch_stats(features, suite)
    mis_rate = F.col("n_mismatch") / F.greatest(F.col("n_compared"), F.lit(1)).cast(
        "double"
    )
    return ms.select(
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
