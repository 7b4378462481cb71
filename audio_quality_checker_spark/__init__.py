"""audio_quality_checker_spark — a PySpark-native schema + constraint
validation engine over Common-Crawl-style web pages.

Re-imagines the per-file quality gates of the reference engine
(``audiocheckr`` v0.2.4, Rust — see /root/reference) as distributed
schema/constraint/drift checks over a ``pages`` table:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

The central analogy (SURVEY.md):

    one audio file            -> one table partition (crawl day)
    decode_audio              -> html -> text extraction kernel (Arrow UDF)
    analysis module           -> a Check (column stats / uniqueness /
                                 referential / drift / extraction identity)
    DetectedDefect            -> a violation row
    QualityReport.is_likely_lossless -> per-partition pass/fail verdict
    quality_score penalty fold -> per-partition score exp(sum(ln(1-p*c)))

Everything heavy is a DataFrame aggregation or a vectorized pandas/Arrow
UDF; there is no per-row Python anywhere on the hot path.
"""

__version__ = "0.1.0"

from audio_quality_checker_spark.config import CheckSuite  # noqa: F401
