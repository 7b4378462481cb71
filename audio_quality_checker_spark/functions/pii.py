"""PII scrubbing — mask emails, phone numbers and IPv4 addresses in a
text column with sentinel tokens: the privacy pass every public
training-data pipeline runs before a corpus is released or trained on
(C4 filters lines against a blocklist; Dolma masks emails/phones/IPs
with sentinel tokens — this module follows Dolma's mask-in-place
shape, which preserves document structure for downstream filters).
(The reference's analog is normalize-at-ingest: every payload is
rewritten to one canonical representation before any analysis sees it,
decoder.rs:19 — here the canonical representation is text with PII
replaced by typed sentinels.)

Patterns are deliberately restricted to the regex subset with
IDENTICAL semantics in Java regex (Spark executors) and RE2 (the
DuckDB oracle): character classes, bounded repetition, alternation
and ASCII ``\\b`` word boundaries — no lookarounds, no backreferences,
no unicode classes.  Both engines use leftmost-first alternation, so
counts and replacements agree byte-for-byte and the driver can
value-match the query end-to-end.

100-TB story: ``regexp_replace`` / ``regexp_count`` are JVM-side
whole-stage-codegen expressions — the scrub is a map-only pass over
the text column with no shuffle, no UDF, no Python worker; it fuses
into whatever scan feeds it and scales with input splits.

Precision stance: patterns are tuned for crawl-scale recall on
well-formed PII (the kind that must not reach a training set), not for
exhaustive obfuscated-PII forensics.  False-positive exposure is
bounded by requiring separators in phone numbers and dotted quads for
IPs; pure digit runs, version strings like ``1.2.3`` (only 3 groups)
and prose never match.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Scrub ORDER matters and is fixed: emails first (their local/domain
# parts may contain digits and dots that the other patterns could
# partially claim), then IPv4 dotted quads, then phones.  Sentinels
# contain no digits or '@'/'.' runs, so later passes never re-match
# earlier replacements and the scrub is idempotent.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international (+CC NNN sep NNN sep NNNN) or US-style
    # NNN sep NNN sep NNNN; a separator is REQUIRED between groups so
    # plain digit runs (ids, years, counters) never match
    ("phone",
     r"\+\d{1,2}[ .-]\d{3}[ .-]\d{3}[ .-]\d{4}"
     r"|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
)


def pii_count_cols(col: str | Column) -> dict[str, Column]:
    """Per-kind occurrence counts (LongType) for one text column —
    computed on the UNscrubbed text; use for reporting/gating."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def scrub_pii_col(col: str | Column) -> Column:
    """Text with every PII match replaced by its sentinel, applied in
    the fixed PII_PATTERNS order.  Pure Catalyst; idempotent."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def residual_pii_col(col: str | Column) -> Column:
    """Total PII occurrences remaining in an (already scrubbed) text
    column — the zero-assertion a pipeline writes next to its output."""
    counts = pii_count_cols(col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return total
