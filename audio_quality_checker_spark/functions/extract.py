"""The pinned html -> text extraction kernel.

This is the engine's ``decode_audio`` (decoder.rs:38-162): the trusted
transformation every downstream check builds on.  The reference decodes
bytes to normalized f32 samples with corrupt frames skipped, never fatal
(decoder.rs:138-143); here we decode ``html: binary`` to extracted
``text: string`` with per-row error capture — a malformed document yields
``(null text, error string)`` and later a violation row, never a task
failure (a poison row must not kill a 10^12-row job).

THE CONTRACT (BASELINE.json input_hint): extracted text is byte-identical
per url between this function and the engine's Arrow UDF, asserted by
pytest.  To make that hold across environments the algorithm is
hand-written pure Python on ``re`` + ``str`` only — no html library whose
parsing may drift between versions.  Do not "improve" the extraction
without versioning it: EXTRACTOR_VERSION participates in lineage.

Algorithm (fixed):
  1. strict UTF-8 decode (invalid bytes -> ExtractionError)
  2. drop <!-- comments -->, <script>...</script>, <style>...</style>
  3. block-level open/close tags emit '\\n'; all other tags emit ''
  4. unescape the fixed entity set &amp; &lt; &gt; &quot; &#39; &apos;
     &nbsp; and numeric &#NNN; / &#xHH; (BMP only)
  5. collapse runs of spaces/tabs, strip line edges, collapse blank
     lines, strip the ends
"""

import re

import pandas as pd

EXTRACTOR_VERSION = 1

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.DOTALL | re.IGNORECASE)

_BLOCK_TAGS = (
    "p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|td|th|table|title|header|"
    "footer|section|article|blockquote|pre|nav|aside|main|figure|figcaption"
)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:%s)\b[^>]*>" % _BLOCK_TAGS, re.IGNORECASE
)
_ANY_TAG_RE = re.compile(r"<[^>]*>")
_NUM_ENTITY_RE = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
_BLANKLINE_RE = re.compile(r"\n{2,}")


class ExtractionError(ValueError):
    """Raised for undecodable or structurally hopeless input bytes."""


def _unescape_numeric(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
    except ValueError:
        return m.group(0)
    if 0 < cp <= 0xFFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return m.group(0)


def extract_text(html: bytes) -> str:
    """Pinned reference implementation. See module docstring for the spec.

    Raises ExtractionError on non-UTF-8 input or non-bytes input.
    """
    if not isinstance(html, (bytes, bytearray)):
        raise ExtractionError(f"expected bytes, got {type(html).__name__}")
    stripped = _STYLE_RE.sub(b"", _SCRIPT_RE.sub(b"", _COMMENT_RE.sub(b"", bytes(html))))
    try:
        s = stripped.decode("utf-8", errors="strict")
    except UnicodeDecodeError as e:
        raise ExtractionError(f"invalid utf-8 at byte {e.start}") from e
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub("", s)
    if "&" in s:  # entity passes only when an ampersand exists (pure perf)
        for ent, ch in _NAMED_ENTITIES.items():
            if ent in s:
                s = s.replace(ent, ch)
        if "&#" in s:
            s = _NUM_ENTITY_RE.sub(_unescape_numeric, s)
    s = _HSPACE_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    if "\n\n" in s:
        s = _BLANKLINE_RE.sub("\n", s)
    return s.strip()


def extract_text_safe(html) -> "tuple[str | None, str | None]":
    """(text, error) pair — the corrupt-frame-skip analog (decoder.rs:138-143)."""
    if html is None:
        return None, "null html payload"
    try:
        return extract_text(html), None
    except ExtractionError as e:
        return None, str(e)


# ---------------------------------------------------------------------------
# Spark surface: one Arrow-batched pandas UDF returning a struct, so one
# pass over the binary column yields both the extracted text and the
# per-row error — never a task failure.
# ---------------------------------------------------------------------------

def extraction_udf():
    """Returns a pandas_udf: html binary -> struct<text string, error string>.

    Built lazily so importing this module never needs a JVM (the pinned
    pure-Python `extract_text` above is also the pytest oracle).
    """
    from pyspark.sql import functions as F

    @F.pandas_udf("text string, error string")
    def _extract(html: pd.Series) -> pd.DataFrame:
        pairs = [extract_text_safe(h) for h in html]
        return pd.DataFrame(pairs, columns=["text", "error"])

    return _extract


def with_extracted_text(df, html_col: str = "html", out_prefix: str = "extracted_"):
    """df + (out_prefix+'text', out_prefix+'error') columns via one Arrow pass."""
    from pyspark.sql import functions as F

    struct_col = extraction_udf()(F.col(html_col))
    return (
        df.withColumn("_ex", struct_col)
        .withColumn(out_prefix + "text", F.col("_ex.text"))
        .withColumn(out_prefix + "error", F.col("_ex.error"))
        .drop("_ex")
    )
