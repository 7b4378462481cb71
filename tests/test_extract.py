"""Extraction kernel tests — layer 1 micro-fixtures (dsp.rs:553-586 style)
plus THE invariant: byte-identical text per url between the Arrow UDF and
the pinned pure-Python oracle (BASELINE.json input_hint)."""

import pytest

from audio_quality_checker_spark.functions.extract import (
    ExtractionError,
    extract_text,
    extract_text_safe,
    with_extracted_text,
)


def test_basic_tags_and_blocks():
    html = b"<html><body><p>one two</p><p>three</p></body></html>"
    assert extract_text(html) == "one two\nthree"


def test_entities_unescaped():
    assert extract_text(b"<p>Q&amp;A &lt;x&gt; &quot;y&quot; &#39;z&#39; &#65;&#x42;</p>") == (
        'Q&A <x> "y" \'z\' AB'
    )


def test_script_style_comments_dropped():
    html = (
        b"<p>keep</p><script>drop();</script><style>p{}</style>"
        b"<!-- gone --><p>also</p>"
    )
    assert extract_text(html) == "keep\nalso"


def test_whitespace_collapsed():
    assert extract_text(b"<p>a   b\t c</p>\n\n\n<p>  d  </p>") == "a b c\nd"


def test_inline_tags_no_break():
    assert extract_text(b"<p>a <b>bold</b> <i>i</i>!</p>") == "a bold i!"


def test_invalid_utf8_raises():
    with pytest.raises(ExtractionError):
        extract_text(b"<p>\xff\xfe</p>")


def test_safe_never_raises():
    assert extract_text_safe(None) == (None, "null html payload")
    text, err = extract_text_safe(b"\xff")
    assert text is None and "utf-8" in err
    text, err = extract_text_safe(b"<p>hi</p>")
    assert (text, err) == ("hi", None)


def test_non_bytes_rejected():
    with pytest.raises(ExtractionError):
        extract_text("a string")  # type: ignore[arg-type]


def test_numeric_entity_edge_cases():
    assert extract_text(b"<p>&#0; &#xD800; &#1114112;</p>") == "&#0; &#xD800; &#1114112;"


def test_udf_byte_identity_with_oracle(spark, golden):
    """The decode contract: UDF output == pinned oracle, byte for byte,
    for every row of the golden corpus including malformed ones.
    Compared row-aligned (urls are deliberately non-unique in the DupUrl
    category, so keying by url would collide)."""
    rows = with_extracted_text(golden["pages"].select("url", "html")).collect()
    assert len(rows) > 0
    for row in rows:
        otext, oerr = extract_text_safe(row["html"])
        assert row["extracted_text"] == otext, f"mismatch at {row['url']}"
        assert (row["extracted_error"] is None) == (oerr is None)


def test_udf_handles_malformed_without_task_failure(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"url": ["a", "b"], "html": [b"<p>ok</p>", b"\xff\xfe broken"]}
    )
    out = with_extracted_text(spark.createDataFrame(pdf)).collect()
    by_url = {r["url"]: r for r in out}
    assert by_url["a"]["extracted_text"] == "ok"
    assert by_url["b"]["extracted_text"] is None
    assert by_url["b"]["extracted_error"] is not None
