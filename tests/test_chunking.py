"""Chunked per-row expansion: window math, overlap, edges, binary chunks
(true_peak.rs:104-117 analog — bounded units from unbounded payloads)."""

import pandas as pd

from audio_quality_checker_spark.operators.chunking import (
    chunk_bytes,
    chunk_documents,
)


def test_chunk_documents_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(25)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [" ".join(toks)]})
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=10, overlap=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 6: windows at 0, 6, 12, 18 -> 1 + ceil((25-10)/6) = 4
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"].split() == toks[0:10]
    assert rows[1]["chunk_text"].split() == toks[6:16]
    assert rows[3]["chunk_text"].split() == toks[18:25]  # remainder window
    assert rows[3]["n_tokens"] == 7
    # every consecutive pair overlaps by exactly `overlap` tokens
    assert rows[0]["chunk_text"].split()[-4:] == rows[1]["chunk_text"].split()[:4]


def test_chunk_documents_edges(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["short doc", None, "   "]}
        )
    )
    rows = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    # doc 1: one window (shorter than chunk); null/blank docs: zero rows
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1
    assert rows[0]["chunk_text"] == "short doc"
    assert rows[0]["n_tokens"] == 2


def test_chunk_bytes_reassembles(spark):
    payload = bytes(range(256)) * 5  # 1280 bytes
    df = spark.createDataFrame(
        pd.DataFrame({"asset_id": [7], "payload": [payload]})
    )
    rows = sorted(
        chunk_bytes(df, chunk_size=500).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_bytes"] for r in rows] == [500, 500, 280]
    assert b"".join(bytes(r["chunk"]) for r in rows) == payload
