"""Chunked per-row expansion: one long payload row -> many bounded rows.

Heir of the reference's fixed-size chunk iteration (true_peak.rs:104-117:
process a long signal 4096 samples at a time so peak state stays bounded),
re-expressed as the operator a training-data pipeline actually needs:
split documents into fixed token windows (with overlap) as ROWS, so every
downstream stage sees bounded-size units regardless of how long the
source document is.

Everything is built from JVM expressions (split / sequence / transform /
slice / array_join / posexplode) inside whole-stage codegen — no UDF, no
Python, no driver involvement; Catalyst prunes untouched columns and the
explode streams, so peak memory per task is one source row plus one
output batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    The final window is the remainder (>= 1 token); empty/null documents
    produce zero rows (explode of an empty array), matching the drop-empty
    predicate semantics of the extraction path.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )

    def windows(tok_col: Column) -> Column:
        n = F.size(tok_col)
        # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
        extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
        n_win = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
        return F.when(n == 0, F.array().cast("array<array<string>>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda i: F.slice(tok_col, i * stride + 1, chunk_tokens),
            )
        )

    chunked = df.select(
        id_col, windows(toks).alias("_wins")
    ).select(
        id_col,
        F.posexplode("_wins").alias("chunk_idx", "_win"),
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.array_join("_win", " ").alias("chunk_text"),
        F.size("_win").alias("n_tokens"),
    )


def chunk_bytes(df: DataFrame, id_col: str = "asset_id",
                payload_col: str = "payload",
                chunk_size: int = 65_536) -> DataFrame:
    """(id, chunk_idx, chunk binary, n_bytes): fixed-size binary chunks —
    the literal true_peak.rs shape for opaque payloads (ship a huge blob
    to per-chunk kernels without any single task row exceeding
    ``chunk_size``).  substring() operates on BinaryType JVM-side."""
    n = F.length(F.col(payload_col))
    n_chunks = F.ceil(n / F.lit(chunk_size)).cast("int")
    idx = F.when(n.isNull() | (n == 0), F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks - 1)
    )
    exploded = df.select(
        id_col, payload_col, F.posexplode(idx).alias("chunk_idx", "_i")
    )
    chunk = F.expr(
        f"substring({payload_col}, _i * {chunk_size} + 1, {chunk_size})"
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).alias("n_bytes"),
    )
