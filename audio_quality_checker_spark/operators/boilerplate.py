"""Line-level boilerplate dedup — remove lines that repeat across many
DOCUMENTS (nav menus, cookie banners, copyright footers): the
paragraph/line pass a webtext pipeline runs alongside document-level
dedup (C4 deduplicates three-sentence spans across the corpus; Dolma
drops paragraphs by duplicate count — this follows the line-granular
shape).  Doc-level MinHash can NEVER catch this: two pages sharing a
nav menu are not near-duplicates of each other, but the menu must
still not be trained on thousands of times.
(Reference analog: the per-window repeated-content checks inside one
file, dsp.rs:267-292 — lifted across documents, where "repeated" means
document frequency, not in-file frequency.)

100-TB story, stage by stage:
  1. explode docs into (doc, pos, line) — map-only, fuses into the scan
  2. document frequency per distinct line: dropDuplicates on
     (line_hash, doc) then count per line_hash — both shuffles hash-
     partition on line_hash, AQE coalesces them into one exchange
     reuse; partial (map-side) aggregation bounds the shuffle at one
     row per distinct (line, doc) pair
  3. boilerplate set = lines with doc_freq >= threshold — tiny relative
     to the corpus (it IS the repeated content), joined back with a
     shuffle hash join on line_hash (never a broadcast assumption:
     at crawl scale the boiler set can still be millions of lines)
  4. reconstruct each doc from its surviving lines — one shuffle on
     doc id, order restored exactly via the captured position
No stage is quadratic, no driver collect, no Python worker: the whole
pipeline is Catalyst exprs over xxhash64 line keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# xxhash64 seed for line keys; a salt column keeps planted-collision
# tests honest without changing the production path
_LINE_SEED = 1315423911


def line_doc_freq(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  line_sep: str = "\n") -> DataFrame:
    """(line_hash, line, doc_freq): how many DISTINCT documents contain
    each non-empty (after trim) line.  The profiling half of the pass —
    also useful standalone as a boilerplate report."""
    lines = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(F.split(F.col(text_col), line_sep)).alias("line"),
        )
        .where(F.trim("line") != "")
        .select(
            "_doc", "line",
            F.xxhash64("line", F.lit(_LINE_SEED)).alias("line_hash"),
        )
    )
    return (
        lines.dropDuplicates(["line_hash", "_doc"])
        .groupBy("line_hash")
        .agg(
            F.first("line").alias("line"),
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
        )
    )


def remove_boilerplate_lines(df: DataFrame, min_doc_freq: int = 3,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             line_sep: str = "\n") -> DataFrame:
    """Input frame with ``text_col`` rebuilt WITHOUT lines appearing in
    >= min_doc_freq distinct documents, plus ``n_lines_removed``.
    Line order is restored exactly; docs whose every line is
    boilerplate come back with empty text (callers drop them with the
    usability gate).  Empty/whitespace-only lines are never counted as
    boilerplate and are preserved verbatim (they are structure, not
    content)."""
    if min_doc_freq < 2:
        raise ValueError("min_doc_freq < 2 would remove every line")
    boiler = (
        line_doc_freq(df, id_col, text_col, line_sep)
        .where(F.col("doc_freq") >= min_doc_freq)
        .select("line_hash")
    )
    exploded = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "pos", "line"
        ),
    ).withColumn(
        "line_hash",
        F.when(
            F.trim("line") != "",
            F.xxhash64("line", F.lit(_LINE_SEED)),
        ),
    )
    survivors = exploded.join(boiler, "line_hash", "left_anti")
    rebuilt = survivors.groupBy("_doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            line_sep,
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), line_sep))
    return (
        df.withColumn("_n_lines", n_lines)
        .join(rebuilt, F.col(id_col) == F.col("_doc"), "left")
        .select(
            *[c for c in df.columns if c != text_col],
            # a doc whose EVERY line was boilerplate has no survivor
            # rows at all — rebuild as empty, removal count = n_lines
            F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
            (
                F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long").alias("n_lines_removed"),
        )
    )
