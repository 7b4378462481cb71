"""Skew handling: salted aggregation for pathological hot keys.

North rule: "salted repartitioning for skewed hosts".  AQE's skew-join
splitting covers JOIN skew, but a groupBy over a host where one site owns
40% of a crawl slice (the SkewHost fixture) still funnels that key's rows
into one reducer.  Partial (map-side) aggregation usually absorbs it —
Spark's hash agg combines locally before the shuffle — so salting is the
EXPLICIT fallback for aggregations whose partial state is large (e.g.
collect_list, exact distinct) or whose combine ratio is poor.

Pattern: two-level aggregation.
  stage 1: groupBy(key, salt = pmod(hash(row-unique), n_salts)) -> partial
  stage 2: groupBy(key) -> merge partials
Any algebraic aggregate (count/sum/min/max, and sketches: HLL, KLL,
Bloom — the mergeability requirement again) composes this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt",
              unique_col: str | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of a row-unique column
    (falls back to monotonically_increasing_id for unkeyed rows — then the
    salt is partition-stable, not resume-stable; pass a real unique column
    for reproducible plans)."""
    src = F.col(unique_col) if unique_col else F.monotonically_increasing_id()
    return df.withColumn(salt_col, F.pmod(F.xxhash64(src), F.lit(n_salts)))


def salted_agg(df: DataFrame, key: str, aggs: dict[str, tuple],
               n_salts: int = 16, unique_col: str | None = None) -> DataFrame:
    """Two-level salted aggregation.

    ``aggs`` maps output column name -> (partial_expr, merge_fn):

    - ``partial_expr`` is a BOUND Column aggregate expression evaluated
      per (key, salt) — e.g. ``F.count(F.lit(1))``, ``F.sum("bytes")``,
      ``F.max("n_chars")`` — not a bare function.
    - ``merge_fn`` is a callable applied to the partial column NAME per
      key: the algebraic merge — ``F.sum`` for count/sum partials,
      ``F.max`` for max partials, ``F.min`` for min partials.

    e.g. ``{"n_rows": (F.count(F.lit(1)), F.sum),
            "max_chars": (F.max("n_chars"), F.max)}``
    (exercised verbatim by tests/test_skew.py::test_salted_agg_doc_contract).
    """
    salted = with_salt(df, n_salts, unique_col=unique_col)
    partial_exprs = [
        partial_fn.alias(out) for out, (partial_fn, _) in aggs.items()
    ]
    partials = salted.groupBy(key, "_salt").agg(*partial_exprs)
    merge_exprs = [
        merge_fn(out).alias(out) for out, (_, merge_fn) in aggs.items()
    ]
    return partials.groupBy(key).agg(*merge_exprs)


def host_counts_salted(features: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host row counts immune to a 40%-hot host: the SkewHost fixture's
    exercise path.  count partials sum-merge."""
    return salted_agg(
        features.select("host", "url"),
        key="host",
        aggs={"n_rows": (F.count(F.lit(1)), F.sum)},
        n_salts=n_salts,
        unique_col="url",
    )


def topk_per_key(df: DataFrame, key: str, order_col: str, k: int,
                 tiebreak: str) -> DataFrame:
    """Unsalted top-k per key: one Window sort per key — the TRUE skew
    victim.  Unlike groupBy aggregates (map-side partial combine absorbs
    hot keys) and count_distinct (the planner's two-phase expand spreads
    the hot key by value), a Window partitionBy(key) puts EVERY row of a
    hot key into one task: a host owning 40% of a 10M-row corpus means
    one task sorts 4M rows while the rest idle.  Kept as the A-side of
    the skew bench; `salted_topk` is the production path."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def salted_topk(df: DataFrame, key: str, order_col: str, k: int,
                tiebreak: str, n_salts: int = 16) -> DataFrame:
    """Two-level salted top-k: per-(key, salt) top-k first (hot key's
    rows split across n_salts tasks), then top-k over the <= n_salts * k
    survivors per key.  Exact — the global top-k of a key is a subset of
    the union of its per-salt top-k — and the stage-2 window only ever
    sorts n_salts * k rows per key, whatever the skew."""
    from pyspark.sql import Window as W

    salted = with_salt(df, n_salts, unique_col=tiebreak)
    w1 = W.partitionBy(key, "_salt").orderBy(
        F.desc(order_col), F.asc(tiebreak)
    )
    stage1 = (
        salted.withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= k)
    )
    w2 = W.partitionBy(key).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        stage1.drop("_rk", "_salt")
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
