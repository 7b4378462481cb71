"""Token-balanced output sharding — the write side of a training-data
pipeline: N shards whose total token weights are close to equal, so
every downstream reader (tokenizer worker, training host) gets the same
amount of work.

Two deterministic strategies, chosen by what the scale affords:

  shard_by_hash(df, n)          — shard = xxhash64(id) mod n.  Zero
      shuffle beyond the write itself, layout-invariant, and by
      concentration the relative imbalance is O(sqrt(n / rows)) — at a
      million docs per shard, well under 1%.  The 10^12-scale default.

  shard_by_weight(df, n, w)     — serpentine (boustrophedon) placement:
      rank all docs by weight descending, then fold the rank over the
      shards (0..n-1, n-1..0, ...), the classic balanced-partition
      heuristic.  Costs one global sort of (weight, id) pairs — narrow
      columns, so a range-partitioned sort, not a single reducer — and
      bounds the max/min spread by roughly the LARGEST single
      document's weight: every 2n-rank cycle adds one item to each
      shard with adjacent weights, so imbalance accumulates only from
      within-cycle weight differences, telescoping to O(max item).
      Hash assignment has no such bound — it can stack several giant
      documents on one shard.  When even tighter balance is needed,
      lower the max item first (operators/chunking.py splits oversized
      docs), then shard.

Both return df + `shard int`; write with
``df.write.partitionBy("shard")`` (or pass to repartition(n, "shard")
first to get exactly one file per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def shard_by_hash(df: DataFrame, n_shards: int,
                  id_col: str = "doc_id") -> DataFrame:
    """df + shard = xxhash64(id) mod n — deterministic, shuffle-free,
    O(sqrt) balance; the corpus-scale default."""
    return df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int"),
    )


def shard_by_weight(df: DataFrame, n_shards: int,
                    weight_col: str = "bpe_tokens",
                    id_col: str = "doc_id") -> DataFrame:
    """df + shard via serpentine placement over the weight-descending
    rank.  The rank window has no partitionBy, but the sort underneath
    is a RANGE-partitioned global sort of two narrow columns (Spark
    samples range bounds), not a single-reducer window: the window
    function itself is rank-arithmetic only, and Catalyst evaluates
    row_number on the globally-sorted runs.  For truly unbounded inputs
    prefer shard_by_hash."""
    rank = F.row_number().over(
        W.orderBy(F.desc(weight_col), F.asc(id_col))
    ) - 1
    cycle = rank % (2 * n_shards)
    shard = F.when(
        cycle < n_shards, cycle
    ).otherwise(2 * n_shards - 1 - cycle)
    return df.withColumn("shard", shard.cast("int"))


def shard_balance_report(df: DataFrame,
                         weight_col: str = "bpe_tokens") -> DataFrame:
    """(shard, n_docs, total_weight) + the relative imbalance columns a
    pipeline logs per write: weight_frac and its deviation from the
    ideal 1/n."""
    totals = df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("total_weight"),
    )
    grand = F.sum("total_weight").over(W.partitionBy())
    n = F.count(F.lit(1)).over(W.partitionBy())
    return totals.select(
        "shard", "n_docs", "total_weight",
        F.round(F.col("total_weight") / grand, 6).alias("weight_frac"),
        F.round(
            F.abs(F.col("total_weight") / grand - 1.0 / n) * n, 6
        ).alias("rel_imbalance"),
    ).orderBy("shard")
