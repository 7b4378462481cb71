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
      heuristic.  The global rank is computed as a TWO-PHASE distributed
      rank (range-partitioned sort + per-partition local rank + P
      broadcast offsets) — never an unpartitioned window, which Spark
      executes by moving every row into ONE WindowExec partition.
      Serpentine bounds the max/min spread by roughly the LARGEST single
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

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


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
    global rank.  ``id_col`` must be unique (it is the document key).

    The rank is a two-phase distributed computation — Spark has no
    distributed execution for an unpartitioned ``row_number()`` window
    (WindowExec with an empty partition spec moves ALL rows into one
    partition; the round-5 build shipped exactly that funnel):

      1. ``repartitionByRange(P, desc(w), id)`` + sortWithinPartitions:
         a sampled range-partitioned global sort of the NARROW
         (id, weight) projection only — payload columns never ride the
         sort shuffle.
      2. per-partition local rank via mapInPandas (a running counter
         over the partition's Arrow batches — order-preserving, no
         extra shuffle), plus the cumulative per-partition row counts
         (P integers collected to the driver) broadcast back as a
         literal map.  global_rank = offset[partition] + local_rank.
         The rank is exact and invariant to where the sampled range
         bounds fall, because the sort key (weight desc, id asc) is a
         strict total order.
      3. the (id, shard) assignment joins back to df on the id — the
         only stage where payload columns shuffle, and it is an
         ordinary distributed hash join, not a funnel.

    Cost: one narrow range shuffle + one join-back shuffle; every stage
    is P-way parallel.  The narrow sorted frame is persisted across the
    two jobs (counts action + final evaluation) and stays persisted
    until the returned frame is evaluated — callers that are done may
    drop it via ``spark.catalog.clearCache()`` or session end; it is
    two 8-byte columns, ~16 bytes/row."""
    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or "32")
    srt = (
        df.select(F.col(id_col).alias("__sid"),
                  F.col(weight_col).alias("__w"))
        .repartitionByRange(p, F.desc("__w"), F.asc("__sid"))
        .sortWithinPartitions(F.desc("__w"), F.asc("__sid"))
        .withColumn("__pid", F.spark_partition_id())
    )
    # localCheckpoint, not persist: it pins the sampled range bounds
    # across the two jobs the same way, and its blocks are released
    # by the ContextCleaner once the frame is unreferenced — persist
    # registered the frame in the CacheManager forever (the round-6
    # ADVICE leak: repeated calls in a long session accumulate
    # cached frames no caller holds a handle to)
    srt = srt.localCheckpoint()
    counts = {
        r["__pid"]: r["n"]
        for r in srt.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df.withColumn("shard", F.lit(0).cast("int"))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = [StructField(f.name, f.dataType, f.nullable) for f in srt.schema.fields]
    out_schema = StructType(fields + [StructField("__lrank", LongType(), False)])

    def _local_rank(batches):
        base = 0
        for pdf in batches:
            pdf = pdf.assign(
                __lrank=np.arange(base, base + len(pdf), dtype="int64"))
            base += len(pdf)
            yield pdf

    ranked = srt.mapInPandas(_local_rank, schema=out_schema)
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    rank = F.element_at(offset_map, F.col("__pid")) + F.col("__lrank")
    cycle = rank % (2 * n_shards)
    shard = F.when(cycle < n_shards, cycle).otherwise(2 * n_shards - 1 - cycle)
    assign = ranked.select("__sid", shard.cast("int").alias("shard"))
    return df.join(
        assign, F.col(id_col) == F.col("__sid"), "inner"
    ).drop("__sid")


def shard_balance_report(df: DataFrame,
                         weight_col: str = "bpe_tokens") -> DataFrame:
    """(shard, n_docs, total_weight) + the relative imbalance columns a
    pipeline logs per write: weight_frac and its deviation from the
    ideal 1/n.  Grand totals come from a broadcast 1-row aggregate, not
    an empty-partition window (same single-partition warning class as
    the old shard_by_weight, cosmetic at 8 rows but free to avoid)."""
    totals = df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("total_weight"),
    )
    grand = totals.agg(
        F.sum("total_weight").alias("__gw"),
        F.count(F.lit(1)).alias("__gn"),
    )
    return totals.crossJoin(F.broadcast(grand)).select(
        "shard", "n_docs", "total_weight",
        F.round(F.col("total_weight") / F.col("__gw"), 6).alias("weight_frac"),
        F.round(
            F.abs(F.col("total_weight") / F.col("__gw") - 1.0 / F.col("__gn"))
            * F.col("__gn"), 6
        ).alias("rel_imbalance"),
    ).orderBy("shard")
