"""Connected components over near-dup pair edges -> dedup groups.

The last stage of a corpus-dedup pipeline: pair edges (from exact hash
groups, MinHash/SimHash banding, or the guarded hybrid) define a graph
whose connected components are the duplicate clusters; keep one
representative per cluster and the corpus is deduplicated.

Algorithm: iterative minimum-label propagation on DataFrames —
  label(v) <- min(label(v), min over neighbors label(u))
repeated until a fixpoint.  Each round is one join + one groupBy
(shuffle on the vertex id); rounds needed = graph diameter, which for
dup clusters is small (near-dup clusters are dense balls, not paths).
A hard iteration cap guards pathological chains; convergence is
detected with a changed-label count (an action per round — inherent to
iterative fixpoints, same shape as Pregel supersteps).  Each round's
labels are `localCheckpoint`ed: persist alone keeps the FULL logical
lineage, so analysis time grows with every round and dominates within
~10 iterations (measured) — truncation keeps plans flat.  On a cluster
with executor-loss concerns, swap in reliable `checkpoint()` with a
checkpoint dir; the algorithm is unchanged.

At 10^12 docs the label frame is (doc_id, component) — two longs — and
every round is a pair of hash shuffles on it; no step materializes
anything bigger than the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(doc_id, component): component = min doc_id reachable via pair
    edges.  `pairs` needs columns id_a, id_b; vertices are every id
    appearing in any pair (isolated docs are absent — callers union
    them back with component = own id, see `keep_one`)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
    )
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("component").alias("n_comp"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("n_comp", "component")
                ).alias("component"),
            )
            .localCheckpoint()  # eager + lineage truncation
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def keep_one(docs: DataFrame, pairs: DataFrame,
             id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: one representative (minimum id) per
    duplicate cluster, plus every document that appears in no pair.
    Anti-join shape: drop ids whose component label is not their own."""
    comps = connected_components(pairs)
    losers = comps.where(F.col("component") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
