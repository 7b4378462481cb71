"""Persistent ANN index: build the corpus-side similarity structures
ONCE, store them as tables, query many times.

The similarity operators (operators/similarity.py) recompute corpus
sketches / inverted-list assignments per call — right for one-shot
analytics, wrong for a serving corpus: at 10^12 vectors the BQ sketch
table (24 bytes/vector) and the IVF assignment (12 bytes/vector) are
built once and reused by every query batch, which then only sketches /
assigns ITSELF.  This module persists exactly those artifacts:

    {path}/meta/        one row: dim, n_bits, n_lists, seed
    {path}/sketches/    (vec_id, sketch, crawl_id)       BQ prefilter
    {path}/assign/      (vec_id, list_id, crawl_id)      IVF routing
    {path}/centroids/   (list_id, centroid array<double>)
    {path}/counts/      (crawl_id, n)   per-crawl vector counts

The corpus-side tables are partitioned by crawl_id so a NEW crawl can
be appended incrementally (`append_to_index`): only the new vectors
are sketched/assigned, written under their own partition with the
same deterministic partition-overwrite idempotency as
operators/crawl_state.ingest_crawl.  Centroids are FROZEN at build
time — BQ results over an appended index are bit-identical to a full
rebuild on the union (sketches are per-vector and seed-deterministic),
while IVF results are identical to a rebuild that reuses the original
centroids: appending shifts the true k-means optimum, a documented
staleness dial (re-run build_index to retrain when the appended
fraction grows large).

Everything is written through Spark (HDFS/S3-safe, no driver-local
filesystem assumptions — the plans/lineage.py rationale); centroids
and meta are KB-sized and collected on load.  Index parameters ride
the meta table so a loaded index cannot be queried with mismatched
dials.  Queries against a loaded index return BIT-IDENTICAL results to
the direct operators (same seeds, same plans — asserted in tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from audio_quality_checker_spark.operators.similarity import (
    binary_signatures,
    bq_topk,
    ivf_assign,
    ivf_topk,
    train_centroids,
)


@dataclass
class ANNIndex:
    path: str
    dim: int
    n_bits: int
    n_lists: int
    seed: int
    n_vectors: int
    sketches: DataFrame
    assign: DataFrame
    centroids: np.ndarray


BASE_CRAWL = "__base__"


def _write_corpus_tables(corpus: DataFrame, path: str, crawl_id: str,
                         dim: int, n_bits: int,
                         centroids: np.ndarray, id_col: str,
                         vec_col: str, seed: int,
                         n_vectors: int) -> None:
    """Sketch + assign `corpus` and write all three corpus-side tables
    under partition `crawl_id` (deterministic partition overwrite — a
    crashed or repeated write of the same crawl converges)."""
    from audio_quality_checker_spark.sources.catalog import (
        write_partitioned,
    )

    spark = corpus.sparkSession
    tag = F.lit(crawl_id).alias("crawl_id")
    write_partitioned(
        binary_signatures(corpus, dim, n_bits, id_col, vec_col, seed)
        .select(id_col, "sketch", tag),
        f"{path}/sketches", "crawl_id",
    )
    write_partitioned(
        ivf_assign(corpus, centroids, 1, id_col, vec_col, id_col)
        .withColumn("crawl_id", F.lit(crawl_id)),
        f"{path}/assign", "crawl_id",
    )
    write_partitioned(
        spark.createDataFrame([(crawl_id, n_vectors)],
                              "crawl_id string, n long"),
        f"{path}/counts", "crawl_id",
    )


def build_index(corpus: DataFrame, path: str, dim: int,
                n_bits: int = 192, n_lists: int = 16, seed: int = 42,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> ANNIndex:
    """Materialize the index tables for `corpus` under `path` and
    return the loaded handle.  Deterministic end-to-end; re-building
    over the same corpus overwrites with identical content."""
    spark = corpus.sparkSession
    n_vectors = corpus.count()
    cents = train_centroids(corpus, dim, n_lists, seed=seed,
                            vec_col=vec_col, id_col=id_col)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(dim, n_bits, n_lists, seed)],
        "dim int, n_bits int, n_lists int, seed long",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    _write_corpus_tables(corpus, path, BASE_CRAWL, dim, n_bits, cents,
                         id_col, vec_col, seed, n_vectors)
    return load_index(spark, path)


def append_to_index(new_corpus: DataFrame, index: ANNIndex,
                    crawl_id: str, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> ANNIndex:
    """Append a new crawl's vectors to a persisted index: ONLY the new
    vectors are sketched (seed/planes pinned by the index meta) and
    assigned (against the FROZEN stored centroids), then written under
    their own crawl partition — the index-side twin of
    crawl_state.ingest_crawl, linear in the new crawl's size.  BQ
    queries over the appended index are bit-identical to a full rebuild
    on the union; IVF queries are identical to a rebuild reusing the
    build-time centroids (see module docstring for the staleness
    trade).  Re-appending the same crawl_id overwrites its partitions
    with identical content (resume-safe)."""
    if crawl_id == BASE_CRAWL:
        raise ValueError(f"crawl_id {BASE_CRAWL!r} is reserved")
    spark = new_corpus.sparkSession
    try:
        spark.read.parquet(f"{index.path}/counts").schema
    except Exception:
        raise ValueError(
            f"index at {index.path} uses the pre-append layout (no "
            "counts/ table); it still loads for queries, but rebuild "
            "with build_index before appending crawls"
        )
    n_new = new_corpus.count()
    _write_corpus_tables(
        new_corpus, index.path, crawl_id, index.dim, index.n_bits,
        index.centroids, id_col, vec_col, index.seed, n_new,
    )
    return load_index(new_corpus.sparkSession, index.path)


def load_index(spark: SparkSession, path: str) -> ANNIndex:
    meta = spark.read.parquet(f"{path}/meta").first()
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy(
        "list_id"
    ).collect()
    centroids = np.array([r["centroid"] for r in cent_rows],
                         dtype=np.float64)
    try:
        n_vectors = sum(
            r["n"] for r in spark.read.parquet(f"{path}/counts").collect()
        )
    except Exception:
        # pre-append index layout (round-4 build_index): no counts/
        # table, n_vectors lived in meta.  Fall back so old indexes
        # still LOAD and serve queries (round-5 ADVICE: the format
        # change silently broke them); append_to_index refuses the old
        # layout explicitly rather than writing a counts/ table that
        # would cover only the new crawl.
        if "n_vectors" not in (meta.asDict() if meta else {}):
            raise
        n_vectors = meta["n_vectors"]
    return ANNIndex(
        path=path,
        dim=meta["dim"],
        n_bits=meta["n_bits"],
        n_lists=meta["n_lists"],
        seed=meta["seed"],
        n_vectors=n_vectors,
        sketches=spark.read.parquet(f"{path}/sketches"),
        assign=spark.read.parquet(f"{path}/assign"),
        centroids=centroids,
    )


def index_topk(queries: DataFrame, corpus: DataFrame, index: ANNIndex,
               k: int = 5, method: str = "bq", cand_frac: float = 0.08,
               n_probe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Top-k against a persisted index: only the QUERY batch is
    sketched/assigned; the corpus side comes from the stored tables.
    `corpus` supplies the full vectors for the exact re-rank (the index
    stores no payloads — at serving scale the vector table is the
    source of truth and the index stays small)."""
    if method == "bq":
        return bq_topk(
            queries, corpus, index.dim, k, index.n_bits, cand_frac,
            id_col, vec_col, n_corpus=index.n_vectors,
            corpus_sketches=index.sketches,
        )
    if method == "ivf":
        return ivf_topk(
            queries, corpus, index.dim, k, index.n_lists, n_probe,
            id_col, vec_col, centroids=index.centroids,
            corpus_assign=index.assign,
        )
    raise ValueError(f"unknown method {method!r} (bq|ivf)")
