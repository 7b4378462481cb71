"""Connected components / keep-one dedup: exact cluster recovery on
planted graphs, convergence on chains, union-find oracle equality."""

import pandas as pd

from audio_quality_checker_spark.operators.components import (
    connected_components,
    keep_one,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_clusters_and_chain(spark):
    # triangle {1,2,3}, chain 10-11-12-13-14 (diameter 4), pair {20,21}
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13),
             (13, 14), (20, 21)]
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == _union_find(edges)
    assert got[14] == 10 and got[3] == 1 and got[21] == 20


def test_components_matches_union_find_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    edges = [
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, 400, (300, 2))
        if a != b
    ]
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == _union_find(edges)


def test_keep_one_drops_non_representatives(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 50], "text": list("abcdez")})
    )
    kept = sorted(
        r["doc_id"]
        for r in keep_one(docs, _pairs(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    )
    # one per cluster (min id) + the isolated doc 50
    assert kept == [1, 10, 50]
