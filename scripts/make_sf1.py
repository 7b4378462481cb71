"""Deterministic x10 scale-up of the driver's sf0.1 tables -> "sf1".

The driver ships sf{0.001,0.01,0.1}; the growth-ratio bench needs one
scale factor further to expose super-linear queries.  This script builds
it by replication, workload-preserving by construction:

- relational tables: 10 replicas with key offsets (FK-consistent:
  lineitem/orders/customer/part/supplier keys all shift together), so
  join selectivities and group cardinalities per key stay identical and
  total work should scale ~linearly.
- documents: doc_id offset + 50% token salting per replica (every 2nd
  token becomes a replica-unique token, n_chars recomputed).  Replicas
  are therefore NOT near-duplicates of each other (token-set jaccard
  ~0.33 < the 0.5 thresholds; simhash far outside radius), so pair
  outputs grow with the x10 rows, not quadratically with replica count —
  the same dup-structure per replica as sf0.1.
- embeddings: vec_id offset + circular np.roll of the vector by 7*rep
  dims (norm- and distribution-preserving, decorrelates replicas).  The
  fixed ANN query set (vec_id < 20) stays replica-0 only, so query count
  is constant while the corpus grows x10.
- region/nation: tiny dimensions, copied as-is.

Usage: python3 scripts/make_sf1.py [--src /root/testdata/sf0.1]
                                   [--out /dev/shm/aqcs_sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10_000_000  # per-replica key offset, far above any sf0.1 key

N_FILES = 16  # payload tables are written as multi-file directories


def write_sliced(tbl: "pa.Table", path: str, n_files: int = N_FILES):
    """Write a table as a DIRECTORY of n_files parquet slices (small
    row groups).  A single-file single-row-group layout caps every
    Spark scan at ~1 task regardless of maxPartitionBytes (parquet
    cannot split below row-group boundaries) — measured round 6: the
    sf1 text queries ran 2 tasks on 32 cores.  A real crawl-scale
    table is thousands of files; the fixture should look like one."""
    if os.path.isfile(path):      # pre-slicing single-file layout
        os.remove(path)
    elif os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path)
    step = (tbl.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        sl = tbl.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(
                sl, f"{path}/part-{i:04d}.parquet", row_group_size=8192
            )

RELATIONAL = {
    "lineitem": ["l_orderkey + {o} AS l_orderkey",
                 "l_partkey + {o} AS l_partkey",
                 "l_suppkey + {o} AS l_suppkey",
                 "l_linenumber", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                 "l_shipdate"],
    "orders": ["o_orderkey + {o} AS o_orderkey",
               "o_custkey + {o} AS o_custkey",
               "o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"],
    "customer": ["c_custkey + {o} AS c_custkey", "c_name", "c_nationkey",
                 "c_acctbal", "c_mktsegment"],
    "part": ["p_partkey + {o} AS p_partkey", "p_name", "p_brand", "p_type",
             "p_size", "p_retailprice"],
    "supplier": ["s_suppkey + {o} AS s_suppkey", "s_name", "s_nationkey",
                 "s_acctbal"],
    "events": ["event_id + {o} AS event_id", "ts",
               "user_id + {o} AS user_id", "event_type", "value", "props"],
}

COPY_AS_IS = ["region", "nation"]


def salt_text(text: str, rep: int) -> str:
    if rep == 0 or text is None:
        return text
    toks = text.split(" ")
    for j in range(1, len(toks), 2):
        toks[j] = f"q{rep}z{j % 97}"
    return " ".join(toks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/dev/shm/aqcs_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")

    for t, cols in RELATIONAL.items():
        sel = ", ".join(c.format(o=f"(r.r * {OFF})") for c in cols)
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{args.src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({args.factor})) AS r) r) "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)

    # documents: token salting per replica
    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{args.src}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for rep in range(args.factor):
        for doc_id, text, lang, source in docs:
            t = salt_text(text, rep)
            out["doc_id"].append(doc_id + rep * OFF)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t) if t is not None else None)
    tbl = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    write_sliced(tbl, f"{args.out}/documents.parquet")
    print("documents", tbl.num_rows)

    # embeddings: circular roll per replica
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{args.src}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vec_ids, vecs, labels = [], [], []
    for rep in range(args.factor):
        for vec_id, v, label in emb:
            arr = np.asarray(v, dtype=np.float32)
            vec_ids.append(vec_id + rep * OFF)
            vecs.append(np.roll(arr, 7 * rep).tolist())
            labels.append(label)
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    write_sliced(tbl, f"{args.out}/embeddings.parquet")
    print("embeddings", tbl.num_rows)
    print(f"sf1 written to {args.out}")


if __name__ == "__main__":
    main()
