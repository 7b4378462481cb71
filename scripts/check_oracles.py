"""Local emulation of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive value hash.

Usage: python3 scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-robust float format: repr of rounded value
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime,)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def pandas_dtype_sig(sdf, duck_rel) -> tuple[str, str]:
    """Emulate the driver's pandas fetch path: DuckDB HUGEINT (e.g. sum of
    ints) becomes float64 in pandas while Spark bigint stays int64, which
    hash-mismatches even when fetchall() values are equal (round-1 lesson:
    column_stats/flux/token_budget).  Returns sorted (col:dtype) signatures
    for both sides so the divergence is caught locally."""
    sp = sdf.toPandas()
    dp = duck_rel.df()

    def klass(dt) -> str:
        s = str(dt)
        # int32 vs int64 / datetime64[ns] vs [us] stringify identically, so the
        # driver hash does not care — only the int/float/other class matters.
        if s.startswith(("int", "uint")):
            return "int"
        if s.startswith("float"):
            return "float"
        if s.startswith("datetime"):
            return "datetime"
        return "object"

    sig = lambda df: ",".join(  # noqa: E731
        f"{c}:{klass(df[c].dtype)}" for c in sorted(df.columns)
    )
    return sig(sp), sig(dp)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from audio_quality_checker_spark.entry_queries import REGISTRY, TABLES
    from audio_quality_checker_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:24s} SPARK ERROR: {str(e)[:140]}")
            continue
        if sql is None:
            print(f"{name:24s} rows={len(s_rows):6d}  (no oracle — rows-only)")
            continue
        try:
            res = con.sql(sql)
            d_cols = [c for c in res.columns]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:24s} DUCKDB ERROR: {str(e)[:140]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if not problems:
            sig_s, sig_d = pandas_dtype_sig(sdf, con.sql(sql))
            if sig_s != sig_d:
                problems.append(f"pandas dtypes {sig_s} != {sig_d}")
        if not problems:
            h_s = value_hash(s_rows, s_cols)
            h_d = value_hash(d_rows, d_cols)
            if h_s != h_d:
                problems.append("value-hash mismatch")
                # print first differing normalized line to aid debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("\x1f".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("\x1f".join(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"   spark : {a[:160]}")
                        print(f"   duckdb: {b[:160]}")
                        break
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name:24s} FAIL  {'; '.join(problems)}")
        else:
            print(f"{name:24s} OK    rows={len(s_rows)}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
