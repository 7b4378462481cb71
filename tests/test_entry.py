"""Driver-contract smoke: entry() returns rows with a stable schema and
every queries() entry runs at sf0.001 (the full DuckDB oracle comparison
lives in scripts/check_oracles.py and the driver's own gate)."""

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"source", "quality_score", "passed"} <= set(df.columns)


def test_queries_and_oracles_aligned():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def test_all_queries_run(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        assert df.count() >= 0, name
