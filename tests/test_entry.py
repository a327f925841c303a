"""Driver-contract tests: entry(), queries()/oracle_sql() invariants."""

import __spark_entry__ as entrymod


def test_queries_oracle_key_parity():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle keys without a query"
    # the vast majority of queries must be strongly (SQL-) checked
    assert len(o) >= len(q) - 2


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() == 6000 * 8
    assert [f.name for f in df.schema.fields] == [
        "z", "y", "x", "label", "region_name", "region_abbr", "level",
    ]


def test_all_queries_build_lazily(spark, sf_dir):
    # every queries() entry must at least construct its plan against the
    # sf0.001 data without raising (execution is the oracle gate's job)
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema.fields, name
