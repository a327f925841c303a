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


def test_driver_sample_partition_exhaustive():
    # Every registered query must be either already driver-green
    # (_DRIVER_CHECKED) or queued for the driver's 50-row prefix
    # (_PRIORITY) — new queries can't silently skip driver verification.
    from atlas_upscaling_dask_spark import suite

    uncovered = set(suite.QUERIES) - suite._DRIVER_CHECKED - set(suite._PRIORITY)
    assert not uncovered, f"queries outside the driver-verification rotation: {sorted(uncovered)}"
    # the not-yet-green set must fit in one driver pass
    assert len(suite._PRIORITY) <= 50
    # ordered_queries() leads with the never-green rows
    head = list(suite.ordered_queries())[: len(suite._PRIORITY)]
    assert head == [n for n in suite._PRIORITY if n in suite.QUERIES]
