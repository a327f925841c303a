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


def test_driver_sample_rotation_is_staleness_ordered():
    # The driver samples the FIRST 50 of ordered_queries().  The
    # rotation must (a) carry no stale names, (b) put never-green
    # queries (new work) first so they can't skip the driver gate, and
    # (c) order the rest stalest-evidence-first so every row's green
    # proof keeps getting refreshed as the code drifts.
    from atlas_upscaling_dask_spark import suite

    stale = set(suite._LAST_GREEN) - set(suite.QUERIES)
    assert not stale, f"_LAST_GREEN names not registered: {sorted(stale)}"
    order = list(suite.ordered_queries())
    assert set(order) == set(suite.QUERIES)
    ranks = [suite._LAST_GREEN.get(n, 0) for n in order]
    assert ranks == sorted(ranks), "ordered_queries() not staleness-sorted"
    # never-green rows (rank 0) must all sit inside the 50-row prefix
    n_new = ranks.count(0)
    assert n_new <= 50, f"{n_new} unchecked rows cannot fit one driver pass"
    assert all(r == 0 for r in ranks[:n_new])
