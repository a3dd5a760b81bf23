from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_and_oracles_aligned(spark):
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(osql) <= set(qs)
