"""Every registered query must match its DuckDB oracle (the driver's t2
gate, reproduced locally at sf0.001 — see poormans_kube_etl_spark.oracle).
Queries without an oracle must at least build and execute (rows-only)."""

from __future__ import annotations

import pytest

from poormans_kube_etl_spark.oracle import check_query
from poormans_kube_etl_spark.queries import all_queries


def _names():
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, res.message()
