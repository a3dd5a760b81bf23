"""Determinism gate for rows-only queries: the driver records their
row counts per round and the judge compares rounds, so every query
WITHOUT an oracle must produce byte-identical results on rerun —
hashing, banding, LSH planes, IVF probes, k-means, and frame sampling
all promise fixed-seed determinism; this pins it."""

from __future__ import annotations

import pytest

from poormans_kube_etl_spark.oracle import canon_rows
from poormans_kube_etl_spark.queries import all_oracles, all_queries


def _rows_only_names():
    oracles = all_oracles()
    return sorted(n for n in all_queries() if n not in oracles)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_is_rerun_stable(spark, sf_dir, name):
    q = all_queries()[name]
    first = canon_rows(q(spark, sf_dir).toPandas())
    second = canon_rows(q(spark, sf_dir).toPandas())
    assert first == second, f"{name} differs between reruns"
    assert len(first) > 0 or name in (), f"{name} returned no rows at {sf_dir}"
