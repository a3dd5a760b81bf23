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
    assert len(first) > 0, f"{name} returned no rows at {sf_dir}"


# The queries whose implementations lean on partitioning internals:
# GK-sketch partial pinning, two-pass global ordering, partial top-k,
# interval-bucketed self-join. The driver brings its OWN session (often
# Spark's default 200 shuffle partitions, not our core-count default) —
# results must not depend on that knob.
_PARTITIONING_SENSITIVE = [
    "approx_percentile_quantity",
    "train_deterministic_shuffle",
    "sess_range_self_join_5m",
    "sim_topk_bruteforce",
]


def test_results_invariant_to_shuffle_partitioning(spark, sf_dir):
    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, list] = {}
    try:
        for parts in ("7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in _PARTITIONING_SENSITIVE:
                results.setdefault(name, []).append(
                    canon_rows(qs[name](spark, sf_dir).toPandas())
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs between 7 and 64 shuffle partitions"
