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


def test_canon_is_driver_strict():
    """The local harness must distinguish what the driver's value hash
    distinguishes (VERDICT r01: 8 hash-fails masked by a loose local
    canonicalizer). Re-introducing the decimal-output bug must fail."""
    import decimal

    import pandas as pd

    from poormans_kube_etl_spark.oracle import compare_frames

    spark_like = pd.DataFrame({"x": [decimal.Decimal("138014.00")]})
    duck_like = pd.DataFrame({"x": [138014.0]})
    assert not compare_frames("decimal_vs_float", spark_like, duck_like).ok
    # trailing-zero collapse must also be gone
    assert not compare_frames(
        "scale_drift",
        pd.DataFrame({"x": [decimal.Decimal("1.50")]}),
        pd.DataFrame({"x": [decimal.Decimal("1.5")]}),
    ).ok
    # identical doubles still compare equal
    assert compare_frames(
        "same", pd.DataFrame({"x": [138014.0]}), pd.DataFrame({"x": [138014.0]})
    ).ok


def test_no_decimal_typed_outputs(spark):
    """No query may emit a DECIMAL column in its FINAL schema — Spark
    returns Decimal objects while DuckDB-via-pandas returns float64, so
    any decimal output hash-fails at the driver even when values are
    identical (CORRECTNESS_r01). Finals go through functions.hash_safe
    (decimal → double) or integer types instead."""
    from pyspark.sql.types import DecimalType

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in all_queries().items():
        df = fn(spark, sf)
        for f in df.schema.fields:
            if isinstance(f.dataType, DecimalType):
                offenders.append(f"{name}.{f.name}")
    assert not offenders, f"decimal-typed final columns: {offenders}"
