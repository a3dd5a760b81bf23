"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame`` builders.
``oracle_sql()`` — DuckDB-equivalent SQL per query. Since r9 EVERY
registered query has one (non-SQL-expressible ops carry certificate
oracles: tolerance-certified sketches, md5-replayable LSH twins, an
exact-integer trace anchor for the eigen stats) — the rows-only class
is empty.

Implementation lives in ``poormans_kube_etl_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from poormans_kube_etl_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from poormans_kube_etl_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from poormans_kube_etl_spark.queries import all_oracles

    return all_oracles()
