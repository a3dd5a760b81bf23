"""Subquery coverage: correlated EXISTS / NOT EXISTS / IN / scalar
subqueries — expressed through spark.sql so Catalyst's decorrelation
(RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) turns them
into the same joins the DataFrame API would hand-write. Plus the
approximate-aggregate scale paths (approx_count_distinct /
approx_percentile) registered rows-only next to their exact anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from poormans_kube_etl_spark.queries import register
from poormans_kube_etl_spark.session import apply_runtime_confs
from poormans_kube_etl_spark.sources import load_table, register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    apply_runtime_confs(spark)
    register_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "subq_exists_high_value_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    ORDER BY c_custkey
    """,
)
def subq_exists_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated to a left-semi join (the plan
    Catalyst emits; same shuffle shape as the explicit semi join)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        ORDER BY c_custkey
        """,
    )


@register(
    "subq_not_in_inactive_parts",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    ORDER BY p_partkey
    """,
)
def subq_not_in_inactive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → null-aware anti join. NOT IN's NULL semantics (any NULL
    in the subquery empties the result) make this a distinct operator
    from NOT EXISTS; l_partkey is non-null here so both engines agree."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        ORDER BY p_partkey
        """,
    )


@register(
    "subq_scalar_above_avg_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)
def subq_scalar_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a
    literal into the filter — no per-row recomputation."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """,
    )


@register(
    "subq_correlated_scalar_max_item",
    oracle="""
    SELECT o.o_orderkey,
           (SELECT CAST(CAST(MAX(l.l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE)
            FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
    FROM orders o
    WHERE o.o_orderkey < 5000
    ORDER BY o.o_orderkey
    """,
)
def subq_correlated_scalar_max_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → decorrelated to an aggregate +
    left outer join (NULL where no lineitems)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o.o_orderkey,
               (SELECT CAST(CAST(MAX(l.l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE)
                FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
        FROM orders o
        WHERE o.o_orderkey < 5000
        ORDER BY o.o_orderkey
        """,
    )


# ---------------------------------------------------------------------------
# Approximate scale paths (rows-only: sketch outputs are engine-specific;
# the exact anchors are countDistinct / percentile oracle queries)
# ---------------------------------------------------------------------------
@register("approx_distinct_users_by_type")
def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — the 100 TB path where exact
    count-distinct's per-group hash sets don't fit. rsd=0.01 keeps the
    sketch ~24 KB/group; exact anchor: agg_filtered_conditional."""
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register("approx_percentile_quantity")
def approx_percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) — mergeable sketch, no
    per-group sort; exact anchor: percentile_quantity_by_flag.

    Determinism: a GK sketch's result depends on insertion AND merge
    order, and final-aggregation merge order follows shuffle fetch
    order — nondeterministic across reruns (caught by the rerun-
    stability gate). Pre-partitioning on the group key with a unique
    in-partition sort pins ONE deterministically-ordered partial per
    group, so the merge step has nothing to reorder. At 100 TB you'd
    accept sketch jitter instead of the repartition (the sketch's
    whole point is parallel mergeability); the harness demands
    bit-stable reruns, so the demo pins it. Finals are three scalar
    columns — the driver canonicalizer cannot hash array cells."""
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pctl = F.approx_percentile(
        "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
    )
    return (
        li.select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
        .repartition("l_returnflag")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .groupBy("l_returnflag")
        .agg(pctl.alias("approx_q"))
        .select(
            "l_returnflag",
            F.col("approx_q")[0].cast("double").alias("p25"),
            F.col("approx_q")[1].cast("double").alias("p50"),
            F.col("approx_q")[2].cast("double").alias("p75"),
        )
        .orderBy("l_returnflag")
    )
