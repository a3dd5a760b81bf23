"""Skew-salting and bucketing strategy tests: semantic equivalence for
the salted join, exchange-free plans for bucketed joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.partitioning import (
    _AQE_SKEW_THRESHOLD_DEFAULT,
    _SALT_MIN_HOT_BYTES,
    _hot_bytes_from_stats,
    _parse_bytes,
    bucketed_join,
    plan_salt,
    salted_join,
    write_bucketed,
)
from poormans_kube_etl_spark.plans.inspect import shuffle_count, simple_plan


@pytest.fixture
def skewed(spark):
    # key 7 carries 80% of the left side — the straggler scenario
    left = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    return left, right


def test_salted_join_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, ["k"]).select("k", "left_id", "payload")
    salted = salted_join(left, right, ["k"], n_salt=8).select("k", "left_id", "payload")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    right_partial = right.where(F.col("k") < 50)
    plain = left.join(right_partial, ["k"], "left")
    salted = salted_join(left, right_partial, ["k"], n_salt=4, how="left")
    assert salted.count() == plain.count()
    # unmatched rows carry NULL payload in both
    assert (
        salted.where(F.col("payload").isNull()).count()
        == plain.where(F.col("payload").isNull()).count()
    )


def test_plan_salt_three_regimes():
    """VERDICT r06 #4: the measured crossover (SCALING.md skew table)
    encoded as a pure planner — don't-salt below the hot-bytes floor,
    salt in the gap, defer to AQE's runtime split above its trigger."""
    aqe = _AQE_SKEW_THRESHOLD_DEFAULT
    # sf0.1 regime: ~7 MB hot partition — salting measured a LOSS
    assert plan_salt(7 << 20, aqe, parallelism=32) is None
    # sf1 regime: ~70 MB hot — inside the gap, measured 1.6x win
    n = plan_salt(70 << 20, aqe, parallelism=32)
    assert n is not None and 2 <= n <= 32
    # sf10 regime: ~700 MB hot — AQE's skew split handles SMJ for free
    assert plan_salt(700 << 20, aqe, parallelism=32) is None
    # ...but with AQE skew handling OFF (or a non-SMJ/aggregation
    # caller) the salt band stays open upward
    assert plan_salt(700 << 20, None, parallelism=32) >= 2
    # boundary: exactly the floor salts, one byte below does not
    assert plan_salt(_SALT_MIN_HOT_BYTES, aqe, parallelism=32) == 2
    assert plan_salt(_SALT_MIN_HOT_BYTES - 1, aqe, parallelism=32) is None


def test_stats_calibration_lands_each_sf_in_its_measured_regime():
    """r7 review: the stats-to-shuffle factor converts to WHOLE-SIDE
    bytes and hot_share is applied once. The SCALING.md skew table's
    own measurements (left stats 1.4/12.7/127 MB at sf0.1/1/10, 40%-hot
    key, hot partitions ~7/~70/~700 MB) must land auto mode in the
    measured regime at every SF — the 5x-then-x-hot_share form
    double-counted the share, declining at sf1 (the 1.6x win band) and
    salting at sf10 (AQE's regime)."""
    aqe = _AQE_SKEW_THRESHOLD_DEFAULT
    # sf0.1: ~7 MB hot -> below the floor, don't salt
    sf01 = _hot_bytes_from_stats(int(1.4 * (1 << 20)), 0.4)
    assert abs(sf01 - (7 << 20)) < (1 << 20)
    assert plan_salt(sf01, aqe, parallelism=32) is None
    # sf1: ~63 MB hot -> inside the gap band, salt
    sf1 = _hot_bytes_from_stats(int(12.7 * (1 << 20)), 0.4)
    assert (32 << 20) < sf1 < aqe
    assert plan_salt(sf1, aqe, parallelism=32) is not None
    # sf10: ~635 MB hot -> above AQE's trigger, defer to the runtime split
    sf10 = _hot_bytes_from_stats(127 << 20, 0.4)
    assert sf10 > aqe
    assert plan_salt(sf10, aqe, parallelism=32) is None


def test_parse_bytes_accepts_both_spark_suffix_spellings():
    """r7 review: Spark accepts '64m' AND '64mb'; rejecting the
    two-letter form silently reverted the AQE threshold to 256 MB."""
    assert _parse_bytes("268435456") == 256 << 20
    assert _parse_bytes("256m") == 256 << 20
    assert _parse_bytes("256MB") == 256 << 20
    assert _parse_bytes("64mb") == 64 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("1gb") == 1 << 30
    assert _parse_bytes("512kb") == 512 << 10
    assert _parse_bytes("64b") == 64


def test_salted_join_auto_declines_below_crossover(spark, skewed):
    """auto mode on a tiny input must be a PLAIN join — no salt column,
    no right-side replication (the sf0.1-regime caller can't pay the
    replication tax for nothing)."""
    left, right = skewed
    auto = salted_join(left, right, ["k"])  # n_salt defaults to 'auto'
    plain = left.join(right, ["k"])
    assert "xxhash64" not in simple_plan(auto)
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0


def test_salted_join_auto_salts_in_gap_regime(spark, skewed):
    """A caller-supplied hot-partition estimate inside the gap band
    turns auto mode into a real salted join (exchange count still
    matches plain: the existing gate's invariant)."""
    left, right = skewed
    auto = salted_join(left, right, ["k"], hot_bytes=70 << 20)
    assert "xxhash64" in simple_plan(auto)
    plain = left.join(right, ["k"])
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0


def test_salted_join_auto_defers_to_aqe_above_threshold(spark, skewed):
    """Above AQE's skewedPartitionThresholdInBytes the runtime split
    owns the problem: auto mode plans a plain join."""
    left, right = skewed
    auto = salted_join(left, right, ["k"], hot_bytes=700 << 20)
    assert "xxhash64" not in simple_plan(auto)


def test_salted_join_rejects_bad_n_salt(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(left, right, ["k"], n_salt="many")


def test_salted_join_exchange_count_matches_plain(spark, skewed):
    """Plan gate (VERDICT r05 #5): salting must not ADD an exchange.
    The left's salt is computed map-side and the right's replication
    (explode of a literal sequence) sits BELOW that side's one
    exchange, so the salted plan shuffles exactly as often as the
    plain shuffle join — 2, one per side. A regression to (say) an
    extra repartition or a post-join reshuffle turns the skew remedy
    into a net new scan-sized exchange at 100 TB."""
    left, right = skewed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # the dim would broadcast (0 shuffles) and hide the comparison;
        # the subject is the broadcast-INELIGIBLE skewed join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = left.join(right, ["k"])
        salted = salted_join(left, right, ["k"], n_salt=8)
        assert shuffle_count(plain) == 2
        assert shuffle_count(salted) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salt_spreads_hot_key(spark, skewed):
    left, _ = skewed
    # direct check on the salt expression: hot key 7 lands in >1 salt
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    )
    n_salt_buckets = (
        salted.where(F.col("k") == 7).select("_salt").distinct().count()
    )
    assert n_salt_buckets > 1


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew handling: with one key carrying ~83% of the
    left side, the final sort-merge join must mark and split the skewed
    partition (skew=true) instead of leaving one straggler task."""
    import contextlib
    import io
    import re

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") < 250000, F.lit(7)).otherwise(F.col("id") % 500).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        assert j.collect()[0].s == 44999850000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert re.search("skew=true", plan), "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    lineitem_like = spark.range(0, 20000).select(
        (F.col("id") % 3000).alias("key"), (F.col("id") * 2).alias("a")
    )
    orders_like = spark.range(0, 3000).select(
        F.col("id").alias("key"), (F.col("id") + 1).alias("b")
    )
    write_bucketed(
        lineitem_like, "t_fact", str(tmp_path / "fact"), ["key"], 8, sort_cols=["key"]
    )
    write_bucketed(
        orders_like, "t_dim", str(tmp_path / "dim"), ["key"], 8, sort_cols=["key"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_fact", "t_dim", ["key"])
        assert joined.count() == 20000
        # the whole point: no exchange on either side
        assert shuffle_count(joined) == 0
        assert "SortMergeJoin" in simple_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_fact")
        spark.sql("DROP TABLE IF EXISTS t_dim")


def test_salted_join_rejects_right_outer(spark, skewed):
    # ADVICE r01: right/full outer would emit each unmatched right row
    # n_salt times; the safe set is enforced
    import pytest

    left, right = skewed
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, ["k"], n_salt=4, how=how)


def test_spread_small_scan_thresholds(spark):
    """r5: spread must SKIP tiny inputs (barrier costs more than the
    serial map — the unconditional form regressed the sf0.1 bench), fire
    on mid-band inputs (single-row-group parquet serializes amplified
    map work), and stay inert when plan stats are unavailable."""
    from poormans_kube_etl_spark.sources import load_table, spread_small_scan

    # tiny (0.6 MB): pass-through, SAME plan handle
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    assert spread_small_scan(docs) is docs
    # mid-band: a range plan big enough to clear the 2 MB floor
    big = spark.range(0, 1_000_000)  # 8 B/row -> ~8 MB stats
    spread = spread_small_scan(big)
    assert spread is not big
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_spread_width_scales_with_input_bytes(spark):
    """r14 (VERDICT r13 #2): the heavy tier repartitions to
    ``size // task_bytes`` capped at defaultParallelism — a 594 KB frame
    must NOT become 32 ~19 KB micro-tasks (the r13 c8 run showed those
    faces running faster at 8 cores than 32)."""
    from poormans_kube_etl_spark.sources import load_table, spread_small_scan
    from poormans_kube_etl_spark.sources.tables import (
        _SPREAD_HEAVY_TASK_BYTES,
    )

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    spread = spread_small_scan(docs, heavy=True)
    assert spread is not docs
    got = spread.rdd.getNumPartitions()
    # the width follows the documented formula (size is the OPTIMIZER
    # estimate, so derive the expectation the same way)
    size = int(
        str(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    assert got == min(
        spark.sparkContext.defaultParallelism,
        max(1, size // _SPREAD_HEAVY_TASK_BYTES),
    )
    assert got > 1
    # a frame well under (task_bytes * parallelism) gets FEWER tasks
    # than the slot count — the micro-task cap this change exists for
    sub = docs.sparkSession.range(0, 30_000)
    # 240 KB stats (8 B/row): above the 128 KB heavy floor, below
    # 8 slots' worth at 40 KB/task
    sub_spread = spread_small_scan(sub, heavy=True)
    assert sub_spread is not sub
    assert (
        sub_spread.rdd.getNumPartitions()
        < spark.sparkContext.defaultParallelism
    )


def test_spread_skips_naturally_split_scans(spark, tmp_path):
    """r14 (VERDICT r13 #1): a multi-file layout (the sf1/sf10 replica
    sets write 32 files per table) already splits at scan time — the
    spread must NOT add a redundant round-robin exchange on top."""
    from poormans_kube_etl_spark.sources import spread_small_scan

    p = str(tmp_path / "multi.parquet")
    # ~4 MB over 32 files: above the heavy floor AND the light floor,
    # with as many natural splits as any spread width could ask for
    spark.range(0, 500_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).repartition(32).write.parquet(p)
    df = spark.read.parquet(p)
    assert spread_small_scan(df, heavy=True) is df
    assert spread_small_scan(df) is df
    # single-file single-row-group inputs (the driver testdata layout)
    # still spread: one file can never split below a row group
    p1 = str(tmp_path / "single.parquet")
    spark.range(0, 500_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(p1)
    df1 = spark.read.parquet(p1)
    assert spread_small_scan(df1, heavy=True) is not df1


def test_salted_join_rejects_existing_salt_column(spark):
    """r8 review: a pre-existing '_salt' column was silently overwritten
    by the salting projection, equating user data with replication
    indices — wrong rows, no error. Must raise, naming the side."""
    import pytest

    from poormans_kube_etl_spark.operators.partitioning import salted_join

    left = spark.createDataFrame([(1, 0)], "k long, _salt int")
    right = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="left side already has a '_salt'"):
        salted_join(left, right, ["k"], n_salt=4)
    with pytest.raises(ValueError, match="right side already has a '_salt'"):
        salted_join(right, left, ["k"], n_salt=4)
