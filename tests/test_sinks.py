"""Partitioned-writer tests: directory layout, file-size caps,
partition pruning on read-back, and compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from poormans_kube_etl_spark.plans.inspect import formatted_plan
from poormans_kube_etl_spark.sources.sinks import compact, write_partitioned


def _no_merge_debris(path: str) -> bool:
    """No staging/aside leftovers in the reserved dot-namespace."""
    from poormans_kube_etl_spark.operators.upsert import (
        _ASIDE_TAG,
        _STAGING_TAG,
        _hidden_sibling,
    )

    return (
        not glob.glob(_hidden_sibling(path, _STAGING_TAG))
        and not glob.glob(_hidden_sibling(path, _ASIDE_TAG))
        and not glob.glob(f"{path}/**/.*{_ASIDE_TAG}", recursive=True)
    )


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(0, 1000).select(
        (F.col("id") % 4).alias("bucket"), F.col("id").alias("v")
    )
    write_partitioned(df, out, ["bucket"], max_records_per_file=100)
    # hive-style dirs
    assert sorted(os.path.basename(p) for p in glob.glob(f"{out}/bucket=*")) == [
        "bucket=0",
        "bucket=1",
        "bucket=2",
        "bucket=3",
    ]
    # file cap: 250 rows per partition / 100 → ≥3 files each
    for b in range(4):
        files = glob.glob(f"{out}/bucket={b}/*.parquet")
        assert len(files) >= 3
    # partition pruning visible in the scan
    back = spark.read.parquet(out).where(F.col("bucket") == 2)
    assert back.count() == 250
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_compaction_reduces_files(spark, tmp_path):
    out = str(tmp_path / "c")
    df = spark.range(0, 400).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    write_partitioned(df, out, ["p"], max_records_per_file=20)
    before = len(glob.glob(f"{out}/p=*/*.parquet"))
    assert before >= 10
    compact(spark, out, target_partitions=1, partition_cols=["p"])
    after = len(glob.glob(f"{out}/p=*/*.parquet"))
    assert after == 2  # one file per partition dir
    assert spark.read.parquet(out).count() == 400


def test_zorder_key_matches_python_model(spark):
    from poormans_kube_etl_spark.sources.layout import zorder_key

    df = spark.createDataFrame([(x, y) for x in range(8) for y in range(8)], "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    }

    def morton(x, y, bits=3):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(8) for y in range(8)}


def test_zordered_write_clusters_both_columns(spark, tmp_path):
    """Each output file must cover a NARROW range of every z-ordered
    column — the property that makes min/max pruning work on any keyed
    column, which a single-column sort cannot give."""
    import glob

    from poormans_kube_etl_spark.sources.layout import write_zordered

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        ((F.col("id") * 17) % 64).alias("b"),
    )
    path = str(tmp_path / "zz")
    write_zordered(df, path, ["a", "b"], bits=6, num_files=16)
    spans_a, spans_b = [], []
    for f in glob.glob(path + "/part-*.parquet"):
        pdf = spark.read.parquet(f).toPandas()
        spans_a.append(int(pdf.a.max() - pdf.a.min()))
        spans_b.append(int(pdf.b.max() - pdf.b.min()))
    # global span is 63; z-ordered files must each cover far less on BOTH
    assert sum(spans_a) / len(spans_a) < 40
    assert sum(spans_b) / len(spans_b) < 40
    assert spark.read.parquet(path).count() == n


def test_merge_into_partition_scoped_swap(spark, tmp_path):
    """VERDICT r02 #7: a small delta touching ONE partition must leave
    every untouched partition's files byte-identical — the partition-
    scoped path reads and swaps only the touched directories."""
    import hashlib

    from poormans_kube_etl_spark.operators.upsert import merge_into
    from poormans_kube_etl_spark.plans.inspect import formatted_plan

    path = str(tmp_path / "pt")
    spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("day"),
        (F.col("id") * 10).alias("v"),
    ).write.partitionBy("day").parquet(path)

    def snapshot(day):
        return {
            os.path.basename(f): hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in glob.glob(f"{path}/day={day}/*.parquet")
        }

    before = {d: snapshot(d) for d in (0, 1, 2)}
    # 1% delta, all in day=1: one update + one insert
    delta = spark.createDataFrame([(1, 1, 999), (9001, 1, 111)], "k long, day long, v long")

    # the pruned target scan must plan a real partition filter
    target = spark.read.parquet(path).where(F.col("day").eqNullSafe(F.lit(1)))
    plan = formatted_plan(target)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]

    merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])

    # untouched partitions: same files, same bytes
    assert snapshot(0) == before[0]
    assert snapshot(2) == before[2]
    # touched partition rewritten
    assert snapshot(1) != before[1]
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[1] == 999 and got[9001] == 111 and got[0] == 0 and got[2] == 20
    assert len(got) == 301
    assert _no_merge_debris(path)


def test_merge_into_partitioned_null_partition_value(spark, tmp_path):
    """A delta targeting the NULL partition must land in the hive
    __HIVE_DEFAULT_PARTITION__ directory, not be silently skipped."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "np")
    spark.createDataFrame(
        [(1, 0, 10), (2, None, 20), (3, 1, 30)], "k long, day long, v long"
    ).write.partitionBy("day").parquet(path)
    delta = spark.createDataFrame([(2, None, 99), (4, None, 44)], "k long, day long, v long")
    merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])
    got = {r.k: (r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: (0, 10), 2: (None, 99), 3: (1, 30), 4: (None, 44)}


def test_merge_into_partitioned_equals_unpartitioned(spark, tmp_path):
    """The partition-scoped path is an OPTIMIZATION: for any delta whose
    keys keep their partition value, its result must equal the plain
    full-table merge row-for-row."""
    import random

    from poormans_kube_etl_spark.operators.upsert import merge_into

    rng = random.Random(7)
    base = [(k, k % 5, rng.randrange(1000)) for k in range(200)]
    # delta: updates to existing keys (same partition) + fresh inserts
    delta = [(k, k % 5, rng.randrange(1000)) for k in rng.sample(range(200), 30)]
    delta += [(k, k % 5, rng.randrange(1000)) for k in range(200, 220)]

    p_path, u_path = str(tmp_path / "p"), str(tmp_path / "u")
    schema = "k long, day long, v long"
    spark.createDataFrame(base, schema).write.partitionBy("day").parquet(p_path)
    spark.createDataFrame(base, schema).write.parquet(u_path)
    delta_df = spark.createDataFrame(delta, schema)
    merge_into(spark, p_path, delta_df, keys=["k"], partition_cols=["day"])
    merge_into(spark, u_path, delta_df, keys=["k"])
    p_rows = sorted((r.k, r.day, r.v) for r in spark.read.parquet(p_path).collect())
    u_rows = sorted((r.k, r.day, r.v) for r in spark.read.parquet(u_path).collect())
    assert p_rows == u_rows and len(p_rows) == 220


def test_merge_heals_stale_aside_then_succeeds(spark, tmp_path):
    """ADVICE r03: a crashed prior merge that died after its promote
    leaves an aside (reserved dot-namespace); rename-to-existing returns false, so
    every later merge of that partition used to fail until manual
    cleanup. The next merge must clear the leftover and proceed."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "pt")
    spark.createDataFrame(
        [(1, 0, 10), (2, 1, 20)], "k long, day long, v long"
    ).write.partitionBy("day").parquet(path)
    # simulate the crash-after-promote state: obsolete old data parked
    # in the aside dir while the real partition dir is live
    os.makedirs(f"{path}/.day=1.__merge_aside")
    open(f"{path}/.day=1.__merge_aside/junk.parquet", "w").write("stale")

    delta = spark.createDataFrame([(2, 1, 99)], "k long, day long, v long")
    merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 10, 2: 99}
    assert _no_merge_debris(path)


def test_merge_heals_aside_with_missing_partition_dir(spark, tmp_path):
    """Crash BETWEEN aside-move and promote: the aside holds the only
    copy of the partition. The next merge must restore it before
    reading, so target-only rows survive."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "pt")
    spark.createDataFrame(
        [(1, 0, 10), (2, 1, 20), (3, 1, 30)], "k long, day long, v long"
    ).write.partitionBy("day").parquet(path)
    os.rename(f"{path}/day=1", f"{path}/.day=1.__merge_aside")  # the crash state

    delta = spark.createDataFrame([(2, 1, 99)], "k long, day long, v long")
    merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    # k=3 is target-only in the healed partition — it must survive
    assert got == {1: 10, 2: 99, 3: 30}
    assert _no_merge_debris(path)


def test_merge_heals_aside_at_nested_partition_depth(spark, tmp_path):
    """Two partition columns: leftover asides live at depth 2
    (day=../.hour=...__merge_aside) — the heal glob must find them there."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "pt2")
    spark.createDataFrame(
        [(1, 0, 0, 10), (2, 0, 1, 20), (3, 1, 0, 30)],
        "k long, day long, hour long, v long",
    ).write.partitionBy("day", "hour").parquet(path)
    # crash state at nested depth: partition dir moved aside, not promoted
    os.rename(f"{path}/day=0/hour=1", f"{path}/day=0/.hour=1.__merge_aside")

    delta = spark.createDataFrame([(2, 0, 1, 99)], "k long, day long, hour long, v long")
    merge_into(spark, path, delta, keys=["k"], partition_cols=["day", "hour"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    assert _no_merge_debris(path)


def test_merge_unpartitioned_heals_aside_before_bootstrap(spark, tmp_path):
    """Unpartitioned variant of the missing-dst crash state: the whole
    target sits in the aside. Without healing, path_exists(target) is
    false and the bootstrap branch would overwrite with the delta alone,
    silently dropping every old row."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(path)
    from poormans_kube_etl_spark.operators.upsert import _ASIDE_TAG, _hidden_sibling

    os.rename(path, _hidden_sibling(path, _ASIDE_TAG))

    merge_into(
        spark, path, spark.createDataFrame([(2, "B")], "k long, v string"), keys=["k"]
    )
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B"}
    assert _no_merge_debris(path)


def test_merge_rename_fault_matrix_rolls_back_then_converges(
    spark, tmp_path, monkeypatch
):
    """Fault-injection over the two-phase promote: make the K-th
    filesystem rename fail, for every K the merge performs. Each
    failure must (a) raise, (b) leave the target byte-identical to its
    pre-merge state (full rollback), and (c) be healed by simply
    re-running the same merge."""
    import shutil

    import poormans_kube_etl_spark.sources.ingest as ingest
    from poormans_kube_etl_spark.operators.upsert import merge_into

    schema = "k long, day long, v long"
    base_rows = [(1, 0, 10), (2, 1, 20), (3, 2, 30), (4, 1, 40)]
    delta_rows = [(2, 1, 99), (5, 2, 55), (6, 3, 66)]  # 3 touched, 1 new

    pristine = str(tmp_path / "pristine")
    spark.createDataFrame(base_rows, schema).write.partitionBy("day").parquet(pristine)
    expected = {1: (0, 10), 2: (1, 99), 3: (2, 30), 4: (1, 40), 5: (2, 55), 6: (3, 66)}

    real_hf = ingest.hadoop_fs
    counter = {"n": 0, "fail_at": 10**9}

    class FailingFS:
        def __init__(self, fs):
            self._fs = fs

        def rename(self, a, b):
            counter["n"] += 1
            if counter["n"] == counter["fail_at"]:
                return False  # hadoop's failure mode: false, no exception
            return self._fs.rename(a, b)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(spark_, path):
        fs, p = real_hf(spark_, path)
        return FailingFS(fs), p

    def snapshot(path):
        import hashlib

        out = {}
        for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
            rel = os.path.relpath(f, path)
            out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
        return out

    monkeypatch.setattr(ingest, "hadoop_fs", patched)

    # clean run to count renames (also sanity-checks the patch itself)
    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    counter["n"], counter["fail_at"] = 0, 10**9
    merge_into(
        spark, probe, spark.createDataFrame(delta_rows, schema),
        keys=["k"], partition_cols=["day"],
    )
    total_renames = counter["n"]
    assert total_renames >= 2  # asides + promotes
    got = {r.k: (r.day, r.v) for r in spark.read.parquet(probe).collect()}
    assert got == expected

    for fail_at in range(1, total_renames + 1):
        path = str(tmp_path / f"t{fail_at}")
        shutil.copytree(pristine, path)
        before = snapshot(path)
        counter["n"], counter["fail_at"] = 0, fail_at
        with pytest.raises(IOError):
            merge_into(
                spark, path, spark.createDataFrame(delta_rows, schema),
                keys=["k"], partition_cols=["day"],
            )
        # rollback: byte-identical target, no staging/aside debris
        assert snapshot(path) == before, f"rollback failed at rename #{fail_at}"
        assert _no_merge_debris(path)
        # re-run heals and converges
        counter["n"], counter["fail_at"] = 0, 10**9
        merge_into(
            spark, path, spark.createDataFrame(delta_rows, schema),
            keys=["k"], partition_cols=["day"],
        )
        got = {r.k: (r.day, r.v) for r in spark.read.parquet(path).collect()}
        assert got == expected, f"re-run after failure #{fail_at} did not converge"


def test_merge_into_null_key_rows(spark, tmp_path):
    """eqNullSafe join ⇒ NULL key values are legitimate; a NULL-keyed
    update row must UPDATE its NULL-keyed target match, not duplicate
    it (the old u.key-IS-NOT-NULL presence probe misclassified it)."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (None, "b")], "k long, v string"
    ).write.parquet(path)
    merge_into(
        spark,
        path,
        spark.createDataFrame([(None, "B"), (2, "c")], "k long, v string"),
        keys=["k"],
    )
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", None: "B", 2: "c"}


def test_merge_never_touches_partitions_named_like_debris(spark, tmp_path):
    """Self-review r4 (data-loss class): a LEGITIMATE string partition
    value ending in '__old' must never be mistaken for a crashed-merge
    aside — the old suffix-glob heal deleted `tag=v1__old` whenever
    `tag=v1` existed. The reserved dot-namespace makes collision
    impossible; this pins it."""
    from poormans_kube_etl_spark.operators.upsert import merge_into

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "v1", 10), (2, "v1__old", 20), (3, "x", 30)],
        "k long, tag string, v long",
    ).write.partitionBy("tag").parquet(path)

    # merge touching only tag=x — both v1 partitions must be untouched
    merge_into(
        spark,
        path,
        spark.createDataFrame([(3, "x", 99)], "k long, tag string, v long"),
        keys=["k"],
        partition_cols=["tag"],
    )
    got = {r.k: (r.tag, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("v1", 10), 2: ("v1__old", 20), 3: ("x", 99)}

    # and a merge INTO the suffix-named partition works like any other
    merge_into(
        spark,
        path,
        spark.createDataFrame([(2, "v1__old", 21)], "k long, tag string, v long"),
        keys=["k"],
        partition_cols=["tag"],
    )
    got = {r.k: (r.tag, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("v1", 10), 2: ("v1__old", 21), 3: ("x", 99)}


def test_merge_crash_window_aside_hidden_from_readers(spark, tmp_path):
    """During the crash window the parked old partition must be
    INVISIBLE to spark.read (dot-prefixed dirs are skipped by Hadoop
    listings) — the old `day=1__old` naming surfaced it as a bogus
    partition value until the next merge healed it."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 0, 10), (2, 1, 20)], "k long, day long, v long"
    ).write.partitionBy("day").parquet(path)
    os.rename(f"{path}/day=1", f"{path}/.day=1.__merge_aside")
    days = {r.day for r in spark.read.parquet(path).collect()}
    assert days == {0}  # parked data invisible, no bogus partition value


def test_merge_rollback_runs_on_raising_filesystem(spark, tmp_path, monkeypatch):
    """Self-review r4: Hadoop FileSystem ops can RAISE (py4j-wrapped JVM
    IOException), not just return false. A raise mid-promote must roll
    back and clean staging exactly like the returns-false mode."""
    import shutil

    import poormans_kube_etl_spark.sources.ingest as ingest
    from poormans_kube_etl_spark.operators.upsert import merge_into

    schema = "k long, day long, v long"
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 0, 10), (2, 1, 20), (3, 2, 30)], schema
    ).write.partitionBy("day").parquet(path)

    def snapshot():
        import hashlib

        return {
            os.path.relpath(f, path): hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
        }

    before = snapshot()
    real_hf = ingest.hadoop_fs
    counter = {"n": 0, "fail_at": 3}

    class RaisingFS:
        def __init__(self, fs):
            self._fs = fs

        def rename(self, a, b):
            counter["n"] += 1
            if counter["n"] == counter["fail_at"]:
                raise RuntimeError("py4j-wrapped java.io.IOException: connection lost")
            return self._fs.rename(a, b)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    monkeypatch.setattr(
        ingest, "hadoop_fs", lambda sp, p: (RaisingFS(real_hf(sp, p)[0]), real_hf(sp, p)[1])
    )
    delta = spark.createDataFrame([(2, 1, 99), (3, 2, 88)], schema)
    with pytest.raises(RuntimeError):
        merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])
    assert snapshot() == before  # full rollback despite the raise
    assert _no_merge_debris(path)

    # re-run converges
    monkeypatch.setattr(ingest, "hadoop_fs", real_hf)
    merge_into(spark, path, delta, keys=["k"], partition_cols=["day"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 10, 2: 99, 3: 88}
