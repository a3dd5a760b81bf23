"""Key-based MERGE (upsert) into a parquet target — the incremental
('delta') ingest write pattern without a transactional table format.

Semantics of ``merge_into``: rows whose key exists in both sides take
the UPDATE side's values; update-only keys are inserted; target-only
keys are kept (i.e. MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT). Implementation is one full-outer join on the key + a
staging-path swap: readers never observe half-written FILES (data lands
in staging, promotion is directory renames), and the partitioned path's
two-phase promote confines the reader-visible swap window to the
metadata-only rename loops, with full rollback on failure and
heal-on-next-merge after a crash (details on ``_merge_into_partitioned``).

At 100 TB you never rewrite the whole table for a 0.1% delta. Two
narrowing levers, strongest first:

- ``partition_cols`` (hive-partitioned targets): the merge reads ONLY
  the partitions the delta touches (real ``PartitionFilters`` pruning,
  driven by the delta's own distinct partition values) and swaps ONLY
  those partition directories — untouched partitions' files are never
  read, rewritten, or moved (byte-identical across the merge).
  Restriction: a key's partition value must be stable between target
  and delta (the standard contract for partition-scoped merges; a key
  that moves partitions would leave its old row behind).
- ``partition_pruning`` (unpartitioned layouts): a predicate that
  narrows the join to the touched key-range; the swap still replaces
  the whole directory, but the join work scales with the delta.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _require_unique_keys(updates: DataFrame, keys: list[str]) -> None:
    """Standard MERGE semantics (r7 review): a source with multiple
    rows per key is an error, not a fan-out. Without this, a retried
    batch with a repeated record made the full-outer join emit the key
    twice — silent duplicate primary keys that COMPOUND on the next
    merge (2×2=4). One aggregation over the delta (small by definition;
    pass ``assume_unique_keys=True`` to skip when the delta is already
    key-deduped upstream)."""
    dup = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        vals = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"merge_into: updates contain multiple rows for key {vals}; "
            "MERGE forbids ambiguous source matches — aggregate or dedupe "
            "the delta first"
        )


def _merge_frames(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MATCHED-update / NOT-MATCHED-insert / target-only-keep via one
    full-outer join on the key."""
    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    # presence marker, NOT a key-null probe: the join is eqNullSafe, so
    # NULL key values are legitimate and u.key IS NOT NULL would
    # misclassify those matched rows as target-only
    u = updates.withColumn("__u_present", F.lit(1)).alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    present = F.col("u.__u_present").isNotNull()
    return t.join(u, cond, "full_outer").select(
        *[
            F.when(present, F.col(f"u.{k}")).otherwise(F.col(f"t.{k}")).alias(k)
            for k in keys
        ],
        *[
            # matched or insert → update side; target-only → keep
            F.when(present, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    )


# Aside/staging dirs live in a RESERVED, dot-prefixed namespace:
# ``parent/.<name>.__merge_aside``. Two properties matter (r4, from a
# self-review finding that the previous ``<dir>__old`` suffix could
# destroy real data): (a) hive partition dirs are always ``col=value``
# — they can never start with a dot, so the heal glob can never match a
# LEGITIMATE partition (a string partition value literally ending in
# "__old", e.g. ``tag=v1__old``, used to be deleted or renamed as
# presumed debris); (b) Hadoop/Spark listings skip dot-prefixed names,
# so during the crash window the parked old data is invisible to
# readers instead of surfacing as a bogus partition value.
# Migration note: crash debris left by the PRE-r4 suffix naming
# (``<dir>__old`` / ``<path>__merging``) is intentionally NOT healed —
# auto-matching those names is the data-loss bug the namespace change
# fixed (a real partition value may end in "__old"); restore such
# debris by hand. No live deployment predates the rename.
_ASIDE_TAG = ".__merge_aside"
_STAGING_TAG = ".__merge_staging"


def _hidden_sibling(path: str, tag: str) -> str:
    """``/w/t`` → ``/w/.t<tag>``: same parent (rename stays a metadata
    op on the same filesystem), dot-hidden, outside the hive namespace."""
    p = path.rstrip("/")
    head, sep, name = p.rpartition("/")
    return f"{head}{sep}.{name}{tag}"


def _heal_aside(fs, dst, aside) -> None:
    """Recover from a prior merge's crash window (ADVICE r03). A
    leftover aside dir means the previous merge died either
    AFTER its promote (``dst`` exists and holds the new data — the aside
    is obsolete; delete it) or BETWEEN aside-move and promote (``dst``
    missing — the aside IS the current data; restore it). Healing runs
    before the target is read, so a merge never computes against a
    half-swapped view, and a stale aside can never fail the next swap's
    rename (rename returns false when the destination exists)."""
    if not fs.exists(aside):
        return
    if fs.exists(dst):
        fs.delete(aside, True)
    elif not fs.rename(aside, dst):
        raise IOError(f"merge_into: failed to restore {aside} to {dst}")


def _swap_dir(fs, src, dst, aside) -> None:
    """Promote ``src`` into ``dst`` with the move-ASIDE-first discipline:
    ``dst`` always holds either the old or the new data, and a failed
    promote rolls the old data back."""
    # rename of a missing source returns False, so re-probe the target
    # right before the swap: if it is absent (bootstrap / new partition),
    # skip the aside step and promote directly — and never leave staging
    # behind on a failed swap.
    _heal_aside(fs, dst, aside)
    if fs.exists(dst) and not fs.rename(dst, aside):
        raise IOError(f"merge_into: failed to move {dst} aside")
    if not fs.rename(src, dst):
        if fs.exists(aside):
            fs.rename(aside, dst)
        raise IOError(f"merge_into: failed to move staging into {dst}")
    if fs.exists(aside):
        fs.delete(aside, True)


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_pruning: Column | None = None,
    partition_cols: list[str] | None = None,
    assume_unique_keys: bool = False,
) -> None:
    """Upsert ``updates`` into the parquet at ``target_path`` by key.

    ``partition_pruning`` carries the same key-stability contract as
    ``partition_cols`` (r7 review): every update key's EXISTING target
    row must satisfy the predicate. A key whose stored row falls
    outside it is invisible to the merge, classified NOT-MATCHED, and
    inserted — while the old row survives in the untouched branch:
    duplicate keys. Validating would require scanning the untouched
    side, which is exactly what the predicate exists to avoid, so the
    contract is documented, not enforced."""
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs, path_exists

    if not assume_unique_keys:
        _require_unique_keys(updates, keys)
    if partition_cols:
        _merge_into_partitioned(spark, target_path, updates, keys, partition_cols)
        return

    old = _hidden_sibling(target_path, _ASIDE_TAG)
    fs0, dst0 = hadoop_fs(spark, target_path)
    _, aside0 = hadoop_fs(spark, old)
    # a crashed prior merge may have left the data in the aside dir with
    # the target missing — restoring FIRST means the bootstrap branch
    # below can't mistake that state for an empty target and drop rows
    _heal_aside(fs0, dst0, aside0)

    if not path_exists(spark, target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    if partition_pruning is not None:
        # NULL-safe split (self-review r4): rows where the predicate is
        # NULL fail BOTH where(pred) and where(~pred) — they would land
        # in neither branch and be silently dropped from the rewrite.
        # Three-valued logic collapses to: NULL counts as untouched.
        touched_pred = F.coalesce(partition_pruning, F.lit(False))
        untouched = target.where(~touched_pred)
        target = target.where(touched_pred)
    else:
        untouched = None

    merged = _merge_frames(target, updates, keys)
    if untouched is not None:
        merged = merged.unionByName(untouched)

    # crash-safe swap (same discipline as sources.sinks.compact): the
    # original moves ASIDE first, so `target_path` always holds either
    # the old or the new dataset; rename results are checked.
    staging = _hidden_sibling(target_path, _STAGING_TAG)
    merged.write.mode("overwrite").parquet(staging)
    _, src = hadoop_fs(spark, staging)
    try:
        _swap_dir(fs0, src, dst0, aside0)
    except Exception:
        # not just IOError: py4j surfaces JVM IOExceptions as
        # Py4JJavaError — the cleanup must run for those too
        delete_path(spark, staging)
        raise


def _merge_into_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
) -> None:
    """Partition-scoped merge for a hive-partitioned parquet target.

    1. Leftover asides (reserved dot-namespace, see _ASIDE_TAG) from a crashed prior merge are healed
       (restored or cleared) BEFORE the target is read.
    2. The delta's DISTINCT partition values (driver-tiny: a delta
       touches few partitions by definition) become an ``isin`` filter —
       the target scan plans real ``PartitionFilters``, reading only the
       touched directories.
    3. The merge output is written to staging partitioned the same way.
    4. Promotion is TWO-PHASE over only the touched directories
       (untouched directories are never read or moved, so their files
       stay byte-identical): phase A moves every touched target dir
       aside, phase B renames every staging dir in. Directory renames
       are metadata-only, so the reader-visible window — during which a
       touched partition may be briefly absent or already-new while
       another is still-old — is the few milliseconds of the rename
       loops, not the minutes of the merge job. Any failure rolls BOTH
       phases back (un-promote, restore asides), leaving the target
       byte-identical to its pre-merge state; atomicity is therefore
       all-or-nothing per MERGE CALL, not merely per partition, and
       re-running the same delta after a crash first heals, then
       converges (the merge is idempotent on its inputs).
    """
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs, path_exists

    if not path_exists(spark, target_path):
        updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(target_path)
        return

    fs, _root = hadoop_fs(spark, target_path)
    _heal_partition_asides(spark, fs, target_path, len(partition_cols))

    touched = [tuple(r) for r in updates.select(*partition_cols).distinct().collect()]
    if not touched:
        return

    target = spark.read.parquet(target_path)
    pred = None
    for combo in touched:
        combo_pred = None
        for c, v in zip(partition_cols, combo):
            term = F.col(c).eqNullSafe(F.lit(v))
            combo_pred = term if combo_pred is None else combo_pred & term
        pred = combo_pred if pred is None else pred | combo_pred
    merged = _merge_frames(target.where(pred), updates, keys)

    staging = _hidden_sibling(target_path, _STAGING_TAG)
    merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)

    plan = []
    for combo in touched:
        # hive dir encoding: NULL partition values write as
        # __HIVE_DEFAULT_PARTITION__ — a str(None) dir name would miss
        # the staging dir and silently drop that partition's delta
        rel = "/".join(
            f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
            for c, v in zip(partition_cols, combo)
        )
        _, src = hadoop_fs(spark, f"{staging.rstrip('/')}/{rel}")
        _, dst = hadoop_fs(spark, f"{target_path.rstrip('/')}/{rel}")
        _, aside = hadoop_fs(
            spark, _hidden_sibling(f"{target_path.rstrip('/')}/{rel}", _ASIDE_TAG)
        )
        if not fs.exists(src):
            # Every touched combo has >= 1 update row, so merged always
            # writes this directory — absence means the dir-name encoding
            # above disagrees with Spark's hive escaping (e.g. special
            # characters in a string partition value). Silent skip would
            # drop the partition's delta; fail loudly BEFORE any target
            # dir has been touched.
            delete_path(spark, staging)
            raise ValueError(
                f"merge_into: staging dir for partition {rel!r} missing — "
                "partition value needs hive escaping this helper doesn't "
                "implement; use plain ascii partition values"
            )
        plan.append((src, dst, aside))

    # two-phase promote (ADVICE r03): all asides first, then all
    # staging renames — the mixed-state window is the rename loops
    # only, and a failure in either phase rolls the target back whole.
    moved: list[tuple] = []  # (dst, aside) pairs whose dst went aside
    promoted: list[tuple] = []  # (src, dst) pairs renamed in
    try:
        for _src, dst, aside in plan:
            if fs.exists(dst):
                if not fs.rename(dst, aside):
                    raise IOError(f"merge_into: failed to move {dst} aside")
                moved.append((dst, aside))
        for src, dst, _aside in plan:
            fs.mkdirs(dst.getParent())  # nested new combos need the parent dir
            if not fs.rename(src, dst):
                raise IOError(f"merge_into: failed to move staging into {dst}")
            promoted.append((src, dst))
    except Exception:
        # not just IOError: Hadoop FileSystem calls raise JVM
        # IOExceptions through py4j as Py4JJavaError — the rollback
        # must run for those too, or the target stays mixed-state.
        # Rollback renames are CHECKED (r7 review): a silently-failed
        # un-promote leaves new data at dst with the old data in its
        # aside — the next merge's heal would then DELETE the aside
        # (obsolete-aside branch) and lose the old rows, so an
        # incomplete rollback must be loud and must preserve staging
        # for manual repair instead of claiming a clean pre-merge state.
        incomplete = []
        for src, dst in reversed(promoted):
            if not fs.rename(dst, src):
                incomplete.append(f"un-promote {dst}")
        for dst, aside in reversed(moved):
            if not fs.rename(aside, dst):
                incomplete.append(f"restore {dst} from {aside}")
        if incomplete:
            raise IOError(
                "merge_into: rollback INCOMPLETE after failed promote — "
                f"target is mixed-state ({'; '.join(incomplete)}); staging "
                f"kept at {staging} for manual repair. Do NOT re-run the "
                "merge before restoring: the aside heal would discard the "
                "parked old data."
            )
        delete_path(spark, staging)
        raise
    for _dst, aside in moved:
        fs.delete(aside, True)
    delete_path(spark, staging)


def _heal_partition_asides(
    spark: SparkSession, fs, target_path: str, depth: int
) -> None:
    """Glob aside leftovers at the partition depth and heal each
    (restore when its partition dir is missing, clear when it is
    present) — a crashed prior merge must not block, or feed a
    half-swapped view to, the next one. Aside dirs live only at the
    LEAF partition level (``c1=v1/.c2=v2.__merge_aside``), so one glob
    per merge covers every possible leftover. The pattern's leaf is
    anchored on the reserved dot-prefix + tag, which no hive-encoded
    partition dir can ever carry (dirs are ``col=value``) — so healing
    can only ever touch this module's own debris, never real data."""
    jvm = spark.sparkContext._jvm
    pattern = "/".join(["*"] * (depth - 1) + [f".*{_ASIDE_TAG}"])
    gpath = jvm.org.apache.hadoop.fs.Path(f"{target_path.rstrip('/')}/{pattern}")
    statuses = fs.globStatus(gpath)
    if statuses is None:
        return
    for st in statuses:
        aside = st.getPath()
        name = aside.getName()
        if not (name.startswith(".") and name.endswith(_ASIDE_TAG)):
            continue
        dst = jvm.org.apache.hadoop.fs.Path(
            aside.getParent(), name[1 : -len(_ASIDE_TAG)]
        )
        _heal_aside(fs, dst, aside)
