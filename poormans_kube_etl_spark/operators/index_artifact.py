"""Shared catalog-artifact plumbing for the persisted index families.

Four index families persist an ingest-time corpus artifact as bucketed
catalog tables with their build constants in table properties — MinHash
bands (operators/minhash_index.py), SRP planes
(operators/similarity_index.py), k-gram membership
(operators/substring.py), and BM25 postings
(operators/retrieval_index.py). By round 9 each carried a near-copy of
the same write/validate/read plumbing (r9 VERDICT #8); this module is
the single implementation, so the fifth family is a page of adapter
code, not a module.

What the shared layer owns:

- **Identifier validation + property escaping** (r9 ADVICE): property
  values are embedded in ``ALTER TABLE … SET TBLPROPERTIES`` SQL, so a
  value containing a single quote previously broke (or injected into)
  the statement. Values are now ``''``-escaped and table/index names
  must match a strict identifier pattern before any SQL is built.
- **Corpus freshness, two tiers** (r10 VERDICT #2): ``format_version``
  guards the LAYOUT, never the DATA — a warm session (or persistent
  metastore) whose backing parquet was regenerated would silently
  probe a stale index.

  * The PROBE-path check is ``source_files_fingerprint`` — an
    O(metadata) driver-side filesystem listing (file names + sizes +
    mtimes) of the parquet the corpus was read from, stamped at build
    time and compared on every open. Regeneration at the same path
    changes part-file names (Spark writes embed UUIDs), sizes, or
    mtimes, so it is caught WITHOUT touching a single data byte — at
    100 TB this is the same LIST every query already pays at planning
    time, where the r10 count+max aggregate was a per-open
    single-column corpus scan (the exact property the index families
    exist to avoid).
  * The count+max DATA fingerprint (``corpus_fingerprint``) remains
    stamped by every writer and kept exact across append-merges via
    ``composed_fingerprint`` (O(delta) — count and max compose), but
    on the probe path it is now an OPT-IN deep check
    (``PKE_INDEX_DEEP_VERIFY=1``) for out-of-band regeneration modes
    a listing cannot see (e.g. a byte-identical-layout rewrite).
- **The get-or-build lifecycle** shared by all query faces: read the
  artifact; on the loaders' DELIBERATE rejections (missing table,
  missing/foreign properties, version skew, half-written build — all
  raised as ValueError) rebuild with ``mode=overwrite`` and read
  again; on fingerprint mismatch, same. Unexpected read failures
  (metastore hiccups, permission errors) propagate instead of
  triggering a silent expensive rebuild (r10 ADVICE).
- **Stable identity tags** for per-(session, SF) artifact names:
  basename + md5 of the full normalized path (basename alone let
  ``/a/sf1`` and ``/b/sf1`` — or ``sf0.1`` and ``sf0_1``, which
  sanitize identically — share one index).

Reference parity note: the ingest-once/probe-many lifecycle mirrors the
reference's manifest-gated ingest (src/ingestor.js) — corpus facts are
computed when data lands, not per query.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# the property key every family stamps the count+max DATA fingerprint
# under (inside its own family prefix) — the deep check
FINGERPRINT_KEY = "fingerprint"
# the O(metadata) source-listing fingerprint — the probe-path check.
# OPTIONAL on read: pre-r11 artifacts lack it and self-heal by one
# rebuild on their first fingerprint-checked open.
SOURCE_FINGERPRINT_KEY = "source_fingerprint"


def validate_identifier(name: str, what: str = "table name") -> str:
    """Reject anything that could escape a SQL identifier position —
    names are interpolated into ALTER TABLE / SHOW TBLPROPERTIES
    statements, so only ``[A-Za-z_][A-Za-z0-9_]*`` passes."""
    if not _IDENT_RE.match(name):
        raise ValueError(
            f"{what} {name!r} is not a plain SQL identifier "
            "([A-Za-z_][A-Za-z0-9_]*) — refusing to build SQL with it"
        )
    return name


def _escape_prop(v: str) -> str:
    """Single quotes double inside SQL string literals."""
    return str(v).replace("'", "''")


def stamp_table_properties(
    spark: SparkSession, table: str, prefix: str, props: dict[str, str]
) -> None:
    """ALTER TABLE … SET TBLPROPERTIES with validated identifiers and
    escaped values — the ONLY place artifact-property SQL is built.

    Every artifact (re)build/merge/compaction ends here, so this is
    also the chokepoint that invalidates the session-scoped query-plan
    memo (r14): a memoized probe-face plan is bound to the artifact
    files it was built over, and a rebuild at the same name would
    otherwise leave it serving deleted part files."""
    validate_identifier(table)
    kv = ", ".join(
        f"'{_escape_prop(prefix + k)}'='{_escape_prop(v)}'"
        for k, v in props.items()
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")
    from poormans_kube_etl_spark.queries import clear_plan_memo

    clear_plan_memo()


def load_table_properties(
    spark: SparkSession,
    table: str,
    prefix: str,
    keys: tuple[str, ...],
    *,
    family: str,
    format_version: str,
    builder: str,
) -> dict[str, str]:
    """Read back a family's constants, loudly rejecting tables that are
    not this family's artifact (missing keys) or that were written by
    an incompatible layout (``format_version`` skew). Raises ValueError
    in every rejection case so get_or_build's except-rebuild path
    catches them uniformly."""
    validate_identifier(table)
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    constants: dict[str, str] = {}
    for k in keys:
        full = prefix + k
        if full not in props:
            raise ValueError(
                f"{table} is missing table property {full!r} — not a "
                f"{family} (or written by an older layout); rebuild with "
                f"{builder}"
            )
        constants[k] = props[full]
    # optional, shared across families: the probe-path source listing
    # stamp — absent on pre-r11 artifacts (self-heals by one rebuild)
    if prefix + SOURCE_FINGERPRINT_KEY in props:
        constants[SOURCE_FINGERPRINT_KEY] = props[prefix + SOURCE_FINGERPRINT_KEY]
    if constants["format_version"] != format_version:
        raise ValueError(
            f"{table}: index format {constants['format_version']} != "
            f"supported {format_version}; rebuild with {builder}"
        )
    return constants


def corpus_fingerprint(frame: DataFrame, id_col: str) -> str:
    """``<row count>:<max id as string>`` — the cheap data-freshness
    stamp. One column-pruned aggregate action; the max runs in the id's
    NATURAL type (cast to string only afterwards) so numeric keys
    compare numerically — a string-side max would call 0..9 and 5..14
    the same corpus ("9" > "14" lexicographically). Count+max changes
    whenever rows are appended, truncated, or regenerated with a
    different key range — the regeneration modes a path-keyed artifact
    name cannot see."""
    row = frame.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col(id_col)).cast("string").alias("mx"),
    ).collect()[0]
    return f"{row['n']}:{row['mx']}"


def composed_fingerprint(stamped: str, delta: DataFrame, id_col: str) -> str:
    """Fold an append-merged DELTA into a stamped count+max fingerprint
    without rescanning the corpus: count adds, max composes through
    ``greatest`` (computed in the id's NATURAL type — same rule as
    corpus_fingerprint). O(delta), and the fingerprint BASIS stays
    identical at build and at every merge — raw indexed source rows —
    for every family (r10 ADVICE: the minhash merge restamped from the
    shingles table, silently changing semantics after the first merge,
    while gram/fp merges left the stamp stale entirely)."""
    n_old_s, mx_old = stamped.split(":", 1)
    typ = delta.schema[id_col].dataType
    old_lit = (
        F.lit(None).cast(typ) if mx_old == "None" else F.lit(mx_old).cast(typ)
    )
    row = delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.greatest(F.col(id_col), old_lit)).cast("string").alias("mx"),
    ).collect()[0]
    mx = row["mx"] if row["mx"] is not None else mx_old
    return f"{int(n_old_s) + row['n']}:{mx}"


def source_files_fingerprint(spark: SparkSession, *paths: str) -> str:
    """O(metadata) freshness stamp: md5 over the sorted
    ``path:length:mtime`` listing of every DATA file under the given
    paths (globs allowed; hidden ``_``/``.`` files skipped to match
    Spark's data visibility). A driver-side filesystem LIST through the
    Hadoop API — no Spark job, no data bytes — so it runs identically
    on file://, s3a:// and hdfs://. Regenerated parquet at the same
    path changes part-file names (Spark embeds UUIDs), sizes, or
    mtimes; appends/truncations change the file set. The one mode a
    listing cannot see — a rewrite preserving every name, size and
    mtime — is what ``PKE_INDEX_DEEP_VERIFY=1`` exists for.

    Scheme-less relative paths are anchored on the PYTHON cwd (r12,
    ADVICE r11 medium): Hadoop resolves them against the JVM's
    launch-frozen cwd, so after a chdir the build and the probe would
    both hash the same WRONG (usually ABSENT) listing — the stamp
    always matches and the freshness check is silently inert, exactly
    the staleness mode it exists to catch. Same anchoring rule as
    sources.ingest.hadoop_fs (the r4/r7 read-path fix)."""
    from poormans_kube_etl_spark.sources.ingest import _resolve_relative

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    entries: list[str] = []

    def _add(st) -> None:
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            return
        entries.append(
            f"{st.getPath().toUri().getPath()}:{st.getLen()}"
            f":{st.getModificationTime()}"
        )

    for p in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(_resolve_relative(p))
        fs = jpath.getFileSystem(hconf)
        statuses = fs.globStatus(jpath)
        if statuses is None or len(statuses) == 0:
            entries.append(f"{p}:ABSENT")
            continue
        for st in statuses:
            if not st.isDirectory():
                _add(st)
                continue
            it = fs.listFiles(st.getPath(), True)
            while it.hasNext():
                _add(it.next())
    entries.sort()
    return hashlib.md5("\n".join(entries).encode()).hexdigest()


def deep_verify_enabled() -> bool:
    """Opt-in for the O(corpus) count+max check on the probe path."""
    return os.environ.get("PKE_INDEX_DEEP_VERIFY", "") not in ("", "0")


# ---------------------------------------------------------------------------
# Warm-open memoization of the source listing (r12, VERDICT r11 #2).
#
# source_files_fingerprint is O(file-count): honest at sf10, but at
# 100 TB a ~10^5–10^6-object S3 LIST per face open, ×5 families, is
# seconds-to-minutes of sequential paging — and a bench/ production
# session opens the same faces over the same immutable corpus paths
# hundreds of times. The fingerprint of a given path set is therefore
# memoized per process: the FIRST open pays the listing, every warm
# open compares cached strings (zero FS calls — gated the same way the
# corpus-aggregate gate works).
#
# What this demotes, deliberately: an out-of-band regeneration of the
# corpus DURING a session is no longer caught by a warm open in that
# same session (it is caught by the next process, by any cold open, or
# by PKE_INDEX_DEEP_VERIFY=1). The writers that legitimately change a
# corpus mid-session — the orchestrator's commit path, test fixtures —
# either stamp their own version token (orchestrator, r12) or call
# invalidate_source_fingerprints. PKE_SRC_FP_CACHE=0 disables the memo
# entirely.
# ---------------------------------------------------------------------------

_SRC_FP_CACHE: dict[tuple[str, ...], str] = {}


def _cache_key(paths: tuple[str, ...]) -> tuple[str, ...]:
    from poormans_kube_etl_spark.sources.ingest import _resolve_relative

    return tuple(_resolve_relative(p) for p in paths)


def cached_source_files_fingerprint(spark: SparkSession, *paths: str) -> str:
    """``source_files_fingerprint`` behind the per-process memo above —
    the PROBE-path entry point for query faces over immutable corpus
    directories. Writers and anything that mutates the listed paths
    must use ``source_files_fingerprint`` directly (always fresh) or
    invalidate first."""
    if os.environ.get("PKE_SRC_FP_CACHE", "") == "0":
        return source_files_fingerprint(spark, *paths)
    key = _cache_key(tuple(paths))
    hit = _SRC_FP_CACHE.get(key)
    if hit is not None:
        return hit
    fp = source_files_fingerprint(spark, *paths)
    _SRC_FP_CACHE[key] = fp
    return fp


def invalidate_source_fingerprints(*paths: str) -> None:
    """Drop memoized listings. With no arguments, clears the whole
    cache (test fixtures that regenerate data in bulk); with paths,
    clears exactly those entries."""
    if not paths:
        _SRC_FP_CACHE.clear()
        return
    _SRC_FP_CACHE.pop(_cache_key(tuple(paths)), None)


# ---------------------------------------------------------------------------
# Cross-session durability: the attach manifest (r11).
#
# TBLPROPERTIES live in the session catalog, not in the parquet — so a
# FRESH process used to fail read() and pay a full corpus REBUILD even
# though every artifact byte survived under the external path. At
# 100 TB that rebuild is the most expensive no-op the engine can run.
# Writers now persist a self-describing manifest (schema, bucket spec,
# properties, table names) beside the data; `attach_artifact`
# re-creates the catalog entries over the existing files (CREATE TABLE
# … CLUSTERED BY … LOCATION — Spark re-derives bucket ids from the
# part-file names) and re-stamps the properties. A fresh session's
# first open becomes O(metadata): manifest read + two DDL statements.
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_pke_artifact.json"
_MANIFEST_FORMAT = 1


def _fs_for(spark: SparkSession, path: str):
    # same Python-cwd anchoring as source_files_fingerprint (ADVICE r11
    # medium): a relative artifact root must address the directory the
    # Python-side writers used, not the JVM's launch-frozen cwd
    from poormans_kube_etl_spark.sources.ingest import _resolve_relative

    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(_resolve_relative(path))
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jpath


def _describe_table(spark: SparkSession, table: str) -> dict:
    """Catalog facts an attach needs: location, bucket spec, schema,
    and every pke.* property."""
    validate_identifier(table)
    desc = {
        r["col_name"].strip(): r["data_type"].strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r["col_name"]
    }
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        if r["key"].startswith("pke.")
    }
    schema = spark.table(table).schema
    return {
        "name": table,
        "location": desc["Location"],
        "n_buckets": int(desc["Num Buckets"]),
        "bucket_cols": [
            c.strip(" `")
            for c in desc["Bucket Columns"].strip("[]").split(",")
        ],
        "schema": [[f.name, f.dataType.simpleString()] for f in schema.fields],
        "properties": props,
    }


def write_artifact_manifest(
    spark: SparkSession, path: str, tables: tuple[str, ...]
) -> None:
    """Persist the family's catalog metadata beside its data files
    (``<path>/_pke_artifact.json``, tmp+rename). Call AFTER the tables
    are written and stamped — the manifest snapshots the catalog, so a
    merge that restamps properties must refresh it
    (refresh_artifact_manifest) or a later attach resurrects stale
    stamps."""
    import json

    manifest = {
        "format": _MANIFEST_FORMAT,
        "tables": [_describe_table(spark, t) for t in tables],
    }
    fs, root = _fs_for(spark, path)
    jvm = spark.sparkContext._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(path, MANIFEST_NAME + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=1).encode()))
    finally:
        out.close()
    final = jvm.org.apache.hadoop.fs.Path(path, MANIFEST_NAME)
    fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise OSError(f"manifest rename failed under {path}")


def refresh_artifact_manifest(spark: SparkSession, table: str) -> None:
    """Re-snapshot a family's manifest after a merge restamped its
    properties. The artifact root is the parent of the table's
    location; if no manifest exists there (warehouse-managed tables,
    pre-r11 artifacts), this is a silent no-op — those artifacts keep
    their rebuild-on-fresh-session behavior."""
    import json
    import posixpath

    info = _describe_table(spark, table)
    root = posixpath.dirname(info["location"].rstrip("/"))
    fs, _ = _fs_for(spark, root)
    jvm = spark.sparkContext._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(root, MANIFEST_NAME)
    if not fs.exists(mpath):
        return
    stream = fs.open(mpath)
    try:
        manifest = json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()
    manifest["tables"] = [
        info if t["name"] == table else t for t in manifest["tables"]
    ]
    tmp = jvm.org.apache.hadoop.fs.Path(root, MANIFEST_NAME + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=1).encode()))
    finally:
        out.close()
    fs.delete(mpath, False)
    if not fs.rename(tmp, mpath):
        raise OSError(f"manifest rename failed under {root}")


def attach_artifact(spark: SparkSession, path: str) -> bool:
    """Re-create a persisted artifact's catalog entries from its
    manifest — the fresh-session fast path. Returns False when no
    manifest exists (caller falls back to build). Every identifier from
    the manifest is validated before any SQL is assembled, and the
    schema is rebuilt from (name, simpleString) pairs — a tampered
    manifest cannot smuggle SQL through DDL. Tables already in the
    catalog are left untouched (attach is idempotent)."""
    import json

    fs, _ = _fs_for(spark, path)
    jvm = spark.sparkContext._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(path, MANIFEST_NAME)
    if not fs.exists(mpath):
        return False
    stream = fs.open(mpath)
    try:
        manifest = json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()
    if manifest.get("format") != _MANIFEST_FORMAT:
        return False  # unknown layout: let the caller rebuild
    type_re = re.compile(r"^[a-z0-9_<>,(): ]+$")  # simpleString grammar;
    # no quotes/semicolons, so a tampered manifest cannot break out of
    # the column list
    for t in manifest["tables"]:
        name = validate_identifier(t["name"])
        if spark.catalog.tableExists(name):
            continue
        for _c, dt in t["schema"]:
            if not type_re.match(dt):
                raise ValueError(f"manifest type {dt!r} is not a plain type string")
        cols = ", ".join(
            f"{validate_identifier(c, 'column')} {dt}" for c, dt in t["schema"]
        )
        bucket_cols = ", ".join(
            validate_identifier(c, "bucket column") for c in t["bucket_cols"]
        )
        n_buckets = int(t["n_buckets"])
        loc = _escape_prop(t["location"])
        try:
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({bucket_cols}) INTO {n_buckets} BUCKETS "
                f"LOCATION '{loc}'"
            )
        except Exception:
            # two sessions attaching the same artifact race on CREATE;
            # the loser is fine as long as the table now exists
            if not spark.catalog.tableExists(name):
                raise
        if t["properties"]:
            # keys are stored fully prefixed (pke.<family>.<k>)
            stamp_table_properties(spark, name, "", t["properties"])
    return True


def sf_dir_tag(sf_dir: str) -> str:
    """Artifact-name identity for a data directory: sanitized basename
    + md5 of the FULL normalized path (collision rule shared by all
    families — see module docstring)."""
    norm = os.path.normpath(os.path.abspath(sf_dir))
    return (
        re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(norm))
        + "_"
        + hashlib.md5(norm.encode()).hexdigest()[:8]
    )


def get_or_build(
    read: Callable[[], Any],
    build: Callable[[], None],
    *,
    live_fingerprint: str | None = None,
    fingerprint_key: str = FINGERPRINT_KEY,
    deep_fingerprint: Callable[[], str] | None = None,
    attach: Callable[[], bool] | None = None,
) -> Any:
    """The artifact lifecycle every query face shares.

    ``read`` must raise ValueError on any incomplete/foreign/version-
    skewed artifact (the loaders above reject with exactly that);
    ``build`` must write with ``mode='overwrite'`` so a half-written
    artifact from a crashed build — or a stale one from an earlier
    process whose tables the in-memory catalog forgot — is replaced,
    not an eternal error. Any OTHER read failure (metastore hiccup,
    permission error) propagates: a transient fault must surface, not
    silently fund a full rebuild (r10 ADVICE); and if the rebuild
    itself fails, the original read failure rides along as __cause__.

    ``live_fingerprint`` is the freshness check on the PROBE path —
    since r11 the faces pass ``source_files_fingerprint`` (O(metadata))
    under ``fingerprint_key=SOURCE_FINGERPRINT_KEY``; a successfully-
    read artifact whose stamped value differs is rebuilt: the
    regenerated-data-at-same-path staleness mode (r9 ADVICE).

    ``deep_fingerprint`` is the opt-in O(corpus) count+max check
    (lazy — only computed when ``PKE_INDEX_DEEP_VERIFY=1``), compared
    against the stamped ``FINGERPRINT_KEY`` the writers/merges keep
    exact.

    ``attach`` (usually ``lambda: attach_artifact(spark, path)``) runs
    between a failed read and the rebuild: a fresh session whose
    catalog forgot the tables re-creates them from the persisted
    manifest — O(metadata) — instead of paying the corpus build. The
    attached artifact still passes through the same fingerprint checks,
    so attaching can never resurrect stale data silently. A torn or
    foreign manifest (ValueError, which JSONDecodeError subclasses)
    falls through to build; unexpected faults propagate.
    """
    try:
        idx = read()
    except ValueError as read_err:
        idx = None
        if attach is not None:
            try:
                if attach():
                    idx = read()
            except ValueError:
                idx = None
        if idx is None:
            try:
                build()
            except Exception as build_err:
                raise build_err from read_err
            return read()

    def _stale(key: str, live: str) -> bool:
        return getattr(idx, "constants", {}).get(key) != live

    rebuild = live_fingerprint is not None and _stale(
        fingerprint_key, live_fingerprint
    )
    if not rebuild and deep_fingerprint is not None and deep_verify_enabled():
        rebuild = _stale(FINGERPRINT_KEY, deep_fingerprint())
    if rebuild:
        build()
        idx = read()
    return idx
