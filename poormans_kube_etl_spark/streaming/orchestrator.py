"""File-arrival-driven ingest orchestrator — the reference's control
plane (EP1/EP2/EP3) rebuilt as a thin driver loop around Spark batch
pipelines.

Reference semantics preserved (file:line cites into /root/reference):
- poll a landing prefix ``pending/`` for Unix-timestamped folders
  (src/ingestor.js:75, src/helpers.js:14-20)
- select the OLDEST timestamped folder that carries a marker file
  ``bulk.txt`` / ``incremental.txt`` (src/helpers.js:22-39 — min-by O1,
  marker filter F3); folders without a marker are invisible
  (src/helpers.spec.js:141-145)
- a folder is not a batch until its ``manifest.json`` exists
  (src/ingestor.js:109-118 — EP2)
- bulk → the two store pipelines run in PARALLEL; delta → in SERIES,
  graph store first (src/ingestor.js:272-287)
- stale same-kind work is preempted before relaunch
  (src/ingestor.js:136-146) — here: cancel the Spark job group and
  overwrite sinks idempotently
- after both pipelines finish: delete the ingested folder, then append
  one metrics row with ``"Xh:YYmins"`` durations (src/ingestor.js:304-346
  — EP3; duration math src/helpers.js:65-73 incl. the %24 hour wrap)
- any failure → error state, loop halts (src/ingestor.js:71-74,289-292)

Upgrades over the reference (SURVEY.md §2a "not present", §7 M2):
- ``verify_manifest`` actually checks the payload: sha2-256 of file
  bytes (binaryFile source) equi-joined with the manifest on FileName —
  the reference only probes manifest PRESENCE (src/ingestor.js:113-117)
- the neo4j/elastic Jobs were opaque external pods (README.md:36-55);
  here they are real Spark pipelines: a graph-shaped sink (nodes +
  foreign-key edges) and an index-shaped sink (flattened documents)

Paths go through the Hadoop FileSystem API, so the same code runs on
``file://`` in tests and ``s3a://``/``hdfs://`` on a cluster; listing a
prefix is the control-plane metadata operation the reference's
listObjectsV2 was (S1) — payload bytes only ever move through executor
scans, never the driver.
"""

from __future__ import annotations

import hashlib
import re
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from poormans_kube_etl_spark.functions import duration_hmm
from poormans_kube_etl_spark.session import apply_runtime_confs
from poormans_kube_etl_spark.sources import ingest as ingest_sources

MARKER_FILES = ("bulk.txt", "incremental.txt")
PENDING_PREFIX = "pending"
# Folder-claim lease marker (r8, VERDICT r7 #2): written into a pending
# folder by the replica that owns its ingest, so the reference's
# ``replicas: 3`` Deployment (README.md:73) is safe to run — concurrent
# pollers process disjoint folders instead of double-ingesting the same
# oldest one. Control metadata like the markers: outside the manifest
# and the *.gz verify glob.
CLAIM_FILE = "_CLAIMED"

METRICS_COLUMNS = (
    "ingest",
    "type",
    "load_date",
    "readable_date",
    "neo_job_duration",
    "elastic_job_duration",
    "total_job_duration",
    "neo_rows",
    "elastic_rows",
)


@dataclass
class IngestParams:
    """The reference's ``{ingestName, ingestType}`` (src/helpers.js:36-37)."""

    ingest_name: str
    ingest_type: str  # 'bulk' | 'incremental'

    @property
    def job_type(self) -> str:
        # bulk -> 'bulk', incremental -> 'delta' (src/ingestor.js:122)
        return "bulk" if self.ingest_type == "bulk" else "delta"


@dataclass(frozen=True)
class DedupIndexMaintenance:
    """Opt-in dedup-index lifecycle wiring (r10, VERDICT r09 #3): when
    set, ``finalize()`` folds each committed ingest's documents into a
    persisted corpus MinHash index, so the NEXT ingest's dedup screen
    probes an index that already contains this one — index maintenance
    becomes part of the ingest lifecycle instead of caller homework.

    ``entity`` names the ingested entity whose rows are the documents;
    ``id_col``/``text_col`` address its committed (string-cast) sink
    columns. Indexes land as EXTERNAL bucketed tables under
    ``<output_dir>/dedup_index/``; ``families`` picks which artifacts
    stay warm:

    - ``"minhash"`` (catalog name ``index_name``): bootstrap on first
      commit, delta-sized fragment appends after, compact-by-rebuild
      past ``max_fragments``.
    - ``"gram"`` (``<index_name>_gram``): same append/compact cycle
      for the substring-decontamination gram set (width ``gram_k``).
    - ``"bm25"`` (``<index_name>_bm25``): REBUILT from every committed
      ingest's sink on each commit — df/n_docs/avgdl are global facts
      denormalized onto every posting row, so there is no
      append-shaped merge (operators/index_maintenance.py policy).
    - ``"exact"`` (``<index_name>_fp``): the keeper-resolved
      fingerprint set (operators/exact_index.py), same append/compact
      cycle — the cheapest and most common incremental screen.
    - ``"srp"`` (``<index_name>_srp``, r12): the embedding near-dup
      family, for deployments whose ingests carry a VECTOR entity —
      ``vec_entity`` names it, ``vec_id_col``/``vec_col`` address its
      GRAPH-sink columns (the graph sink preserves source types; the
      index sink casts everything to string, so it cannot feed a
      vector family). Same bootstrap/append/compact cycle, banding
      auto-planned at ``srp_threshold`` from the settled corpus size.
      An ingest that carries no vector entity stamps the family's
      marker as a no-op, exactly like a doc-less ingest does for the
      text families.

    Durable PER-FAMILY per-ingest markers (r12, ADVICE r11 — stamped
    immediately after each family's merge) make maintenance idempotent
    under X5 relaunch; the residual window is a crash between ONE
    family's append and its own marker, whose duplicate fragment costs
    join fan-out until the next compaction, never correctness (the
    append-merge invariant). Maintenance itself runs under a
    per-index-root filesystem lease (streaming/lease.py, VERDICT r11
    #1) so replicas finalizing different ingests serialize their
    merges, property restamps and manifest refreshes;
    ``lease_timeout_s`` bounds how long a replica waits behind a peer
    before treating the pass as failed (X7 class — the markers let a
    relaunch resume).

    ``compaction`` (r13, VERDICT r12 #7) picks what happens when a
    family's fragment trail exceeds ``max_fragments``:

    - ``"inline"``: rebuild from the full settled corpus inside the
      finalize path, under the same lease — fine at test scale, but at
      100 TB that rebuild is hours during which every replica's
      maintenance blocks on the lease and then halts via
      ``lease_timeout_s``.
    - ``"defer"``: finalize stays O(delta) — the merge lands, a durable
      ``_needs_compaction/<family>`` flag is raised, and the rebuild
      waits for an explicit maintenance window:
      ``Orchestrator.compact_dedup_indexes()`` (or the ``compact`` CLI
      verb), which rebuilds exactly the flagged families under its own
      lease acquisition. Until then queries pay fragment fan-out —
      bounded, monotone, and priced by the ``fragments`` count the
      maintainer reports — never wrong answers (append invariant)."""

    entity: str
    id_col: str = "doc_id"
    text_col: str = "text"
    index_name: str = "pke_ingest_mhidx"
    families: tuple = ("minhash",)
    shingle_len: int = 3
    num_hashes: int = 32
    bands: int = 8
    hash_family: str = "xxhash64"
    gram_k: int = 8
    n_buckets: int = 8
    max_fragments: int = 16
    lease_timeout_s: float = 1800.0
    compaction: str = "inline"  # or "defer" — see class docstring
    # the vector entity feeding the "srp" family (None = family off)
    vec_entity: str | None = None
    vec_id_col: str = "vec_id"
    vec_col: str = "embedding"
    srp_threshold: float = 0.9


@dataclass
class Times:
    """Per-ingest timing accumulator (reference Times class,
    src/helpers.js:89-120): start/end per store + the ingest file list.
    Row counts come from query-execution Observations — measured during
    the pipeline writes, never by a second scan."""

    neo_start: float | None = None
    neo_end: float | None = None
    elastic_start: float | None = None
    elastic_end: float | None = None
    neo_rows: int = 0
    elastic_rows: int = 0
    ingest_files: list[str] = field(default_factory=list)
    # which ingest the cached listing belongs to — consumers must check
    # this before trusting ingest_files (ADVICE r06: a direct run_ingest
    # after a prior un-finalized failure would otherwise pair the stale
    # folder's keys with the new params)
    ingest_files_name: str | None = None

    def is_complete(self) -> bool:  # A5 completion conjunction
        return self.neo_end is not None and self.elastic_end is not None

    def reset_pipeline_state(self) -> None:
        """Clear the per-run counters and stamps but KEEP the cached
        listing (validated separately by ingest_files_name). run_ingest
        calls this on entry (r7 review): a retry after a partial
        failure in the same process — clear_halt + checkpoint
        redelivery, or a direct run_ingest — used to ADD the rerun's
        Observation rows onto the crashed attempt's, doubling
        neo_rows/elastic_rows in the metrics sink."""
        self.neo_start = self.neo_end = None
        self.elastic_start = self.elastic_end = None
        self.neo_rows = self.elastic_rows = 0

    def reset(self) -> None:
        self.reset_pipeline_state()
        self.ingest_files = []
        self.ingest_files_name = None


class Orchestrator:
    """Folder-lifecycle ETL driver: discover → gate → verify → run → finalize.

    ``landing_dir`` holds the ``pending/`` tree (any Hadoop-visible URI);
    ``output_dir`` receives ``graph/``, ``index/`` and ``ingest_metrics``
    parquet sinks.
    """

    def __init__(
        self,
        spark: SparkSession,
        landing_dir: str,
        output_dir: str,
        poll_interval_s: float = 60.0,
        strict_manifest: bool = True,
        settle_delay_s: float = 0.0,
        bucket_buckets: int = 0,
        replica_id: str | None = None,
        claim_ttl_s: float = 1800.0,
        claim_settle_s: float = 0.05,
        dedup_index: DedupIndexMaintenance | None = None,
    ):
        self.spark = apply_runtime_confs(spark)
        # Resolve RELATIVE dirs against the Python cwd ONCE, up front
        # (r5 review): hadoop_fs-based ops resolve them per-call, but
        # spark.read/readStream consumers (read_manifest, binaryFile,
        # the manifest stream) hand raw paths to the JVM, which anchors
        # them on its LAUNCH cwd — a relative --landing would gate on
        # one directory and read payloads from another.
        self.landing_dir = ingest_sources._resolve_relative(
            landing_dir
        ).rstrip("/")
        self.output_dir = ingest_sources._resolve_relative(output_dir).rstrip("/")
        self.poll_interval_s = poll_interval_s
        self.strict_manifest = strict_manifest
        # X6 tail (reference src/ingestor.js:259 sleeps one poll cycle
        # after job success before declaring the store settled). Spark
        # actions are synchronous so the barrier itself is free; this
        # knob exists for sinks with eventual-consistency semantics
        # (e.g. an external index refreshing). Default 0: no analogue
        # needed for parquet sinks (SURVEY §2a X6 decision).
        self.settle_delay_s = settle_delay_s
        # r7 (VERDICT r06 #5): >0 makes the graph store land BUCKETED on
        # its stable workload keys — nodes by the entity id, edges by
        # src, same bucket count — so every downstream nodes⋈edges /
        # edge-traversal join on those keys is exchange-free. The shuffle
        # is paid once at ingest; the measured crossover (SCALING.md,
        # bucketed_join bench stage) repays the write after ~10 joins and
        # falls as data grows. 0 (default) keeps plain parquet sinks.
        self.bucket_buckets = bucket_buckets
        # Multi-replica coordination (r8): each poller carries a stable
        # identity for its claim markers; claims older than claim_ttl_s
        # are presumed orphaned (claimer crashed between claim and
        # finalize) and may be broken by a live replica. The lease is
        # renewed after the sha-verify stage, so size claim_ttl_s to
        # the worst-case duration of a single PHASE (verify, or the
        # store pipelines), not the whole ingest.
        if replica_id is None:
            import os
            import socket
            import uuid

            replica_id = f"{socket.gethostname()}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.replica_id = replica_id
        self.claim_ttl_s = claim_ttl_s
        self.claim_settle_s = claim_settle_s
        self.dedup_index = dedup_index
        self.timer = Times()
        self.errored: str | None = None  # X7 error state
        # consecutive transient scan failures (listing/gating); reset on
        # any successful scan — never escalates to the X7 halt
        self.scan_failures: int = 0

    # ---- filesystem (Hadoop FS: file:// in tests, s3a:// in prod) ----

    def list_keys(
        self, folder: str | None = None, max_segments: int | None = None
    ) -> list[str]:
        """S1 prefix scan: all keys under ``pending/`` (or just
        ``pending/<folder>`` when given), relative to the landing dir
        (the reference's listObjectsV2 Contents[].Key — which takes the
        same narrower Prefix for the manifest probe,
        src/ingestor.js:111-113). ``max_segments`` bounds what the
        driver RETAINS (see sources.ingest.list_prefix)."""
        prefix = PENDING_PREFIX if folder is None else f"{PENDING_PREFIX}/{folder}"
        return ingest_sources.list_prefix(
            self.spark, self.landing_dir, prefix, max_segments
        )

    # ---- folder-claim lease (r8: multi-replica watch, VERDICT r7 #2) ----

    def _claim_path(self, folder: str) -> str:
        return f"{self.landing_dir}/{PENDING_PREFIX}/{folder}/{CLAIM_FILE}"

    def _claim_is_stale(self, folder: str) -> bool:
        """True when the folder carries NO live claim: none at all, or
        one older than ``claim_ttl_s`` (the claimer crashed between
        claim and finalize — finalize deletes the whole folder, claim
        included, so a long-lived marker means an orphan). Staleness
        reads the FILESYSTEM mtime, not the marker body: no clock
        parsing, and an S3 PUT's server-side timestamp is within TTL
        granularity of the driver clock."""
        fs, jpath = ingest_sources.hadoop_fs(self.spark, self._claim_path(folder))
        if not fs.exists(jpath):
            return True
        age_ms = time.time() * 1000 - fs.getFileStatus(jpath).getModificationTime()
        return age_ms > self.claim_ttl_s * 1000

    def claim_folder(self, folder: str) -> bool:
        """Atomically claim ``pending/<folder>`` for this replica; True
        means this replica owns the ingest.

        Claim = write ``_claim.<replica>.tmp``, RENAME to ``_CLAIMED``,
        then READ BACK (twice, with a short settle pause): POSIX rename
        REPLACES an existing destination (HDFS's no-overwrite rename is
        the exception, not the rule), so rename success does not prove
        ownership — the marker CONTENT is the single source of truth.
        The read-back arbitration is PROBABILISTIC, not exact (ADVICE
        r08): if replica A renames and reads its own id back before
        replica B's replacing rename lands, both observe themselves as
        owner in their first probe. The ``claim_settle_s`` pause plus a
        second ``_owns_claim`` probe shrinks that window to
        near-simultaneous renames; what remains is self-healed by the
        post-verify renewal (the loser's renewal reads the winner's id
        and yields before any store writes). Re-claiming our OWN
        live claim (clear_halt retry, checkpoint redelivery, the
        post-verify lease renewal) refreshes the marker mtime IN PLACE
        via setTimes — no delete window for a peer to race into
        (r8 review: the delete+recreate renewal let a peer grab the
        folder mid-renewal). A stale claim (see ``_claim_is_stale``) is
        deleted first and the rename+readback arbitrates among the
        breakers. On s3a, rename is copy+delete — the read-back closes
        most of the window; the residual double-ingest exposure is the
        one the reference's ``replicas: 3`` Deployment ran with NO
        coordination at all, both store sinks are idempotent
        overwrites, and a loser dying mid-run is absorbed by the
        vanished-folder transient path. Any FS error reads as
        claim-lost (transient-scan class, re-polled), never as
        ownership."""
        try:
            fs, dst = ingest_sources.hadoop_fs(self.spark, self._claim_path(folder))
            # the folder must still exist (r8 review): Hadoop create()
            # makes parent dirs implicitly, so claiming a folder a peer
            # just FINALIZED would resurrect it as an empty shell whose
            # verify then fails — a benign race turned into an X7 halt
            # plus a stray pending/ entry. Vanished folder = claim lost.
            if not fs.exists(dst.getParent()):
                return False
            if fs.exists(dst):
                if self._owns_claim(folder):
                    # renew by overwriting IN PLACE: one atomic replace
                    # (a plain PUT on S3), refreshing mtime on every FS
                    # — setTimes is a silent no-op on s3a, and a
                    # delete+recreate renewal opens a window a peer can
                    # race into (r8 review, twice)
                    out = fs.create(dst, True)
                    try:
                        out.write(bytearray(self.replica_id.encode("utf-8")))
                    finally:
                        out.close()
                    return True
                if not self._claim_is_stale(folder):
                    return False
                fs.delete(dst, False)  # break the orphan; readback arbitrates
            tmp_key = (
                f"{self.landing_dir}/{PENDING_PREFIX}/{folder}/"
                f"_claim.{self.replica_id}.tmp"
            )
            _, tmp = ingest_sources.hadoop_fs(self.spark, tmp_key)
            out = fs.create(tmp, True)
            try:
                out.write(bytearray(self.replica_id.encode("utf-8")))
            finally:
                out.close()
            if not bool(fs.rename(tmp, dst)):
                fs.delete(tmp, False)  # lost outright: clean up our tmp
                return False
            if not self._owns_claim(folder):  # content arbitrates racers
                return False
            # settle re-read (ADVICE r08): give an in-flight replacing
            # rename from a racer time to land before declaring victory
            if self.claim_settle_s > 0:
                time.sleep(self.claim_settle_s)
                return self._owns_claim(folder)
            return True
        except Exception as e:
            print(f"orchestrator: claim on {folder} failed ({e}); treating as lost")
            return False

    def _owns_claim(self, folder: str) -> bool:
        try:
            return (
                ingest_sources.read_small_text(self.spark, self._claim_path(folder))
                == self.replica_id
            )
        except Exception:
            return False  # vanished/unreadable mid-probe: not ours

    def _actively_claimed(self, keys: list[str]) -> set[str]:
        """Folders in ``keys`` carrying a LIVE (non-stale) claim from
        ANOTHER replica — our own claims stay visible so retry flows
        (clear_halt + re-poll) re-discover the folder we already own.
        The staleness/ownership probes are two metadata calls per
        claimed folder — the claimed set is bounded by the replica
        count, never the folder count, so this stays O(replicas)."""
        claimed = {
            k.split("/")[1]
            for k in keys
            if k.split("/")[2:3] == [CLAIM_FILE]
        }
        return {
            f
            for f in claimed
            if not self._claim_is_stale(f) and not self._owns_claim(f)
        }

    # ---- selection (P1/P2/F1/F3/O1 as DataFrame ops) ----

    def discover(self) -> IngestParams | None:
        """Oldest timestamped folder carrying a marker file — and no
        live claim from another replica (r8) — or None.

        Retains only depth-2 control keys (markers/manifest/_CLAIMED:
        3 segments), so driver memory for the poll cycle is O(folders)
        even when the folders hold a million payload objects (r8,
        VERDICT r7 #4 — payload keys were retained and immediately
        discarded by the marker filter)."""
        keys = self.list_keys(max_segments=3)
        if not keys:
            return None
        active = self._actively_claimed(keys)
        inv = self.spark.createDataFrame([(k,) for k in keys], "key string")
        seg = F.split("key", "/")
        # F.get / try_cast: noise keys ('pending/.DS_Store', non-numeric
        # folders) must yield NULL, not ANSI errors (F9 null guard)
        marked = (
            inv.select(
                F.get(seg, 1).alias("folder"),
                F.get(seg, 2).alias("file"),
                F.expr("try_cast(get(split(key, '/'), 1) AS BIGINT)").alias("ts"),
            )
            .where(F.col("file").isin(*MARKER_FILES))  # F3
            .where(F.col("ts").isNotNull())  # F1
        )
        if active:
            # another replica owns these — invisible to this poller, so
            # it moves on to the next-oldest unclaimed folder instead of
            # idling behind a peer's in-flight ingest
            marked = marked.where(~F.col("folder").isin(*sorted(active)))
        # marker-name tiebreak (r7 review): a folder carrying BOTH
        # markers used to route bulk-or-delta nondeterministically
        # (orderBy ts alone, two tied rows); 'bulk.txt' sorts first,
        # matching _sweep_folders' sorted-keys pick in stream mode
        oldest = marked.orderBy(F.col("ts").asc(), F.col("file").asc()).limit(1).collect()  # O1
        if not oldest:
            return None
        row = oldest[0]
        return IngestParams(
            ingest_name=row.folder,
            ingest_type=row.file.replace(".txt", ""),  # P4
        )

    def manifest_ready(self, params: IngestParams) -> bool:
        """EP2 gate: the folder's manifest.json exists."""
        return ingest_sources.path_exists(
            self.spark,
            f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}/manifest.json",
        )

    def ingest_files(self, params: IngestParams) -> list[str]:
        """F7: keys belonging to this ingest (payload files only —
        csv.gz entities plus jsonl.gz entities, r6; landing payloads are
        gzipped in BOTH families so one ``*.gz`` verify glob covers the
        whole manifest) — listed under the ingest's own prefix, not the
        whole landing dir."""
        return [
            k
            for k in self.list_keys(params.ingest_name)
            if k.endswith((".csv.gz", ".jsonl.gz"))
        ]

    # ---- manifest verification (the implied join, upgraded to real) ----

    def verify_manifest(self, params: IngestParams) -> DataFrame:
        """Join sha2(file bytes) with the manifest on FileName.

        Returns rows (FileName, expected_sha256, actual_sha256, status)
        with status in {'ok','mismatch','missing_file','unlisted_file'}.
        Runs on executors via the binaryFile source — the driver never
        touches payload bytes.
        """
        folder = f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}"
        manifest = ingest_sources.read_manifest(self.spark, folder)
        # glob "*.gz" covers BOTH payload families (csv.gz and jsonl.gz,
        # r6); control files (markers, manifest, schema sidecars) stay
        # outside it, so they surface as neither missing nor unlisted
        actual = ingest_sources.read_binary_with_sha(
            self.spark,
            folder,
            f"{PENDING_PREFIX}/{params.ingest_name}/(.+)$",
            glob="*.gz",
        )
        joined = manifest.join(actual, "file_name", "full_outer")
        return joined.select(
            "file_name",
            "expected_sha256",
            "actual_sha256",
            F.when(F.col("expected_sha256").isNull(), F.lit("unlisted_file"))
            .when(F.col("actual_sha256").isNull(), F.lit("missing_file"))
            .when(
                F.col("expected_sha256") == F.col("actual_sha256"), F.lit("ok")
            )
            .otherwise(F.lit("mismatch"))
            .alias("status"),
        )

    # ---- the two store pipelines (stand-ins for the external Jobs) ----

    def _read_entities(self, params: IngestParams) -> dict[str, DataFrame]:
        """Read each entity's payload files into a DataFrame.

        Two entity families, dispatched per folder on the payload
        extension (r6 adds the second):

        - ``*.csv.gz`` with the schema shipped in the entity's
          ``*_headers.csv.gz`` sidecar (data model D6);
        - ``*.jsonl.gz`` with the schema shipped in the entity's
          ``<entity>_schema.txt`` sidecar (a one-line DDL string — the
          JSONL twin of the header sidecar; ``read_jsonl`` requires an
          explicit contract, never inference). Malformed lines are NOT
          an entity's problem: the VALID side flows to the pipelines,
          and ``_quarantine_jsonl`` persists the raw bad lines under
          ``{output}/quarantine/``. A MISSING sidecar raises — same X7
          halt class as a failed pipeline, because silently inferring a
          schema is exactly what the reader's contract forbids.
        """
        folder = f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}"
        # the VERIFIED listing, not a fresh one (r7 review): re-listing
        # here let files uploaded AFTER manifest verification flow into
        # the stores sha-unchecked, and the graph and index pipelines —
        # each listing at its own time — could ingest DIFFERENT file
        # sets; it also paid 2 extra object-store listings per ingest
        # against _quarantine_jsonl's own O(2 per folder) rationale.
        # Same name-keyed cache discipline as _quarantine_jsonl.
        if self.timer.ingest_files_name == params.ingest_name:
            files = self.timer.ingest_files
        else:
            files = self.ingest_files(params)
        entities: dict[str, list[str]] = {}
        for key in files:
            parts = key.split("/")
            if len(parts) < 4:  # pending/<ts>/<entity>/<file>
                continue
            entities.setdefault(parts[2], []).append(key)
        out = {}
        for entity, keys in entities.items():
            jsonl = [k for k in keys if k.endswith(".jsonl.gz")]
            if jsonl:
                if any(k.endswith(".csv.gz") for k in keys):
                    # a mixed folder means the producer is confused;
                    # silently ignoring one family would be data loss —
                    # same X7 halt class as a failed pipeline
                    raise ValueError(
                        f"entity {entity!r} in {params.ingest_name} mixes "
                        "csv.gz and jsonl.gz payloads — one family per "
                        "entity folder"
                    )
                valid, _ = ingest_sources.split_quarantine(
                    self._parse_jsonl_entity(folder, entity, jsonl)
                )
                out[entity] = valid
                continue
            headers = [k for k in keys if k.endswith("_headers.csv.gz")]
            data = [k for k in keys if not k.endswith("_headers.csv.gz")]
            if not data:
                continue
            out[entity] = ingest_sources.read_csv_gz_with_header_sidecar(
                self.spark,
                [f"{self.landing_dir}/{k}" for k in data],
                f"{self.landing_dir}/{headers[0]}" if headers else None,
            )
        return out

    def _parse_jsonl_entity(
        self, folder: str, entity: str, keys: list[str]
    ) -> DataFrame:
        """PERMISSIVE schema-contract parse of one JSONL entity (corrupt
        column still attached — callers split)."""
        ddl = ingest_sources.read_small_text(
            self.spark, f"{folder}/{entity}/{entity}_schema.txt"
        ).strip()
        return ingest_sources.read_jsonl(
            self.spark, [f"{self.landing_dir}/{k}" for k in keys], ddl
        )

    def _quarantine_jsonl(self, params: IngestParams) -> None:
        """Persist every JSONL entity's malformed raw lines to
        ``{output}/quarantine/{ingest}/{entity}`` (overwrite — idempotent
        under X5 relaunch, like the store sinks). Runs BEFORE the store
        pipelines so a quarantine-sink failure halts the ingest rather
        than stranding bad lines after the stores already loaded.

        Reuses the caller's F7 listing (``timer.ingest_files``, set by
        both lifecycles right before ``run_ingest``) instead of
        re-listing the folder — the hundred-folder fan-out gate pins
        listings at O(2 per folder), and a third per-folder scan of an
        object store is real money at fleet scale. The cache is keyed to
        the ingest name (ADVICE r06): a direct ``run_ingest`` call after
        a prior ingest failed un-finalized must not pair the stale
        folder's keys with this params' schema sidecars, so a name
        mismatch falls back to a fresh listing."""
        folder = f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}"
        if self.timer.ingest_files_name == params.ingest_name:
            files = self.timer.ingest_files
        else:
            files = self.ingest_files(params)
        entities: dict[str, list[str]] = {}
        for key in files:
            parts = key.split("/")
            if len(parts) >= 4 and key.endswith(".jsonl.gz"):
                entities.setdefault(parts[2], []).append(key)
        for entity, keys in entities.items():
            _, quarantined = ingest_sources.split_quarantine(
                self._parse_jsonl_entity(folder, entity, keys)
            )
            quarantined.write.mode("overwrite").parquet(
                f"{self.output_dir}/quarantine/{params.ingest_name}/{entity}"
            )

    @staticmethod
    def _table_ident(*parts: str) -> str:
        """Join name parts into a valid unquoted Spark table identifier.

        Ingest names are epoch-digit folders in the reference layout,
        but ENTITY names are user-controlled folder segments — a
        hyphen/dot there is fine for the parquet paths yet illegal in
        an unquoted ``saveAsTable`` identifier, and letting it through
        would halt a valid ingest at the sink. Sanitize to lowercase
        ``[a-z0-9_]`` and, when anything changed, suffix a short
        content hash of the original so ``a-b`` and ``a_b`` cannot
        collide on the same table. Lowercasing happens BEFORE the
        changed-check (r7 review): Spark resolves table identifiers
        case-insensitively, so entities ``Person`` and ``person``
        would otherwise map to the SAME catalog table and the second
        write would silently repoint it at the wrong entity's path."""
        out = []
        for p in parts:
            clean = re.sub(r"[^a-z0-9_]", "_", p.lower())
            if clean != p:
                clean += "_" + hashlib.md5(p.encode()).hexdigest()[:6]
            out.append(clean)
        return "_".join(out)

    def _write_graph_sink(
        self, df: DataFrame, kind: str, params: IngestParams, entity: str,
        bucket_col: str | None,
    ) -> None:
        """One graph-store sink write: plain parquet, or — when
        ``bucket_buckets`` is set and the frame has a key — a bucketed
        catalog table at the SAME path (``saveAsTable`` with an explicit
        path = external table; overwrite stays idempotent under X5
        relaunch). Bucketed-and-sorted on the key, so downstream joins
        on it need neither exchange nor sort."""
        path = f"{self.output_dir}/graph/{kind}/{params.ingest_name}/{entity}"
        if self.bucket_buckets and bucket_col is not None:
            from poormans_kube_etl_spark.operators.partitioning import write_bucketed

            write_bucketed(
                df,
                self._table_ident("graph", kind, params.ingest_name, entity),
                path,
                [bucket_col],
                self.bucket_buckets,
                sort_cols=[bucket_col],
            )
        else:
            df.write.mode("overwrite").parquet(path)

    def _graph_pipeline(self, params: IngestParams) -> None:
        """neo4j stand-in: nodes + foreign-key edges, parquet sinks
        (bucketed on the stable keys when ``bucket_buckets`` > 0).

        Overwrite by ingest folder = idempotent re-run (X5 preemption
        becomes safe relaunch)."""
        sc = self.spark.sparkContext
        sc.setJobGroup(f"neo4j-{params.job_type}-{params.ingest_name}", "graph load")
        try:
            for entity, df in self._read_entities(params).items():
                id_cols = [c for c in df.columns if c == f"{entity}_id" or c == "id"]
                nodes = df.withColumn("_entity", F.lit(entity)).withColumn(
                    "_ingest", F.lit(params.ingest_name)
                )
                # Observation: count rows DURING the write (no re-scan)
                obs = Observation()
                self._write_graph_sink(
                    nodes.observe(obs, F.count(F.lit(1)).alias("n")),
                    "nodes",
                    params,
                    entity,
                    id_cols[0] if id_cols else None,
                )
                self.timer.neo_rows += int(obs.get["n"])
                fk_cols = [
                    c for c in df.columns if c.endswith("_id") and c not in id_cols
                ]
                if id_cols and fk_cols:
                    edges = df.select(
                        F.col(id_cols[0]).alias("src"),
                        F.lit(entity).alias("src_entity"),
                        *[F.col(c) for c in fk_cols],
                    )
                    self._write_graph_sink(edges, "edges", params, entity, "src")
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)

    def _index_pipeline(self, params: IngestParams) -> None:
        """elasticsearch stand-in: flattened all-string documents with a
        concatenated search body, parquet sink."""
        sc = self.spark.sparkContext
        sc.setJobGroup(f"elastic-{params.job_type}-{params.ingest_name}", "index load")
        try:
            for entity, df in self._read_entities(params).items():
                docs = df.select(
                    *[F.col(c).cast("string").alias(c) for c in df.columns],
                    F.lower(
                        F.concat_ws(" ", *[F.col(c).cast("string") for c in df.columns])
                    ).alias("_search_body"),
                    F.lit(entity).alias("_entity"),
                    F.lit(params.ingest_name).alias("_ingest"),
                )
                obs = Observation()
                docs.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                    "overwrite"
                ).parquet(
                    f"{self.output_dir}/index/{params.ingest_name}/{entity}"
                )
                self.timer.elastic_rows += int(obs.get["n"])
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)

    def preempt_stale(self, params: IngestParams) -> None:
        """X5: cancel any running same-kind job groups before relaunch."""
        for store in ("neo4j", "elastic"):
            self.spark.sparkContext.cancelJobGroup(
                f"{store}-{params.job_type}-{params.ingest_name}"
            )

    # ---- lifecycle ----

    def run_ingest(self, params: IngestParams) -> None:
        """X3/X4: bulk → parallel, delta → serial (graph first). JSONL
        quarantine persistence runs first either way (r6)."""
        self.preempt_stale(params)
        self.timer.reset_pipeline_state()
        self._quarantine_jsonl(params)

        def neo():
            self.timer.neo_start = time.time()
            self._graph_pipeline(params)
            if self.settle_delay_s:
                time.sleep(self.settle_delay_s)  # X6 settle tail
            self.timer.neo_end = time.time()

        def elastic():
            self.timer.elastic_start = time.time()
            self._index_pipeline(params)
            if self.settle_delay_s:
                time.sleep(self.settle_delay_s)
            self.timer.elastic_end = time.time()

        if params.ingest_type == "bulk":
            errs: list[BaseException] = []

            def guard(fn):
                def run():
                    try:
                        fn()
                    except BaseException as e:  # noqa: BLE001 - reraised below
                        errs.append(e)

                return run

            threads = [
                threading.Thread(target=guard(neo)),
                threading.Thread(target=guard(elastic)),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errs:
                raise errs[0]
        else:
            neo()
            elastic()

    def finalize(self, params: IngestParams) -> None:
        """EP3: delete the ingested folder FIRST, then append metrics —
        the reference writes metrics only after source cleanup succeeds
        (src/ingestor.js:312-342)."""
        if not ingest_sources.delete_path(  # K2 delete-after-commit
            self.spark, f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}"
        ):
            raise RuntimeError(f"failed to delete ingest folder {params.ingest_name}")
        t = self.timer
        # ingestEndTime is stamped AFTER the delete completes
        # (src/ingestor.js:321-334 measures it inside the deleteObjects
        # callback) — r7 review: max(pipeline ends) excluded the
        # source-cleanup window from load_date and total_job_duration
        end = time.time()
        metrics = self.spark.range(1).select(
            F.lit(params.ingest_name).alias("ingest"),
            F.lit(params.ingest_type).alias("type"),
            F.timestamp_seconds(F.lit(end)).alias("load_date"),
            F.date_format(F.timestamp_seconds(F.lit(end)), "EEE MMM yyyy HH:mm").alias(
                "readable_date"
            ),
            duration_hmm(F.lit((t.neo_end or 0) - (t.neo_start or 0))).alias(
                "neo_job_duration"
            ),
            duration_hmm(F.lit((t.elastic_end or 0) - (t.elastic_start or 0))).alias(
                "elastic_job_duration"
            ),
            # total = graph-store start → ingest end (src/ingestor.js:334)
            duration_hmm(F.lit(end - (t.neo_start or end))).alias(
                "total_job_duration"
            ),
            F.lit(t.neo_rows).cast("bigint").alias("neo_rows"),
            F.lit(t.elastic_rows).cast("bigint").alias("elastic_rows"),
        )
        # One SUBDIRECTORY per ingest, overwrite mode (r8 review): a
        # flat mode("append") from concurrent replicas shares the
        # committer's _temporary staging inside one output dir, and the
        # first committer's cleanup deletes the second's staged files —
        # the race test lost metrics rows exactly this way. Disjoint
        # dirs have disjoint staging, and overwrite keeps the write
        # idempotent under X5 relaunch. metrics() reads the tree
        # recursively, so the table shape is unchanged.
        metrics.write.mode("overwrite").parquet(
            f"{self.output_dir}/ingest_metrics/{params.ingest_name}"
        )
        # index maintenance runs LAST: the ingest is already committed
        # (folder gone, metrics landed), so a maintenance failure halts
        # the pipeline loudly (X7 class) without un-committing anything,
        # and the durable marker makes a relaunch resume exactly here.
        if self.dedup_index is not None:
            self._maintain_dedup_index(params)
        self.timer.reset()

    def _dedup_index_marker(self, ingest_name: str) -> str:
        return f"{self.output_dir}/dedup_index/_merged/{ingest_name}"

    def _family_marker(self, ingest_name: str, family: str) -> str:
        return f"{self._dedup_index_marker(ingest_name)}/{family}"

    def _merged_families(self, ingest_name: str) -> set[str] | None:
        """Which families already folded this ingest in. ``None`` means
        a pre-r12 all-merged FILE marker (everything merged); a set
        lists the per-family markers (r12, ADVICE r11: one marker per
        family stamped immediately after ITS merge closes the
        duplicate-append window — a crash between family A's append
        and a single end-of-maintenance marker used to re-append A's
        delta on relaunch)."""
        fs, jp = ingest_sources.hadoop_fs(
            self.spark, self._dedup_index_marker(ingest_name)
        )
        if not fs.exists(jp):
            return set()
        if fs.getFileStatus(jp).isFile():
            return None
        return {st.getPath().getName() for st in fs.listStatus(jp)}

    def _committed_docs(self, pattern: str):
        cfg = self.dedup_index
        return self.spark.read.parquet(
            f"{self.output_dir}/index/{pattern}/{cfg.entity}"
        ).select(cfg.id_col, cfg.text_col)

    def _committed_docs_for(self, names: list[str]):
        """The committed corpus pinned to an EXPLICIT ingest list — full
        builds read exactly the set whose markers they will stamp; a
        glob would race with a peer's in-flight sink commit (half a
        peer's files in the build, its marker stamped, the other half
        never indexed until compaction)."""
        cfg = self.dedup_index
        paths = [f"{self.output_dir}/index/{n}/{cfg.entity}" for n in names]
        return self.spark.read.parquet(*paths).select(cfg.id_col, cfg.text_col)

    def _committed_vecs_for(self, names: list[str]):
        """The committed VECTOR corpus (srp family) from the graph
        sink, same explicit-list pinning rule."""
        cfg = self.dedup_index
        paths = [
            f"{self.output_dir}/graph/nodes/{n}/{cfg.vec_entity}" for n in names
        ]
        return self.spark.read.parquet(*paths).select(cfg.vec_id_col, cfg.vec_col)

    def _settled_names_under(self, root: str, leaf: str) -> list[str]:
        """Ingests whose ``{root}/<name>/{leaf}`` sink AND metrics row
        both exist — the metrics row lands after the sink commits
        (finalize order), so its presence proves the sink is fully
        committed, never a peer's mid-write _temporary state. Full
        index builds cover exactly this set; a peer mid-pipeline is
        excluded and merges its own delta under the lease later."""
        fs, jp = ingest_sources.hadoop_fs(self.spark, root)
        if not fs.exists(jp):
            return []
        names = []
        for st in fs.listStatus(jp):
            n = st.getPath().getName()
            if n.startswith("_") or n.startswith("."):
                continue
            if not ingest_sources.path_exists(self.spark, f"{root}/{n}/{leaf}"):
                continue
            if not ingest_sources.path_exists(
                self.spark, f"{self.output_dir}/ingest_metrics/{n}"
            ):
                continue
            names.append(n)
        return sorted(names)

    def _settled_ingest_names(self) -> list[str]:
        """The doc-entity settled set (text families)."""
        return self._settled_names_under(
            f"{self.output_dir}/index", self.dedup_index.entity
        )

    def _settled_vec_ingest_names(self) -> list[str]:
        """The vector-entity settled set (srp family) — the GRAPH sink,
        which preserves source column types."""
        return self._settled_names_under(
            f"{self.output_dir}/graph/nodes", self.dedup_index.vec_entity
        )

    @staticmethod
    def _corpus_token_for(settled: list[str]) -> str:
        return (
            "ingests-v1:"
            + hashlib.md5("\n".join(settled).encode()).hexdigest()
        )

    def corpus_version_token(self) -> str:
        """The committed corpus's freshness stamp (r12, VERDICT r11
        #2): a digest of the SETTLED ingest-name set. The orchestrator
        owns every corpus commit, so set membership IS the corpus
        version — recomputing it costs one O(ingest-count) directory
        listing plus two existence probes per ingest, where the r11
        ``source_files_fingerprint`` LIST of ``index/*/<entity>`` was
        O(file-count) per face open and per commit (~10^5–10^6 S3
        objects at 100 TB, paged sequentially, ×5 families). A set
        digest is preferred over a bare monotone counter because any
        prober can RECOMPUTE it from the filesystem and compare against
        the artifact's stamp — no counter file to read-modify-write,
        and maintenance passes that merge nothing never need a restamp.
        The mode this cannot see — an out-of-band in-place rewrite of a
        committed sink (nothing in the lifecycle does one) — is the
        deep-verify fallback's job, the same trade the r11 listing
        stamp made against byte-identical rewrites."""
        return self._corpus_token_for(self._settled_ingest_names())

    def vec_corpus_version_token(self) -> str:
        """The srp family's twin of corpus_version_token — over the
        settled VECTOR ingest set (r12)."""
        return self._corpus_token_for(self._settled_vec_ingest_names())

    def _family_readers(self) -> dict:
        """family → zero-arg loader for its persisted catalog handle
        (raises ValueError when absent/foreign — the loaders'
        deliberate rejection class). Shared by the freshness report and
        the compaction param guard."""
        from poormans_kube_etl_spark.operators.exact_index import (
            read_corpus_fp_index,
        )
        from poormans_kube_etl_spark.operators.minhash_index import (
            read_corpus_minhash_index,
        )
        from poormans_kube_etl_spark.operators.retrieval_index import (
            read_corpus_bm25_index,
        )
        from poormans_kube_etl_spark.operators.similarity_index import (
            read_corpus_srp_index,
        )
        from poormans_kube_etl_spark.operators.substring import (
            read_corpus_gram_index,
        )

        cfg = self.dedup_index
        return {
            "minhash": lambda: read_corpus_minhash_index(
                self.spark, cfg.index_name
            ),
            "gram": lambda: read_corpus_gram_index(
                self.spark, f"{cfg.index_name}_gram"
            ),
            "exact": lambda: read_corpus_fp_index(
                self.spark, f"{cfg.index_name}_fp"
            ),
            "bm25": lambda: read_corpus_bm25_index(
                self.spark, f"{cfg.index_name}_bm25"
            ),
            "srp": lambda: read_corpus_srp_index(
                self.spark, f"{cfg.index_name}_srp"
            ),
        }

    def _param_drift(self, family: str, constants: dict) -> dict[str, tuple]:
        """Build parameters where this deployment's config disagrees
        with what the persisted artifact was BUILT with —
        ``{key: (configured, recorded)}``. Guards the compaction entry
        point (r13): a rebuild silently re-plans the index with
        whatever the caller's flags say, so a CLI invocation whose
        flags drifted from the deployment's maintenance config would
        change banding/shingling under every consumer's feet."""
        cfg = self.dedup_index
        expected: dict[str, object] = {
            "minhash": {
                "id_col": cfg.id_col,
                "text_col": cfg.text_col,
                "shingle_len": cfg.shingle_len,
                "num_hashes": cfg.num_hashes,
                "bands": cfg.bands,
                "hash_family": cfg.hash_family,
            },
            "gram": {
                "id_col": cfg.id_col,
                "text_col": cfg.text_col,
                "k": cfg.gram_k,
            },
            "exact": {"id_col": cfg.id_col, "text_col": cfg.text_col},
            "srp": {
                "id_col": cfg.vec_id_col,
                "vec_col": cfg.vec_col,
                "planned_threshold": cfg.srp_threshold,
            },
            "bm25": {"id_col": cfg.id_col, "text_col": cfg.text_col},
        }.get(family, {})
        return {
            k: (v, constants[k])
            for k, v in expected.items()
            if k in constants and str(v) != str(constants[k])
        }

    def index_freshness_report(self, deep: bool = False) -> dict[str, dict]:
        """Operator-facing freshness probe for the maintained index
        families (r13, VERDICT r12 #5), mirroring the two-tier
        get_or_build taxonomy from the query-face side:

        - **token** (always): the artifact's stamped
          ``source_fingerprint`` vs the recomputed corpus-version token
          — O(ingest-count), catches every LIFECYCLE-driven corpus
          change (a settled ingest added or removed).
        - **deep** (``deep=True``): recompute the count:max aggregate
          over the committed sinks and compare against the artifact's
          composed ``fingerprint`` — one column-pruned O(corpus)
          aggregate per corpus, catching the one mode the token is
          blind to: an out-of-band IN-PLACE rewrite of a committed sink
          (same settled names, different bytes). Nothing in the
          lifecycle performs such a rewrite; this is the audit for
          everything outside it. The doc sink has had this fallback via
          the query faces' ``deep_fingerprint`` gate since r10 — this
          method extends the same coverage to the VECTOR sink (and any
          family), driven by the deployment's own config.

        Returns ``{family: {"readable", "token_fresh", "deep_fresh"}}``
        — ``deep_fresh`` is None unless ``deep``. The srp family checks
        the vector token/corpus; text families the doc ones; bm25 is
        token-only for the token tier but deep-checks like the rest
        (its fingerprint basis is the same raw source rows)."""
        from poormans_kube_etl_spark.operators.index_artifact import (
            corpus_fingerprint,
        )

        cfg = self.dedup_index
        readers = self._family_readers()
        doc_settled: list[str] | None = None
        doc_deep: str | None = None
        report: dict[str, dict] = {}
        for family in cfg.families:
            try:
                constants = readers[family]().constants
            except ValueError:
                report[family] = {
                    "readable": False,
                    "token_fresh": False,
                    "deep_fresh": None,
                }
                continue
            if family == "srp":
                settled = self._settled_vec_ingest_names()
                token = self._corpus_token_for(settled)
                deep_now = (
                    corpus_fingerprint(
                        self._committed_vecs_for(settled), cfg.vec_id_col
                    )
                    if deep and settled
                    else None
                )
            else:
                if doc_settled is None:
                    doc_settled = self._settled_ingest_names()
                token = self._corpus_token_for(doc_settled)
                if deep and doc_settled and doc_deep is None:
                    doc_deep = corpus_fingerprint(
                        self._committed_docs_for(doc_settled), cfg.id_col
                    )
                deep_now = doc_deep if deep else None
            report[family] = {
                "readable": True,
                "token_fresh": constants.get("source_fingerprint") == token,
                "deep_fresh": (
                    constants.get("fingerprint") == deep_now
                    if deep_now is not None
                    else None
                ),
            }
        return report

    def _family_writer(self, family: str, root: str, source_fingerprint: str):
        """The FULL-CORPUS builder for one index family — one callable
        taking the corpus DataFrame and writing the family's artifact
        with this deployment's parameters. Shared by the bootstrap /
        inline-compaction path (``_maintain_dedup_index``) and the
        explicit maintenance-window rebuild (``compact_dedup_indexes``,
        r13) so the two can never drift in banding/bucketing/stamping
        parameters."""
        cfg = self.dedup_index
        if family == "minhash":
            from poormans_kube_etl_spark.operators.minhash_index import (
                write_corpus_minhash_index,
            )

            return lambda docs: write_corpus_minhash_index(
                docs,
                cfg.index_name,
                id_col=cfg.id_col,
                text_col=cfg.text_col,
                shingle_len=cfg.shingle_len,
                num_hashes=cfg.num_hashes,
                bands=cfg.bands,
                hash_family=cfg.hash_family,
                n_buckets=cfg.n_buckets,
                path=f"{root}/minhash",
                mode="overwrite",
                source_fingerprint=source_fingerprint,
            )
        if family == "gram":
            from poormans_kube_etl_spark.operators.substring import (
                write_corpus_gram_index,
            )

            return lambda docs: write_corpus_gram_index(
                docs,
                f"{cfg.index_name}_gram",
                id_col=cfg.id_col,
                text_col=cfg.text_col,
                k=cfg.gram_k,
                n_buckets=cfg.n_buckets,
                path=f"{root}/gram",
                mode="overwrite",
                source_fingerprint=source_fingerprint,
            )
        if family == "exact":
            from poormans_kube_etl_spark.operators.exact_index import (
                write_corpus_fp_index,
            )

            return lambda docs: write_corpus_fp_index(
                docs,
                f"{cfg.index_name}_fp",
                id_col=cfg.id_col,
                text_col=cfg.text_col,
                n_buckets=cfg.n_buckets,
                path=f"{root}/exact",
                mode="overwrite",
                source_fingerprint=source_fingerprint,
            )
        if family == "srp":
            from poormans_kube_etl_spark.operators.similarity_index import (
                write_corpus_srp_index,
            )

            return lambda vecs: write_corpus_srp_index(
                vecs,
                f"{cfg.index_name}_srp",
                threshold=cfg.srp_threshold,
                id_col=cfg.vec_id_col,
                vec_col=cfg.vec_col,
                n_buckets=cfg.n_buckets,
                path=f"{root}/srp",
                mode="overwrite",
                source_fingerprint=source_fingerprint,
            )
        raise ValueError(f"no full-corpus writer for family {family!r}")

    # ---- deferred compaction (r13, VERDICT r12 #7) ----

    def _compaction_flag(self, family: str) -> str:
        return f"{self.output_dir}/dedup_index/_needs_compaction/{family}"

    def _flag_compaction(self, family: str) -> None:
        """Durably record that ``family``'s fragment trail exceeded the
        budget — written UNDER the maintenance lease, read by
        ``compact_dedup_indexes``. Idempotent overwrite."""
        self._write_dedup_index_marker(self._compaction_flag(family))

    def compaction_pending(self) -> list[str]:
        """Families whose deferred compaction is still outstanding."""
        return [
            f
            for f in self.dedup_index.families
            if ingest_sources.path_exists(self.spark, self._compaction_flag(f))
        ]

    def compact_dedup_indexes(
        self, force: bool = False, allow_param_change: bool = False
    ) -> dict[str, bool]:
        """Explicit maintenance-window compaction (r13, VERDICT r12 #7):
        rebuild every family whose ``_needs_compaction`` flag is raised
        (all families when ``force``) from the FULL settled corpus,
        under this pass's own lease acquisition — the finalize path with
        ``compaction="defer"`` never rebuilds inline, so a 100 TB
        deployment schedules this off the ingest critical path (a
        nightly Job, the ``compact`` CLI verb) instead of blocking every
        replica's maintenance behind an hours-long rebuild and halting
        them via ``lease_timeout_s``.

        Same guarantees as a bootstrap build: reads the settled ingest
        set pinned by explicit paths, stamps every covered ingest's
        per-family marker (so a waiting peer never re-appends what the
        rebuild covered), renews the lease after each family and aborts
        (X7 class) if the lease is lost. Returns
        ``{family: rebuilt?}``; ``bm25`` is skipped — its policy is
        rebuild-on-every-commit, there is no fragment trail to
        compact.

        Param guard (r13): when the family's artifact is readable, its
        recorded build constants are compared against this
        orchestrator's config BEFORE rebuilding — a compaction is a
        rebuild, so config drift (a CLI invocation whose flags don't
        match the deployment's maintenance config) would silently
        re-plan banding/shingling under every consumer. Mismatch
        raises ValueError naming the drifted keys; pass
        ``allow_param_change=True`` to re-plan deliberately."""
        from poormans_kube_etl_spark.streaming.lease import FsLease

        cfg = self.dedup_index
        root = f"{self.output_dir}/dedup_index"
        lease = FsLease(
            self.spark,
            f"{root}/_MAINT_LEASE",
            self.replica_id,
            ttl_s=self.claim_ttl_s,
            settle_s=self.claim_settle_s,
        )
        lease.acquire(timeout_s=cfg.lease_timeout_s)
        compacted: dict[str, bool] = {}
        try:
            doc_settled: list[str] | None = None
            doc_fp = ""
            for family in cfg.families:
                if family == "bm25":
                    continue
                if not (
                    force
                    or ingest_sources.path_exists(
                        self.spark, self._compaction_flag(family)
                    )
                ):
                    compacted[family] = False
                    continue
                if family == "srp":
                    settled = self._settled_vec_ingest_names()
                    fp = self._corpus_token_for(settled)
                    corpus = self._committed_vecs_for(settled)
                else:
                    if doc_settled is None:
                        doc_settled = self._settled_ingest_names()
                        doc_fp = self._corpus_token_for(doc_settled)
                    settled, fp = doc_settled, doc_fp
                    corpus = self._committed_docs_for(settled)
                if not settled:
                    compacted[family] = False
                    continue  # nothing committed: nothing to rebuild
                if not allow_param_change:
                    try:
                        constants = self._family_readers()[family]().constants
                    except ValueError:
                        constants = None  # unreadable: rebuild = bootstrap
                    drift = (
                        self._param_drift(family, constants)
                        if constants is not None
                        else {}
                    )
                    if drift:
                        raise ValueError(
                            f"compact {family}: config disagrees with the "
                            f"artifact's build constants "
                            f"{{{', '.join(f'{k}: configured {c!r} vs built {b!r}' for k, (c, b) in sorted(drift.items()))}}} "
                            f"— a rebuild would silently re-plan the index; "
                            f"fix the config or pass allow_param_change=True "
                            f"to re-plan deliberately"
                        )
                self._family_writer(family, root, fp)(corpus)
                for n in settled:
                    self._write_dedup_index_marker(self._family_marker(n, family))
                ingest_sources.delete_path(self.spark, self._compaction_flag(family))
                compacted[family] = True
                self._renew_or_abort(lease, family)
            return compacted
        finally:
            lease.release()

    def _maintain_dedup_index(self, params: IngestParams) -> None:
        """Fold the committed ingest's documents into the configured
        persisted index families (see DedupIndexMaintenance). The delta
        is read from this ingest's COMMITTED index sink — the landing
        folder is already deleted (K2 runs first), and indexing what
        was committed is the correct semantics anyway.

        Concurrency (r12, VERDICT r11 #1): replicas finalizing
        DIFFERENT ingests share the family tables, so everything from
        the first family read to the last manifest refresh runs under a
        per-index-root ``FsLease`` (streaming/lease.py — the
        claim-marker mechanics reused as a maintenance mutex), renewed
        after every family so ttl_s bounds ONE family's merge, not the
        whole pass. Lease timeout is the X7 halt class: the ingest is
        already committed, and the markers below let a relaunch resume.

        Idempotence (ADVICE r11): one durable marker PER FAMILY per
        ingest (``_merged/<ingest>/<family>``), stamped immediately
        after that family's merge — a crash between a family's append
        and a single end-of-maintenance marker used to re-append that
        family's delta on relaunch (duplicate rows + a double-counted
        composed fingerprint until compaction). The residual window is
        now a crash between ONE family's append and ITS marker — one
        family's duplicate fragment, fan-out-only by the append
        invariant. A full build (bootstrap/compaction) reads the
        SETTLED ingest set pinned by explicit paths and stamps every
        covered ingest's marker, so a peer waiting on the lease never
        re-appends what the build already covered."""
        from poormans_kube_etl_spark.operators.index_artifact import (
            attach_artifact,
        )
        from poormans_kube_etl_spark.operators.index_maintenance import (
            merge_delta_into_gram_index,
            merge_delta_into_minhash_index,
            rebuild_corpus_bm25_index,
        )
        from poormans_kube_etl_spark.operators.minhash_index import (
            read_corpus_minhash_index,
        )
        from poormans_kube_etl_spark.operators.substring import (
            read_corpus_gram_index,
        )
        from poormans_kube_etl_spark.streaming.lease import FsLease

        cfg = self.dedup_index
        merged = self._merged_families(params.ingest_name)
        if merged is None:
            return  # pre-r12 all-merged FILE marker (relaunch path)
        if all(f in merged for f in cfg.families):
            return  # every family already folded this ingest in
        have_docs = ingest_sources.path_exists(
            self.spark, f"{self.output_dir}/index/{params.ingest_name}/{cfg.entity}"
        )
        have_vecs = cfg.vec_entity is not None and ingest_sources.path_exists(
            self.spark,
            f"{self.output_dir}/graph/nodes/{params.ingest_name}/{cfg.vec_entity}",
        )
        # Families this ingest carries NOTHING for are stamped as no-op
        # merges, outside the lease (per-ingest markers are
        # single-writer — the folder claim makes this ingest ours
        # alone). An ingest without a configured entity is a perfectly
        # normal shape (entity sets derive from the files present, r10
        # ADVICE medium); reading its absent sink would raise and set
        # X7. The stamp keeps relaunches from retrying forever.
        for f in cfg.families:
            if f in merged:
                continue
            if (f == "srp" and not have_vecs) or (f != "srp" and not have_docs):
                self._write_dedup_index_marker(
                    self._family_marker(params.ingest_name, f)
                )
                merged.add(f)
        if all(f in merged for f in cfg.families):
            return
        root = f"{self.output_dir}/dedup_index"
        lease = FsLease(
            self.spark,
            f"{root}/_MAINT_LEASE",
            self.replica_id,
            ttl_s=self.claim_ttl_s,
            settle_s=self.claim_settle_s,
        )
        lease.acquire(timeout_s=cfg.lease_timeout_s)
        try:
            # settled sets + freshness stamps computed UNDER the lease
            # (see corpus_version_token for the stamp's design and cost
            # argument — O(ingest-count), not the O(file-count) LIST the
            # pre-r12 source_files_fingerprint paid per commit)

            def bootstrap_or_merge(
                family, read, build_from, merge, attach_path, settled, full_corpus
            ):
                """The shared family cycle: bootstrap on first commit,
                append-merge after, compact-by-rebuild past the budget.

                After an X5 relaunch the fresh session's in-memory
                catalog has forgotten the index tables even though every
                artifact byte survived — first try re-ATTACHING the
                catalog entries from the persisted manifest (O(metadata),
                r11) and merge as usual. Only when no artifact can be
                attached does bootstrap rebuild — and then from the FULL
                settled corpus, never the delta alone (r10 ADVICE high:
                a delta-only build_from with mode=overwrite silently
                replaced the whole corpus index while the durable
                markers prevented the lost ingests from ever
                re-merging). On a true first commit the settled set IS
                the delta, so the two are equivalent there."""
                if ingest_sources.path_exists(
                    self.spark, self._family_marker(params.ingest_name, family)
                ):
                    return  # a peer's full build covered us while we waited

                def readable() -> bool:
                    # ValueError is the loaders' DELIBERATE rejection
                    # class (missing table / foreign properties /
                    # version skew — index_artifact contract). Anything
                    # else is a real fault (metastore hiccup, permission
                    # error) and must surface as an orchestrator error,
                    # not silently fund a full corpus rebuild (ADVICE
                    # r11 — the taxonomy get_or_build adopted in r10).
                    try:
                        read()
                        return True
                    except ValueError:
                        return False

                have = readable()
                if not have:
                    try:
                        have = attach_artifact(self.spark, attach_path) and readable()
                    except ValueError:
                        have = False
                full_build = False
                if not have:
                    build_from(full_corpus())
                    full_build = True
                elif merge()["needs_compaction"]:
                    if cfg.compaction == "defer":
                        # finalize stays O(delta) (r13, VERDICT r12
                        # #7): raise the durable flag and leave the
                        # rebuild to the explicit maintenance window
                        # (compact_dedup_indexes) — fragment fan-out
                        # until then, never a blocked lease
                        self._flag_compaction(family)
                    else:
                        build_from(full_corpus())
                        full_build = True
                # stamp AFTER the work lands: a merge covers this
                # ingest; a full build covers every settled ingest
                for n in settled if full_build else [params.ingest_name]:
                    self._write_dedup_index_marker(self._family_marker(n, family))
                self._renew_or_abort(lease, family)

            settled: list[str] = []
            src_fp = ""
            if have_docs:
                settled = self._settled_ingest_names()
                src_fp = self._corpus_token_for(settled)
                delta = self._committed_docs(params.ingest_name)
                text_full = lambda: self._committed_docs_for(settled)  # noqa: E731
            if have_docs and "minhash" in cfg.families:
                bootstrap_or_merge(
                    "minhash",
                    lambda: read_corpus_minhash_index(self.spark, cfg.index_name),
                    self._family_writer("minhash", root, src_fp),
                    lambda: merge_delta_into_minhash_index(
                        delta, cfg.index_name, max_fragments=cfg.max_fragments,
                        source_fingerprint=src_fp,
                    ),
                    f"{root}/minhash",
                    settled,
                    text_full,
                )
            if have_docs and "gram" in cfg.families:
                g_name = f"{cfg.index_name}_gram"
                bootstrap_or_merge(
                    "gram",
                    lambda: read_corpus_gram_index(self.spark, g_name),
                    self._family_writer("gram", root, src_fp),
                    lambda: merge_delta_into_gram_index(
                        delta, g_name, max_fragments=cfg.max_fragments,
                        source_fingerprint=src_fp,
                    ),
                    f"{root}/gram",
                    settled,
                    text_full,
                )
            if have_docs and "exact" in cfg.families:
                from poormans_kube_etl_spark.operators.exact_index import (
                    read_corpus_fp_index,
                )
                from poormans_kube_etl_spark.operators.index_maintenance import (
                    merge_delta_into_fp_index,
                )

                fp_name = f"{cfg.index_name}_fp"
                bootstrap_or_merge(
                    "exact",
                    lambda: read_corpus_fp_index(self.spark, fp_name),
                    self._family_writer("exact", root, src_fp),
                    lambda: merge_delta_into_fp_index(
                        delta, fp_name, max_fragments=cfg.max_fragments,
                        source_fingerprint=src_fp,
                    ),
                    f"{root}/exact",
                    settled,
                    text_full,
                )
            if have_docs and "bm25" in cfg.families and not ingest_sources.path_exists(
                self.spark, self._family_marker(params.ingest_name, "bm25")
            ):
                # rebuild-from-all-settled-sinks every commit: the
                # family's policy — the rebuild covers every settled
                # ingest, so all of them get this family's stamp
                rebuild_corpus_bm25_index(
                    self._committed_docs_for(settled),
                    f"{cfg.index_name}_bm25",
                    id_col=cfg.id_col,
                    text_col=cfg.text_col,
                    n_buckets=cfg.n_buckets,
                    path=f"{root}/bm25",
                    source_fingerprint=src_fp,
                )
                for n in settled:
                    self._write_dedup_index_marker(self._family_marker(n, "bm25"))
                self._renew_or_abort(lease, "bm25")
            if have_vecs and "srp" in cfg.families:
                from poormans_kube_etl_spark.operators.index_maintenance import (
                    merge_delta_into_srp_index,
                )
                from poormans_kube_etl_spark.operators.similarity_index import (
                    read_corpus_srp_index,
                )

                vec_settled = self._settled_vec_ingest_names()
                vec_fp = self._corpus_token_for(vec_settled)
                vdelta = self.spark.read.parquet(
                    f"{self.output_dir}/graph/nodes/{params.ingest_name}/"
                    f"{cfg.vec_entity}"
                ).select(cfg.vec_id_col, cfg.vec_col)
                srp_name = f"{cfg.index_name}_srp"
                bootstrap_or_merge(
                    "srp",
                    lambda: read_corpus_srp_index(self.spark, srp_name),
                    self._family_writer("srp", root, vec_fp),
                    lambda: merge_delta_into_srp_index(
                        vdelta, srp_name, max_fragments=cfg.max_fragments,
                        source_fingerprint=vec_fp,
                    ),
                    f"{root}/srp",
                    vec_settled,
                    lambda: self._committed_vecs_for(vec_settled),
                )
        finally:
            lease.release()

    @staticmethod
    def _renew_or_abort(lease, family: str) -> None:
        """Per-family lease renewal that HONORS the renewal verdict
        (r13, VERDICT r12 #1 / ADVICE r12 medium): ``FsLease.renew``
        now re-arbitrates and returns False when a peer legitimately
        broke a TTL-expired lease — a stalled holder must abort its
        maintenance pass at that point, not keep merging concurrently
        with the new owner. The abort is the same ``TimeoutError``
        class ``FsLease.acquire`` raises, so it lands in X7 exactly
        like a lease-wait timeout: the ingest is already committed,
        the just-finished family's marker is already stamped, and the
        per-family markers let a relaunch resume from the next family.
        Damage from the section that overran ttl_s is bounded by the
        append invariant (duplicate fragments, fan-out-only) — the
        point of aborting is that no FURTHER family merges race the
        new lease owner."""
        if not lease.renew():
            raise TimeoutError(
                f"maintenance lease {lease.path} lost after the "
                f"'{family}' family (section exceeded ttl_s="
                f"{lease.ttl_s}s and a peer broke the lease); "
                f"aborting the maintenance pass — durable per-family "
                f"markers make a relaunch resume from the next family"
            )

    def _write_dedup_index_marker(self, marker: str) -> None:
        fs, jpath = ingest_sources.hadoop_fs(self.spark, marker)
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(b"merged"))
        finally:
            out.close()

    def _folder_vanished(self, params: IngestParams) -> bool:
        """True when the ingest folder no longer exists — the signature
        of a peer replica having finalized it mid-cycle. Fails CLOSED:
        if the existence check itself errors, report not-vanished so
        the caller takes the X7 halt path (never masks a real pipeline
        failure behind an unreachable store)."""
        try:
            return not ingest_sources.path_exists(
                self.spark,
                f"{self.landing_dir}/{PENDING_PREFIX}/{params.ingest_name}",
            )
        except Exception:
            return False

    def _verify_or_raise(self, params: IngestParams) -> None:
        """Strict-manifest gate shared by BOTH lifecycles (run_once and
        run_stream) so poll mode and stream mode enforce one contract on
        the same landing dir; no-op when strict_manifest is off."""
        if not self.strict_manifest:
            return
        bad = (
            self.verify_manifest(params)
            .where(F.col("status").isin("mismatch", "missing_file"))
            .count()
        )
        if bad:
            raise RuntimeError(
                f"manifest verification failed for {params.ingest_name}: "
                f"{bad} bad file(s)"
            )

    def _halt_marker_path(self) -> str:
        return f"{self.output_dir}/_HALT"

    def _write_halt_marker(self, reason: str) -> None:
        """Durably record the X7 error state (r7 review): under a K8s
        Deployment the pod restarts with ``restartPolicy: Always`` and
        a fresh Orchestrator has forgotten ``self.errored`` — without a
        durable marker, a DETERMINISTIC pipeline failure becomes an
        infinite crash-loop that re-runs verification and both store
        pipelines against the same oldest folder forever. The marker
        turns that into the reference's halt-for-intervention contract
        (src/ingestor.js:289-292): restarts see the marker, refuse to
        process, and exit fast; the operator fixes the data and removes
        ``<output>/_HALT`` to resume."""
        try:
            fs, path = ingest_sources.hadoop_fs(self.spark, self._halt_marker_path())
            out = fs.create(path, True)
            try:
                out.write(bytearray(reason.encode("utf-8")))
            finally:
                out.close()
        except Exception as e:  # the halt still holds in-process
            # best-effort by necessity: when the OUTPUT store itself is
            # the failure, the marker write fails too. The restart-side
            # check fails CLOSED (skip the cycle when the marker cannot
            # be read), so an unreachable output bucket never resumes
            # processing just because the marker is unreadable; the
            # residual gap is a transient write failure followed by
            # full recovery before the restart.
            print(f"orchestrator: could not persist halt marker: {e}")

    def _halted_by_marker(self) -> bool:
        """True when the durable halt marker exists. Raises when the
        check itself fails — callers treat that as 'unknown' and skip
        the cycle (fail-closed, r7 review: returning False on a
        transient output-store error resumed a halted pipeline)."""
        return bool(
            ingest_sources.path_exists(self.spark, self._halt_marker_path())
        )

    def clear_halt(self) -> None:
        """Operator intervention: remove the durable halt marker."""
        ingest_sources.delete_path(self.spark, self._halt_marker_path())
        self.errored = None

    def run_once(self) -> IngestParams | None:
        """One poll cycle. Returns the processed ingest, or None if the
        cycle found nothing ready (empty/no-marker/manifest-not-ready)
        or the scan itself failed transiently.

        Error taxonomy mirrors the reference: LISTING/GATING failures are
        transient — log and re-poll forever (src/ingestor.js:77-81
        retries the S3 scan unconditionally; src/s3-client.spec.js:8-14
        pins that the loop survives error → empty → malformed listings).
        The terminal X7 halt is reserved for pipeline/verification
        failures (src/ingestor.js:289-292 enters the error state from
        job failure, never from a scan error) — and is durable across
        process restarts via ``<output>/_HALT`` (see
        ``_write_halt_marker``)."""
        if self.errored:
            return None
        try:
            halted = self._halted_by_marker()
        except Exception as e:
            # unknown halt state: skip the cycle WITHOUT latching
            # errored (a transient output-store error must neither
            # resume a halted pipeline nor permanently halt a healthy
            # one once the store recovers)
            print(
                f"orchestrator: cannot check halt marker ({e}); "
                "skipping cycle (fail-closed)"
            )
            return None
        if halted:
            self.errored = (
                f"halted: {self._halt_marker_path()} present from a prior "
                "failure; fix the data, then remove the marker to resume"
            )
            print(f"orchestrator: {self.errored}")
            return None
        try:
            params = self.discover()
            if params is None:
                self.scan_failures = 0
                return None
            if not self.manifest_ready(params):
                self.scan_failures = 0
                return None  # EP2: re-poll next cycle
            files = self.ingest_files(params)
        except Exception as e:  # transient: scan/list errors re-poll
            self.scan_failures += 1
            print(
                f"orchestrator: transient scan failure "
                f"#{self.scan_failures} ({e}); re-polling"
            )
            return None
        self.scan_failures = 0
        # Claim BEFORE the expensive verify/run stages (r8): losing the
        # race to a peer replica is a normal outcome — re-poll; the
        # peer's claim makes the folder invisible to the next discover.
        # On X7 failure below, the claim is deliberately NOT released:
        # the shared <output>/_HALT stops every replica anyway, and a
        # released claim would only invite a peer to re-run the same
        # deterministic failure before it notices the halt.
        if not self.claim_folder(params.ingest_name):
            return None
        try:
            self.timer.ingest_files = files
            self.timer.ingest_files_name = params.ingest_name
            self._verify_or_raise(params)
            # renew the lease after the verify (r8 review): sha-hashing
            # a large folder can outlast claim_ttl_s, and an expired
            # claim invites a peer to double-ingest mid-run. Renewal
            # refreshes the marker mtime; losing it here (a peer broke
            # an expired claim during OUR slow verify) aborts the cycle
            # BEFORE the store pipelines run, not after.
            if not self.claim_folder(params.ingest_name):
                print(
                    f"orchestrator: lost claim on {params.ingest_name} "
                    "during verify (lease expired?); yielding to peer"
                )
                self.timer.reset()
                return None
            self.run_ingest(params)
        except Exception as e:
            if self._folder_vanished(params):
                # a peer replica won a claim race this cycle (possible
                # on stores without atomic rename) and already
                # finalized the folder — a lost cycle, not a pipeline
                # failure: re-poll instead of halting the fleet. Only
                # the PRE-finalize stages get this escape: finalize
                # deletes the folder itself, so a vanished check there
                # would demote OUR OWN post-delete failures (the
                # metrics write) to "a peer did it" and lose the row.
                print(
                    f"orchestrator: {params.ingest_name} vanished "
                    f"mid-cycle ({e}); a peer finalized it — re-polling"
                )
                self.timer.reset()
                return None
            self.errored = str(e)  # X7: halt, require intervention
            self._write_halt_marker(f"{params.ingest_name}: {e}")
            raise
        try:
            self.finalize(params)
            return params
        except Exception as e:  # X7, no vanished escape (see above)
            self.errored = str(e)
            self._write_halt_marker(f"{params.ingest_name}: {e}")
            raise

    def run_forever(self) -> None:
        """X1 polling loop (the reference's 60 s setTimeout tail-recursion).
        Transient scan failures back off exponentially, capped at 8×
        the poll interval — bounded, and never terminal."""
        while not self.errored:
            processed = self.run_once()
            if processed is None:
                backoff = min(2 ** min(self.scan_failures, 3), 8)
                time.sleep(self.poll_interval_s * backoff)

    # ---- streaming lifecycle ----

    def _deferred_dir(self) -> str:
        return f"{self.output_dir}/_deferred"

    def _defer_folder(self, folder: str) -> None:
        """Durably record a manifest-arrived-but-marker-missing folder:
        the file source never re-emits a committed manifest, so without
        this record the folder would be dropped FOREVER once its batch
        commits. One empty dir per folder — driver metadata, any
        Hadoop FS."""
        fs, path = ingest_sources.hadoop_fs(
            self.spark, f"{self._deferred_dir()}/{folder}"
        )
        fs.mkdirs(path)

    def _undefer_folder(self, folder: str) -> None:
        ingest_sources.delete_path(self.spark, f"{self._deferred_dir()}/{folder}")

    def _sweep_folders(self, folders: set[str], deferred: set[str]) -> None:
        """Run the ready-folder lifecycle over ``folders`` oldest-first
        (names are timestamps: lexical sort = age sort), maintaining the
        durable deferred bookmarks in ``deferred`` (mutated in place)."""
        for folder in sorted(folders):
            # prefix-scoped: list only this folder's subtree, not the
            # whole landing dir per discovered folder (VERDICT r02 #9)
            keys = self.list_keys(folder)
            if not keys and folder in deferred:
                # deferred folder vanished (operator cleanup) — drop
                # the bookmark
                deferred.discard(folder)
                self._undefer_folder(folder)
                continue
            marker = next(
                (k.split("/")[2] for k in keys if k.split("/")[2:3] and k.split("/")[2] in MARKER_FILES),
                None,
            )
            if marker is None:
                # F3: no marker yet -> not ready. Bookmark durably and
                # retry on every later batch / stream restart.
                if folder not in deferred:
                    deferred.add(folder)
                    self._defer_folder(folder)
                continue
            params = IngestParams(folder, marker.replace(".txt", ""))
            # r8: same claim lease as poll mode — a poll-mode replica
            # and this stream (or a second stream on its own checkpoint)
            # must not double-ingest. Claim-lost behaves like not-ready:
            # bookmark durably, because the file source never re-emits
            # this manifest — if the claimer dies, a later sweep finds
            # the bookmark and the claim expired.
            if not self.claim_folder(folder):
                if folder not in deferred:
                    deferred.add(folder)
                    self._defer_folder(folder)
                continue
            self.timer.ingest_files = self.ingest_files(params)
            self.timer.ingest_files_name = params.ingest_name
            try:
                self._verify_or_raise(params)
                # lease renewal after the slow verify, same as run_once.
                # Renewal-lost needs the SAME durable bookmark as the
                # initial claim-lost path (ADVICE r08): the file source
                # never re-emits this manifest, so if the thief that
                # stole the claim mid-verify then crashes, only the
                # bookmark lets a later sweep recover the folder.
                if not self.claim_folder(folder):
                    if folder not in deferred:
                        deferred.add(folder)
                        self._defer_folder(folder)
                    self.timer.reset()
                    continue
                self.run_ingest(params)
            except Exception as e:
                if self._folder_vanished(params):
                    # a peer finalized this folder mid-sweep: a lost
                    # cycle, not a pipeline failure (see run_once —
                    # and like there, only pre-finalize stages get
                    # this escape)
                    print(
                        f"orchestrator: {folder} vanished mid-sweep "
                        f"({e}); a peer finalized it — skipping"
                    )
                    self.timer.reset()
                    continue
                # X7 in stream mode: the failed micro-batch is UNcommitted,
                # so a checkpoint restart would replay it — a deterministic
                # pipeline failure crash-loops re-running the pipelines
                # exactly like the poll path's Deployment restart. Same
                # durable marker, same intervention contract.
                self.errored = str(e)
                self._write_halt_marker(f"{params.ingest_name}: {e}")
                raise
            try:
                self.finalize(params)
            except Exception as e:  # X7, no vanished escape
                self.errored = str(e)
                self._write_halt_marker(f"{params.ingest_name}: {e}")
                raise
            if folder in deferred:
                deferred.discard(folder)
                self._undefer_folder(folder)

    def _load_deferred(self) -> set[str]:
        fs, path = ingest_sources.hadoop_fs(self.spark, self._deferred_dir())
        if not fs.exists(path):
            return set()
        return {st.getPath().getName() for st in fs.listStatus(path)}

    def run_stream(self, checkpoint_dir: str, available_now: bool = False):
        """Streaming-mode orchestration: the manifest file IS the
        readiness event (EP2), so stream on ``pending/*/manifest.json``
        arrivals and run the normal lifecycle once per discovered
        manifest.

        Two failure modes of a naive manifest trigger are closed
        (self-review r4):

        - **Marker-after-manifest.** The file source checkpoints a
          committed manifest and never re-emits it, so a folder whose
          marker (F3) was not yet visible at batch time used to be
          skipped FOREVER — run_once instead re-polls every cycle.
          Such folders are recorded in a durable deferred list
          (``{output_dir}/_deferred/<folder>``, driver metadata) and
          retried — prefix-scoped, no landing-dir rescans — on every
          later batch and on every stream (re)start, so the folder is
          ingested at the first retry where its marker is visible.
          A folder whose marker NEVER arrives stays deferred and
          untouched: run_once's F3 invisibility, durably bookmarked.
        - **Empty-array manifests.** The source reads the manifest as
          TEXT, not json: the stream only needs the file's PATH (the
          lifecycle re-reads content via verify_manifest), and a json
          source emits ZERO rows for ``[]`` — the arrival would commit
          without ever reaching process(). Any non-empty file has a
          text row. (binaryFile was rejected: it silently drops
          0-byte files — measured — and a 0-byte manifest is malformed
          anyway; it stays on disk unprocessed, exactly like poll mode
          where verification could never pass.)

        Replaces the 60 s poll with Spark's file-source discovery +
        checkpointing: a manifest is processed exactly once across
        restarts (the poll loop instead re-derives state from the
        landing dir each cycle). Inside foreachBatch the batch rows only
        say WHICH folders became ready; processing still goes through
        run-ingest → finalize so bulk/delta routing, verification and
        metrics are identical to ``run_once``."""
        if self._halted_by_marker():
            raise RuntimeError(
                f"halted: {self._halt_marker_path()} present from a prior "
                "failure; fix the data, then remove the marker to resume"
            )
        manifests = (
            self.spark.readStream.option("maxFilesPerTrigger", 1)  # one folder per micro-batch
            .option("latestFirst", False)  # oldest-first (O1)
            .text(f"{self.landing_dir}/{PENDING_PREFIX}/*/manifest.json")
            .select(F.input_file_name().alias("manifest_path"))
        )
        deferred = self._load_deferred()
        # restart retry must happen HERE, driver-side: with no new
        # manifests an availableNow run fires zero batches, so a
        # batch-side retry alone would never see restart-era pickups
        self._sweep_folders(deferred, deferred)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            # folder = second-to-last path segment of
            # .../pending/<folder>/manifest.json (r7 review): splitting
            # on the FIRST '/pending/' broke for any landing dir that
            # itself contains a 'pending' segment — the phantom folder
            # was swept (empty) and the real one dropped FOREVER once
            # its batch committed (the same substring-match class
            # list_prefix fixed in r4)
            arrived = {
                r.manifest_path.rstrip("/").split("/")[-2]
                for r in batch_df.select("manifest_path").distinct().collect()
            }
            self._sweep_folders(arrived | deferred, deferred)

        writer = (
            manifests.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .queryName("ingest-orchestrator")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{int(self.poll_interval_s)} seconds")
        return writer.start()

    def stream_jsonl_corpus(
        self,
        corpus_dir: str,
        schema: str,
        checkpoint_dir: str,
        available_now: bool = False,
        max_files_per_trigger: int | None = None,
    ):
        """Continuous JSONL corpus ingest (r6, VERDICT r05 #6): the
        ``read_jsonl_stream`` twin running inside the orchestrator's
        lifecycle — a landing directory of ``*.jsonl[.gz]`` shards flows
        through the SAME schema-contract parser as the batch entity path
        into two parquet sinks under ``output_dir``:
        ``corpus/valid`` (contract columns) and ``corpus/quarantine``
        (raw malformed lines).

        foreachBatch + ``split_quarantine`` because a streaming split
        has exactly one correct shape: two separate ``writeStream``s
        would each keep their own file-source progress and scan every
        shard twice, so the batch function persists each micro-batch
        once and feeds both sinks from it (see read_jsonl_stream's
        docstring). Checkpointed file-source progress makes each shard
        parse exactly once across restarts; the parquet appends are
        at-least-once on a mid-batch crash — dedup downstream by
        ``input_file`` if the sink must be exact (the batch entity path
        stays the exactly-once surface)."""
        parsed = ingest_sources.read_jsonl_stream(
            self.spark,
            corpus_dir,
            schema,
            max_files_per_trigger=max_files_per_trigger,
        ).withColumn("input_file", F.input_file_name())
        valid_path = f"{self.output_dir}/corpus/valid"
        quarantine_path = f"{self.output_dir}/corpus/quarantine"

        def process(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                valid, _ = ingest_sources.split_quarantine(batch_df)
                valid.write.mode("append").parquet(valid_path)
                # keep input_file on the quarantine side (r7 review):
                # split_quarantine projects down to the raw line only,
                # which made the documented dedup-by-input_file recovery
                # impossible for exactly the sink that needs auditing —
                # replayed duplicates were indistinguishable from
                # genuinely repeated corpus lines. Migration note: a
                # quarantine dir written before this column existed
                # holds one-column files — read mixed dirs with
                # .option("mergeSchema", True) (old rows surface
                # input_file=NULL)
                quarantined = batch_df.where(
                    F.col("_corrupt_record").isNotNull()
                ).select("_corrupt_record", "input_file")
                quarantined.write.mode("append").parquet(quarantine_path)
            finally:
                batch_df.unpersist()

        writer = (
            parsed.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .queryName("jsonl-corpus")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{int(self.poll_interval_s)} seconds")
        return writer.start()

    # ---- metrics surface ----

    def metrics(self) -> DataFrame:
        # recursiveFileLookup: the sink is one subdirectory per ingest
        # (plain names, not key=value partitions — 'ingest' stays a
        # data column), see finalize
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{self.output_dir}/ingest_metrics")
            .select(*METRICS_COLUMNS)
        )
