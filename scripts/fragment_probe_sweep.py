"""Fragment-buildup probe-cost sweep (r11, VERDICT r10 #5).

The append-merge policy (operators/index_maintenance.py) trades probe
join fan-out for delta-sized maintenance: every merge appends a
fragment of bucket rows, a key colliding across fragments matches
every fragment row, and past ``max_fragments`` (16) the maintainer
reports ``needs_compaction`` so the orchestrator compacts-by-rebuild.
The budget number was designed, not measured — this script measures
it: MinHash indexed-probe latency at 0, 1, 8 and 16 appended
fragments, then after compaction, at any SF:

    python scripts/fragment_probe_sweep.py [sf_dir]

Default sf_dir: .benchdata/sf1. One MEAS line per milestone
(fragments, bucket rows, probe seconds min-of-2); results recorded in
SCALING.md. The probe delta is FIXED (every 100th doc) so milestone
rows price fragment fan-out, not probe size; merge deltas are 16
disjoint slices of the %10==0 docs, so the indexed corpus grows ~0.6%
per merge — realistic ingest-sized deltas, small enough that the
fan-out term dominates any corpus-growth term.
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from poormans_kube_etl_spark.operators.index_maintenance import (
        merge_delta_into_minhash_index,
    )
    from poormans_kube_etl_spark.operators.minhash_index import (
        minhash_incremental_near_duplicates_indexed,
        read_corpus_minhash_index,
        write_corpus_minhash_index,
    )
    from poormans_kube_etl_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    name = "pke_fragsweep_mh"
    path = "/tmp/pke_fragsweep_mh"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    probe = docs.where(F.col("doc_id") % 100 == 0)

    def timed_probe() -> float:
        idx = read_corpus_minhash_index(spark, name)
        out = minhash_incremental_near_duplicates_indexed(probe, idx, 0.5)
        out.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    def meas(label: str, fragments: int) -> None:
        rows = spark.table(f"{name}_buckets").count()
        sec = timed_probe()
        print(
            f"MEAS fragments={fragments} label={label} bucket_rows={rows} "
            f"probe_sec={sec:.3f}",
            flush=True,
        )

    t0 = time.perf_counter()
    write_corpus_minhash_index(
        corpus, name, hash_family="md5", n_buckets=32, path=path,
        mode="overwrite",
    )
    print(f"build_sec={time.perf_counter() - t0:.1f}", flush=True)
    meas("fresh", 0)

    # 16 disjoint ingest-sized deltas from the %10==0 docs
    t_merge_total = 0.0
    for i in range(16):
        delta = docs.where(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 160 == 10 * i)
        )
        t0 = time.perf_counter()
        report = merge_delta_into_minhash_index(delta, name)
        t_merge_total += time.perf_counter() - t0
        frags = report["fragments"]
        if frags in (1, 8, 16):
            meas("appended", frags)
        if frags == 16:
            print(
                f"needs_compaction={report['needs_compaction']} "
                f"merge_total_sec={t_merge_total:.1f}",
                flush=True,
            )

    # compact-by-rebuild over the full indexed corpus, as the
    # orchestrator does past the budget
    full = corpus.unionByName(docs.where(F.col("doc_id") % 10 == 0))
    t0 = time.perf_counter()
    write_corpus_minhash_index(
        full, name, hash_family="md5", n_buckets=32, path=path,
        mode="overwrite",
    )
    print(f"compact_sec={time.perf_counter() - t0:.1f}", flush=True)
    meas("compacted", 0)
    for t in (f"{name}_buckets", f"{name}_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
