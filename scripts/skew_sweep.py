"""Skewed-corpus growth point (r12, VERDICT r11 #4): every growth law
in SCALING.md was measured on the UNIFORM synthetic corpus, but real
100 TB corpora are Zipf-skewed — one domain holds half the tokens and a
boilerplate sentence rides in a third of the documents. This script
builds an sf1-scale SKEWED documents fixture and re-measures the
gram-groupBy faces and the capped bucket joins against the uniform sf1
replica set, so SCALING.md can show whether the caps/budgets actually
BIND under skew instead of assuming it.

Skew model (deterministic, xxhash64-seeded):
- **Source skew**: ~50% of docs are remapped to one mega-source
  (``src_mega``) — the one-domain-is-half-the-corpus shape that stresses
  source-keyed aggregates and any per-source partitioning.
- **Boilerplate**: a fixed ~27-word sentence is prepended to ~30% of
  docs — every shingle/gram/posting of that sentence becomes corpus-hot
  (shared by ~15k docs at sf1), the exact load the bounded-bucket caps
  (operators/minhash.bounded_buckets), gram-frequency skew caps
  (queries/substring.py) and df-based BM25 pruning exist for.

Usage: ``python scripts/skew_sweep.py [--regen]`` — writes the fixture
to ``.benchdata/sf1skew`` (documents plus a skewed embeddings table —
the vector-skew axis added in r12: the two embedding faces in FACES
read it; no other table is written or read), generates
``.benchdata/sf1`` first if absent, then prints one JSON line per face
with uniform-vs-skewed seconds and the ratio.
Run it ALONE (same artifact-contention rule as bench.py — the index
faces build per-sf-tag artifacts under /tmp).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

BOILERPLATE = (
    "this content is provided under the standard terms of service and "
    "may not be reproduced in any form without the express written "
    "permission of the original publisher all rights reserved"
)

# gram-groupBy faces + capped-bucket pair faces + persisted-index
# faces (their artifact caps must bind at build time too). The two
# embedding faces exercise the VECTOR skew axis: a planted
# identical-vector cluster is the hottest possible SRP bucket (every
# band collides), the load bounded_buckets' cap exists for.
FACES = (
    "train_scrub_duplicate_spans",
    "train_split_leakage_report",
    "train_decontaminate_ngram",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_minhash_index_delta_pairs",
    "dedup_embedding_lsh_pairs",
    "dedup_embedding_index_delta_pairs",
)


def skew_documents(docs):
    """Apply the two skew axes to an sf1 documents frame."""
    mega = F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 50
    boiler = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(10)) < 3
    return (
        docs.withColumn(
            "source", F.when(mega, F.lit("src_mega")).otherwise(F.col("source"))
        )
        .withColumn(
            "text",
            F.when(
                boiler, F.concat(F.lit(BOILERPLATE + " "), F.col("text"))
            ).otherwise(F.col("text")),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )


def skew_embeddings(emb):
    """Vector skew: ~5% of vectors replaced by ONE constant vector —
    a single cluster whose members collide in EVERY SRP band (identical
    vectors), the over-hot-bucket load the bounded accumulation cap
    drops by design (pairs inside a boilerplate cluster are exact-dedup
    work, not ANN work)."""
    hot = F.pmod(F.xxhash64("vec_id"), F.lit(20)) < 1
    const_vec = F.array(
        *[F.lit(((i * 37) % 13 - 6) / 7.0).cast("float") for i in range(64)]
    )
    return emb.withColumn(
        "embedding", F.when(hot, const_vec).otherwise(F.col("embedding"))
    )


def build_fixture(spark, dst: str) -> None:
    from scale_testdata import scale_table

    docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    skewed = skew_documents(scale_table(docs01, "documents", 10))
    emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    skewed_emb = skew_embeddings(scale_table(emb01, "embeddings", 10))
    n_out = spark.sparkContext.defaultParallelism
    tmp = dst + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        skewed.repartitionByRange(n_out, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents.parquet")
    )
    (
        skewed_emb.repartitionByRange(n_out, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(f"{tmp}/embeddings.parquet")
    )
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from poormans_kube_etl_spark.queries import all_queries
    from poormans_kube_etl_spark.session import get_spark

    regen = "--regen" in sys.argv
    sf1_dir = os.path.join(REPO_ROOT, ".benchdata", "sf1")
    skew_dir = os.path.join(REPO_ROOT, ".benchdata", "sf1skew")
    spark = get_spark(app_name="pke-skew-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(sf1_dir):
        from scale_testdata import generate

        generate(spark, 10, "/root/testdata/sf0.1", sf1_dir, verbose=False)
    if regen or not os.path.isdir(skew_dir):
        build_fixture(spark, skew_dir)

    qs = all_queries()
    results = {}
    for name in FACES:
        row = {}
        for label, d in (("uniform", sf1_dir), ("skewed", skew_dir)):
            _execute(qs[name](spark, d))  # untimed warm pass
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _execute(qs[name](spark, d))
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 4)
        row["ratio"] = round(row["skewed"] / row["uniform"], 3)
        results[name] = row
        print(json.dumps({"face": name, **row}), flush=True)
    print(json.dumps({"metric": "skew_sweep", "sf": 1.0, "faces": results}))
    spark.stop()


if __name__ == "__main__":
    main()
