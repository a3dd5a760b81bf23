"""Scale the driver's sf0.1 tables to a larger synthetic SF for
LOCAL linearity validation (VERDICT r03 #7) — writes to
``.benchdata/sf{N}`` inside the repo (testdata itself is read-only).

Replication is 1 original + (factor-1) derived copies, built so the
WORKLOAD SHAPE scales linearly instead of degenerating:

- Every entity key (custkey/orderkey/partkey/suppkey/event_id/user_id/
  doc_id/vec_id) is offset by ``replica * 10_000_000`` — FK joins stay
  consistent WITHIN a replica, the join fan-out per key is unchanged,
  and key-range predicates (e.g. the vec_id < 3 query set) keep their
  original selectivity denominator semantics.
- ``nation``/``region`` are genuine dimensions — copied once, so the
  star joins scale the fact side only, like real TPC-H SFs do.
- ``documents.text`` gets every TOKEN suffixed with the replica tag:
  replicas share no shingles with the original, so near-dup pair
  counts grow ~linearly. A naive copy would make every doc a 10-way
  exact dup — LSH buckets and pair outputs would grow quadratically,
  which benchmarks the degenerate corpus, not scale.
- ``embeddings.embedding`` is rolled by the replica index and
  sign-flipped per (replica, dim) via xxhash64 — replicas are
  ~uncorrelated with their originals (norms preserved), again keeping
  near-pair volume linear.

Deterministic end-to-end (seeded by replica index and xxhash64 only).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

STRIDE = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicas(df: DataFrame, factor: int) -> DataFrame:
    reps = df.sparkSession.range(factor).select(F.col("id").cast("int").alias("_rep"))
    return df.crossJoin(F.broadcast(reps))


def scale_table(df: DataFrame, name: str, factor: int) -> DataFrame:
    if name in ("region", "nation"):
        return df
    out = _replicas(df, factor)
    for k in KEY_COLS.get(name, []):
        out = out.withColumn(k, F.col(k) + F.col("_rep").cast("bigint") * STRIDE)
    if name == "documents":
        salted = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(t, F.lit("_q"), F.col("_rep").cast("string")),
            ),
            " ",
        )
        out = out.withColumn(
            "text", F.when(F.col("_rep") == 0, F.col("text")).otherwise(salted)
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if name == "embeddings":
        dim = 64
        v = F.col("embedding")
        # roll by _rep MOD dim: a raw _rep above dim made the first
        # slice length negative and crashed mid-generation for any
        # factor > 65 (self-review r4); the mod keeps rolls valid at any
        # factor and the per-(replica, dim) sign flips below keep
        # same-roll replicas decorrelated from each other
        shift = F.pmod(F.col("_rep"), F.lit(dim))
        rolled = F.concat(
            F.slice(v, shift + 1, F.lit(dim) - shift),
            F.slice(v, 1, shift),
        )
        remixed = F.transform(
            rolled,
            lambda x, i: (
                x
                * F.when(
                    F.pmod(F.xxhash64(F.col("_rep"), i), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
            ).cast("float"),
        )
        out = out.withColumn(
            "embedding", F.when(F.col("_rep") == 0, v).otherwise(remixed)
        )
    return out.drop("_rep").select(*df.columns)


# Natural clustering key per table — what a real lake's layout would
# approximate (logs time-ordered, facts key-ordered).
_NATURAL_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "ts",
    "documents": "doc_id",
    "embeddings": "vec_id",
    # region/nation: 5/25 rows, keep round-robin
}


def generate(spark, factor: int, src: str, dst: str, verbose: bool = True) -> None:
    """Write the scaled replica set to ``dst``, atomically: tables land
    in ``dst + '.tmp'`` and the directory is renamed into place only
    after every table wrote, so a crashed/interrupted generation can
    never leave a half-built dir that looks complete to bench.py."""
    import shutil

    from poormans_kube_etl_spark import TABLES

    tmp = dst + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        scaled = scale_table(df, name, factor)
        # Write MULTI-FILE tables (r5): the source testdata is one file
        # with ONE row group per table, and a row group is the atomic
        # parquet scan unit — a single-row-group replica made every sf1
        # scan single-task, serializing the whole map side of each
        # query on one core and invalidating the linearity readings.
        # Real lakes arrive in many files; mirror that. Range-partition
        # + sort on the table's natural key rather than round-robin:
        # a round-robin write randomizes row order, which is NOT how
        # lakes look (logs arrive roughly time-ordered, facts roughly
        # key-ordered) and quadrupled the session-window sort at sf1.
        key = _NATURAL_KEY.get(name)
        n_out = spark.sparkContext.defaultParallelism
        if key:
            scaled = scaled.repartitionByRange(n_out, key).sortWithinPartitions(key)
        else:
            scaled = scaled.repartition(n_out)
        scaled.write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
        if verbose:
            print(name, spark.read.parquet(f"{tmp}/{name}.parquet").count())
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # default label derives from the factor (r7 review: a fixed 'sf1'
    # default silently wrote 100x data under the sf1 label) — but ONLY
    # for the default sf0.1 source, where factor 10 really is sf1;
    # scaling any other source requires an explicit label (a derived
    # name would mislabel, and could overwrite the source replica).
    # The arg is a bare label joined under .benchdata/, NOT a path.
    if len(sys.argv) > 3:
        sf_label = sys.argv[3]
    elif src == "/root/testdata/sf0.1" and factor % 10 == 0:
        sf_label = f"sf{factor // 10}"
    else:
        raise SystemExit(
            f"scaling {src!r} by {factor}: pass an explicit label "
            "(derived names only apply to the default sf0.1 source)"
        )
    if "/" in sf_label:
        raise SystemExit(
            f"label {sf_label!r} must be a bare name (it is joined under "
            ".benchdata/), e.g. 'sf10' — not a path"
        )
    dst = os.path.join(REPO_ROOT, ".benchdata", sf_label)

    from poormans_kube_etl_spark.session import get_spark

    spark = get_spark(app_name="scale-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, factor, src, dst)
    spark.stop()


if __name__ == "__main__":
    main()
