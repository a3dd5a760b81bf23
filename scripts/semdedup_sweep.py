"""Uncapped SemDeDup cell-pair sweep (r10, VERDICT r09 #7).

The registered SemDeDup faces run on a capped demo slice so their
DuckDB oracle (unrolled Lloyd CTE) stays replayable — which makes
their bench cost constant by construction. This script measures the
claimed PRODUCTION lever instead: k ∝ N keeps per-cell population
(and so the within-cell pair expansion, the entire cost story)
constant as the corpus grows. Run at any SF:

    python scripts/semdedup_sweep.py [sf_dir] [k1 k2 ...]

Defaults: .benchdata/sf1 and k ∈ {N/2000, N/1000, N/500, N/250}.
Prints one MEAS line per k: in-cell pair volume, duplicate pairs at
cos >= 0.9, and wall time. Results are recorded in SCALING.md.
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
    from poormans_kube_etl_spark.operators.kmeans import kmeans_fit
    from poormans_kube_etl_spark.operators.similarity import (
        _dot_expr,
        _norm_expr,
        checked_double_vec,
    )
    from poormans_kube_etl_spark.queries.similarity import _guard_cell_pair_budget
    from poormans_kube_etl_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    dim = 64
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    print(f"N={n}", flush=True)
    if len(sys.argv) > 2:
        ks = sorted({int(a) for a in sys.argv[2:]})
    else:
        ks = sorted({max(2, n // 2000), max(2, n // 1000), max(4, n // 500), max(8, n // 250)})
    for k in ks:
        t0 = time.time()
        _guard_cell_pair_budget(n, k=k)
        _, assigned = kmeans_fit(emb, k=k, max_iter=3)
        vecs = emb.select("vec_id", checked_double_vec("embedding", dim).alias("v"))
        cell = (
            assigned.join(vecs, "vec_id")
            .withColumn("nrm", _norm_expr("v", dim))
            .select("vec_id", "cluster", "v", "nrm")
        )
        a, b = cell.alias("ka"), cell.alias("kb")
        joined = a.join(
            b,
            (F.col("ka.cluster") == F.col("kb.cluster"))
            & (F.col("ka.vec_id") < F.col("kb.vec_id")),
        ).select(
            F.col("ka.v").alias("_va"),
            F.col("kb.v").alias("_vb"),
            (F.col("ka.nrm") * F.col("kb.nrm")).alias("_nn"),
        )
        sim = _dot_expr("_va", "_vb", dim) / F.nullif(F.col("_nn"), F.lit(0.0))
        scored = joined.select(sim.alias("cos_sim")).where(
            F.col("cos_sim").isNotNull() & ~F.isnan("cos_sim")
        )
        counts = scored.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.count(F.when(F.col("cos_sim") >= 0.9, 1)).alias("dups"),
        ).collect()[0]
        print(
            f"MEAS k={k} in_cell_pairs={counts['pairs']} "
            f"dup_pairs={counts['dups']} wall={time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
