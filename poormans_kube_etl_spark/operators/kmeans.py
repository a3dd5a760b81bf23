"""K-means (Lloyd's algorithm) over array<float> embeddings — the
iterative-refinement class of operator (like graph.connected_components)
expressed in pure DataFrame ops.

Per iteration: assign each vector to its nearest centroid (broadcast
centroids — k×dim doubles), recompute centroids as per-dimension means
of the assignment (posexplode → groupBy(cluster, dim) → mean → collect).
Each iteration is two narrow shuffles; lineage never grows because the
centroids pass between iterations as a PLAIN PYTHON list (k×dim
numbers through the driver — the classic small-model/big-data split;
the data DataFrame is only ever scanned, never iterated on).

Determinism and CROSS-ENGINE exactness (r4): every float operation is
chosen so an independent SQL engine replays the fit bit-for-bit,
which upgraded the registry query from rows-only to a full DuckDB
oracle:

- init = the k lowest-id vectors (no randomness);
- centroid means are INTEGER nano-unit sums divided in a fixed IEEE
  order — ``(sum(round(x·1e9)::bigint)::double / count) / 1e9`` —
  order-independent across partitionings AND engines (the previous
  ``round(avg(x), 9)`` depended on double partial-sum order below the
  rounding, and a foreign engine's ``avg`` could land on the other
  side of a 0.5e-9 boundary);
- distances use the dot-product identity ``|v|² − 2·v·c + |c|²`` with
  every dot as a left-to-right chain (``_dot_cols_sql``), the same
  accumulation order as DuckDB's ``list_dot_product`` (parity proven
  by the raw-double-compared sim_topk_bruteforce oracle) — a
  ``(x−y)²`` sum over an unordered GROUP BY could never match;
- ties (equal distance) go to the lowest cluster id on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.similarity import dot, to_double_vec


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right float dot — the list_dot_product accumulation
    order, in Python (used for the |c|² constants)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _assign(vectors: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, v, cluster): nearest centroid by the dot-identity squared
    L2 — ``(v·v − 2·v·c) + c·c`` — ties → lowest cluster id.

    Distances come from ONE runtime-looped transform over a k×dim
    centroid literal and the ``dot()`` FOLD (zip_with + aggregate):
    the fold accumulates strictly left-to-right, the same order as
    DuckDB's ``list_dot_product``, so the oracle replays the values
    bit-for-bit — while the plan compiles once and small. (An unrolled
    per-centroid arithmetic chain was bit-identical but paid ~4 s of
    generated-code compilation PER ITERATION, since every iteration's
    centroid literals make a fresh plan — measured 16-18 s per fit,
    r4.)"""
    cents = F.array(
        *[
            F.struct(
                F.array(*[F.lit(c) for c in centroid]).alias("c"),
                # |c|^2 precomputed on the DRIVER in the same
                # left-to-right order the in-plan fold would use
                F.lit(_seq_dot(centroid, centroid)).alias("sc"),
            )
            for centroid in centroids
        ]
    )
    v = to_double_vec(vec_col)
    # v·v hoisted to a projected column: referenced inside the
    # transform it would re-fold per centroid (k redundant dim-length
    # folds per row on the hot full-corpus scan — self-review r4)
    with_v = vectors.select(
        F.col(id_col), v.alias("v")
    ).withColumn("_sv", dot(F.col("v"), F.col("v")))
    dists = F.transform(
        cents,
        lambda e: (F.col("_sv") - F.lit(2.0) * dot(F.col("v"), e.getField("c")))
        + e.getField("sc"),
    )
    with_d = with_v.select(id_col, "v", dists.alias("dists"))
    best = F.array_position(F.col("dists"), F.array_min("dists")) - 1
    return with_d.select(id_col, "v", best.cast("int").alias("cluster"))


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Returns (centroids, assignments DataFrame[id, cluster]).

    The returned pair is CONSISTENT: assignments are (re)computed
    against the returned centroids. The loop assigns with the previous
    iteration's centroids before updating them, so on a max_iter exit
    the in-loop assignment is one model behind — a vector could carry a
    cluster label that is not its nearest returned centroid, skewing
    per-cluster stats and IVF cells downstream (self-review r4). On a
    converged exit the models are equal and the final assign is the
    same frame the loop already built."""
    seed_rows = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(to_double_vec(vec_col).alias("v"))
        .collect()
    )
    centroids = [[float(x) for x in r.v] for r in seed_rows]
    assigned = None
    for _ in range(max_iter):
        assigned = _assign(embeddings, centroids, id_col, vec_col)
        # integer nano-unit mean, same fixed IEEE division order as the
        # SQL oracle: (sum::double / count) / 1e9
        per_dim = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    (
                        F.sum(F.round(F.col("x") * 1e9).cast("bigint")).cast("double")
                        / F.count(F.lit(1))
                    )
                    / 1e9
                ).alias("c")
            )
        )
        rows = (
            per_dim.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s.getField("c"),
                ).alias("centroid")
            )
            .collect()
        )
        new_centroids = list(centroids)
        for r in rows:  # empty clusters keep their previous centroid
            new_centroids[r.cluster] = [float(x) for x in r.centroid]
        if new_centroids == centroids:
            break
        centroids = new_centroids
        assigned = None  # stale: belongs to the pre-update model
    if assigned is None:
        assigned = _assign(embeddings, centroids, id_col, vec_col)
    return centroids, assigned.select(id_col, "cluster")
