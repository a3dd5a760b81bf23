"""K-means (Lloyd's algorithm) over array<float> embeddings — the
iterative-refinement class of operator (like graph.connected_components)
expressed in pure DataFrame ops.

Per iteration: assign each vector to its nearest centroid (broadcast
centroids — k×dim doubles), recompute centroids as per-dimension means
of the assignment (posexplode → groupBy(cluster, dim) → avg → collect).
Each iteration is two narrow shuffles; lineage never grows because the
centroids pass between iterations as a PLAIN PYTHON list (k×dim
numbers through the driver — the classic small-model/big-data split;
the data DataFrame is only ever scanned, never iterated on).

Determinism: init = the k lowest-id vectors; centroid components are
rounded to 9 dp each iteration so double-summation partial order (which
varies with partitioning) cannot leak into assignments across reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.similarity import to_double_vec


def _assign(vectors: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster): nearest centroid by squared L2 (ties → lowest
    cluster id). Distances come from ONE runtime-looped transform over a
    k×dim centroid literal — unrolling k wide distance expressions costs
    seconds of codegen compile per iteration (each iteration is a fresh
    plan), the loop form compiles once and small."""
    cents = F.array(
        *[F.array(*[F.lit(c) for c in centroid]) for centroid in centroids]
    )
    v = to_double_vec(vec_col)
    with_v = vectors.select(F.col(id_col), v.alias("v"))
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
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
    centroids = [[round(float(x), 9) for x in r.v] for r in seed_rows]
    assigned = None
    for _ in range(max_iter):
        assigned = _assign(embeddings, centroids, id_col, vec_col)
        per_dim = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), 9).alias("c"))
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
