"""Bucket → candidate-pair expansion shared by the LSH families.

Extracted r7 (self-review): ``minhash.lsh_candidate_pairs`` and
``similarity.embedding_lsh_candidate_pairs`` carried near-verbatim
copies of this ~25-line expansion, and the copies had already diverged
— the similarity copy aggregated with collect_list (a duplicated
member id became an (a, a) self-pair downstream) and referenced the
bucket array in the same select as the star explode, the exact
Generate shape ``simhash.simhash_near_duplicates`` documents OOMing
when every generated row carries the full hot-bucket array. One
helper, one set of fixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_member_pairs(
    buckets: DataFrame, member_arr: str, max_bucket: int
) -> DataFrame:
    """(a, b) candidate pairs (a < b, distinct) from per-bucket
    membership arrays.

    ``buckets`` holds one row per bucket with ``member_arr`` an array
    of member ids — build it with ``array_sort(collect_set(...))``:
    sorted so the i<j expansion yields a < b, a SET so a duplicated
    member id (double-loaded partition, upsert artifact) cannot become
    a self-pair.

    Buckets within ``max_bucket``: in-bucket all-pairs — O(n²) per
    bucket, bounded by the cap. Oversized buckets: star-link every
    member to the bucket's smallest id — O(n), keeps every member in
    the same downstream connected component; the documented trade is
    losing the direct pair between two non-representative members.
    Both regimes are emitted by ONE conditional generator (r13): the
    previous two-branch form (``where(size<=cap)`` all-pairs UNION
    ``where(size>cap)`` star) consumed the buckets frame twice, so the
    ENTIRE upstream pipeline — signature aggregate + banding + bucket
    aggregation for MinHash, the SRP GEMM for embeddings — executed
    once per branch. A CASE WHEN inside the explode picks the
    expansion per row instead: one consumer, one upstream execution,
    identical pair set (each bucket falls in exactly one regime and
    codegen evaluates CASE branches lazily, so an oversized bucket
    never builds its O(n²) all-pairs array). Generator hygiene is
    preserved: the select carries ONLY the explode, so generated rows
    are bare (a, b) structs and never copy the bucket array (the
    measured O(n²)-bytes failure shape at 10k-member buckets; see
    simhash.py)."""
    pair_structs = F.flatten(
        F.transform(
            member_arr,
            lambda a, i: F.transform(
                F.slice(member_arr, i + 2, F.size(member_arr)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    star_structs = F.transform(
        F.slice(member_arr, 2, F.size(member_arr)),
        lambda b: F.struct(F.element_at(member_arr, 1).alias("a"), b.alias("b")),
    )
    expansion = F.when(
        F.size(member_arr) <= max_bucket, pair_structs
    ).otherwise(star_structs)
    return (
        buckets.select(F.explode(expansion).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )
