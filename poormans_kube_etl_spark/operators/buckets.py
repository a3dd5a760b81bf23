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
    The star remainder is projected in its OWN select before the
    explode so the generator's output rows don't each carry the full
    bucket array (the measured O(n²)-bytes failure shape at 10k-member
    buckets; see simhash.py)."""
    pair_structs = F.flatten(
        F.transform(
            member_arr,
            lambda a, i: F.transform(
                F.slice(member_arr, i + 2, F.size(member_arr)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    all_pairs = (
        buckets.where(F.size(member_arr) <= max_bucket)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
    )
    star_pairs = (
        buckets.where(F.size(member_arr) > max_bucket)
        .select(
            F.element_at(member_arr, 1).alias("a"),
            F.slice(member_arr, 2, F.size(member_arr)).alias("rest"),
        )
        .select("a", F.explode("rest").alias("b"))
    )
    return all_pairs.unionByName(star_pairs).distinct()
