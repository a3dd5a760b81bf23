"""MinHash + LSH near-duplicate detection — pure DataFrame ops.

Pipeline (the standard shingle→minhash→band→bucket-join construction):

1. per doc: distinct word shingles (operators.text.word_shingles)
2. per doc: k MinHash signatures — min over shingles of a seeded 64-bit
   hash (xxhash64 with the band index baked into the input; no UDF)
3. split the signature into b bands of r rows; hash each band
4. self-join on (band_id, band_hash) → candidate pairs (a < b)
5. verify candidates with exact shingle-set Jaccard; keep >= threshold

Scale: the only shuffle joins are on band buckets — each doc appears in
exactly b rows, so the join input is b·N rows regardless of document
size, and bucket skew is bounded by band-hash uniformity. The exact
verify touches only candidate pairs. This is how you near-dedup 100 TB
without an O(N²) similarity join; numbers (k=32, b=8, r=4) target
J≈0.6+ recall and are constructor args.

All hashing is deterministic (xxhash64 fixed seed), so results are
stable across runs/partitionings — required for the driver's repeated
rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.text import normalize_text, tokens, word_shingles


def shingle_docs(docs: DataFrame, id_col: str, text_col: str, shingle_len: int) -> DataFrame:
    toks = tokens(normalize_text(text_col))
    return docs.select(id_col, word_shingles(toks, shingle_len).alias("shingles"))


def minhash_signatures(shingled: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """k MinHash values per doc, computed array-at-a-time: for seed i,
    min over shingles of xxhash64(i, shingle)."""
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(i, s))
        ),
    )
    return shingled.select(id_col, "shingles", sig.alias("sig"))


def lsh_candidate_pairs(
    signed: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signature and bucket-join. Output: (a, b) candidate doc
    ids with a < b, distinct."""
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = signed.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.transform(
                band_ids,
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias(
                        "band_hash"
                    ),
                ),
            )
        ).alias("band"),
    ).select("doc", "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("a"), F.col("b.doc").alias("b"))
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, shingled: DataFrame, id_col: str) -> DataFrame:
    """Verify candidates: exact Jaccard over the distinct-shingle sets."""
    sa = shingled.select(F.col(id_col).alias("a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col(id_col).alias("b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pairs: (a, b, jaccard) with jaccard >= threshold."""
    assert num_hashes % bands == 0
    shingled = shingle_docs(docs, id_col, text_col, shingle_len)
    signed = minhash_signatures(shingled, id_col, num_hashes)
    cands = lsh_candidate_pairs(signed, id_col, bands, num_hashes // bands)
    return exact_jaccard(cands, shingled, id_col).where(F.col("jaccard") >= threshold)
