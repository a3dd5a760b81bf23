"""SimHash (64-bit) near-duplicate fingerprints — pure DataFrame ops.

Classic Charikar construction: hash each token to 64 bits (xxhash64);
for each bit position accumulate +1/-1 across tokens; the sign vector
is the fingerprint. Near-dups are pairs within a small Hamming
distance.

Shape: tokens are EXPLODED to rows and the 64 per-bit sums are a single
hash-aggregate (64 ``sum`` columns) — each token is hashed once inside
whole-stage codegen (subexpression elimination shares the xxhash64
across the 64 getbits), map-side partial aggregation makes the shuffle
carry 64 ints per doc. The earlier array-expression formulation
(aggregate of zip_with over nested transforms) allocated a 64-element
array per token per doc outside codegen — ~10× slower and it degrades
with document length; rows scale out, array expressions don't.

The fingerprint is materialized as an array<int> of 64 bits rather than
one packed long: PySpark's shiftleft/shiftright wrappers only take
literal shift counts, and packing bit 63 would overflow a long under
ANSI mode. Blocks for the pigeonhole candidate step are packed 16 bits
at a time (acc*2+bit, max 65535 — safe), which is all the pairing needs.

Deterministic across runs (fixed xxhash64), as the driver's repeated
rows-only checks require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.text import normalize_text, tokens

_BITS = 64
_BLOCK_BITS = 16
_N_BLOCKS = _BITS // _BLOCK_BITS


def simhash_bits_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame[id, bits: array<int>] — one 64-bit sign vector per doc.

    explode(tokens) → groupBy(id) with 64 partial-aggregated bit sums;
    ties (sum == 0, incl. empty docs) resolve to bit 0.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    # hash in its own projection: 64 aggregate update expressions each
    # reference h — materializing it guarantees one string hash per
    # token instead of relying on CSE inside the aggregate
    ex = docs.select(id_col, F.explode(toks).alias("tok")).select(
        id_col, F.xxhash64("tok").alias("h")
    )
    sums = [
        F.sum(F.getbit(F.col("h"), F.lit(b)) * 2 - 1).alias(f"b{b}")
        for b in range(_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*sums)
    bits = F.array(
        *[F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)) for b in range(_BITS)]
    )
    return agg.select(id_col, bits.alias("bits"))


def _pack_block(bits: Column, block_id: Column) -> Column:
    """Pack a 16-bit slice of the bit array into an int (acc*2 + bit)."""
    block = F.slice(bits, block_id * _BLOCK_BITS + 1, _BLOCK_BITS)
    return F.aggregate(block, F.lit(0), lambda acc, x: acc * 2 + x)


def _hex_from_bits(bits: Column) -> Column:
    """Display form: 16 hex chars (4 packed 16-bit blocks, MSB first)."""
    parts = [
        F.lpad(F.hex(_pack_block(bits, F.lit(i))), 4, "0")
        for i in range(_N_BLOCKS - 1, -1, -1)
    ]
    return F.lower(F.concat(*parts))


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    return F.aggregate(
        F.zip_with(bits_a, bits_b, lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame[id, simhash_bits: array<int>, simhash: hex string]."""
    fps = simhash_bits_df(docs, id_col, text_col)
    return fps.select(
        id_col,
        F.col("bits").alias("simhash_bits"),
        _hex_from_bits(F.col("bits")).alias("simhash"),
    )


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs (a, b, hamming) with Hamming distance <= max_hamming.

    Blocking: 4 × 16-bit blocks — by pigeonhole, any pair within Hamming
    distance 3 agrees on at least one block, so candidates come only from
    equal blocks (4 bucket rows per doc). Pairs are expanded inside each
    bucket after a single groupBy — one narrow shuffle, no self-join that
    would recompute the fingerprint subtree on both sides; linear in
    corpus size.
    """
    fps = simhash_bits_df(docs, id_col, text_col).withColumnRenamed(id_col, "doc")
    banded = fps.select(
        "doc",
        "bits",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_BLOCKS - 1)),
                lambda i: F.struct(
                    i.alias("block_id"), _pack_block(F.col("bits"), i).alias("block_val")
                ),
            )
        ).alias("blk"),
    ).select("doc", "bits", "blk.block_id", "blk.block_val")
    buckets = (
        banded.groupBy("block_id", "block_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc", "bits"))).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda a, i: F.transform(
                F.slice("ds", i + 2, F.size("ds")),
                lambda b: F.struct(
                    a.getField("doc").alias("a"),
                    b.getField("doc").alias("b"),
                    hamming_distance(a.getField("bits"), b.getField("bits")).alias(
                        "hamming"
                    ),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b", "p.hamming")
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
