"""SimHash (64-bit) near-duplicate fingerprints — pure DataFrame ops.

Classic Charikar construction: hash each token to 64 bits (xxhash64);
for each bit position accumulate +1/-1 across tokens; the sign vector
is the fingerprint. Near-dups are pairs within a small Hamming
distance.

The fingerprint is materialized as an array<int> of 64 bits rather than
one packed long: PySpark's shiftleft/shiftright wrappers only take
literal shift counts, and packing bit 63 would overflow a long under
ANSI mode. Blocks for the pigeonhole join are packed 16 bits at a time
(acc*2+bit, max 65535 — safe), which is all the join needs.

Everything is array arithmetic on the JVM (getbit + transform/
aggregate/zip_with); per-doc cost is O(tokens·64) with no shuffle until
the pairing step. Deterministic across runs (fixed xxhash64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.text import normalize_text, tokens

_BITS = 64
_BLOCK_BITS = 16
_N_BLOCKS = _BITS // _BLOCK_BITS


def simhash_bits(text_col: Column) -> Column:
    """Column: array<int> of 64 sign bits — the SimHash fingerprint."""
    toks = tokens(normalize_text(text_col))
    bit_idx = F.sequence(F.lit(0), F.lit(_BITS - 1))
    # per token: ±1 per bit position of its 64-bit hash
    tok_bits = F.transform(
        toks,
        lambda t: F.transform(bit_idx, lambda b: F.getbit(F.xxhash64(t), b) * 2 - 1),
    )
    zero = F.transform(bit_idx, lambda _: F.lit(0))
    sums = F.aggregate(tok_bits, zero, lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y))
    return F.transform(sums, lambda s: F.when(s > 0, F.lit(1)).otherwise(F.lit(0)))


def _pack_block(bits: Column, block_id: Column) -> Column:
    """Pack a 16-bit slice of the bit array into an int (acc*2 + bit)."""
    block = F.slice(bits, block_id * _BLOCK_BITS + 1, _BLOCK_BITS)
    return F.aggregate(block, F.lit(0), lambda acc, x: acc * 2 + x)


def simhash_hex(text_col: Column) -> Column:
    """Display form: 16 hex chars (4 packed 16-bit blocks, MSB first)."""
    bits = simhash_bits(text_col)
    parts = [
        F.lpad(F.hex(_pack_block(bits, F.lit(i))), 4, "0") for i in range(_N_BLOCKS - 1, -1, -1)
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
    return docs.select(
        id_col,
        simhash_bits(F.col(text_col)).alias("simhash_bits"),
        simhash_hex(F.col(text_col)).alias("simhash"),
    )


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming.

    Blocking: 4 × 16-bit blocks — by pigeonhole, any pair within Hamming
    distance 3 agrees on at least one block, so we join only within equal
    blocks (4 rows per doc) instead of all pairs. Same bucket-join shape
    as MinHash-LSH; linear in corpus size."""
    fps = docs.select(F.col(id_col).alias("doc"), simhash_bits(F.col(text_col)).alias("bits"))
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
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("a"),
            F.col("b.doc").alias("b"),
            hamming_distance(F.col("a.bits"), F.col("b.bits")).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
