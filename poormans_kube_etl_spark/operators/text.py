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
    """Coarse rolling fingerprint: md5 of the first n tokens — a cheap
    near-dup blocking key (same-prefix docs collide)."""
    return F.md5(F.array_join(F.slice(toks, 1, n), " "))
