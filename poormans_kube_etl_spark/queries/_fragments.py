"""Shared DuckDB-oracle SQL fragments.

One master copy of the word-5-gram shingle construction that several
oracles replay (containment, n-gram novelty, source overlap). It must
stay semantically identical to ``operators/text.py:word_shingles`` +
``normalize_text`` (lower/trim/whitespace-collapse, per-doc distinct,
whole-doc degenerate window for docs shorter than the shingle length).
The n-gram Jaccard oracle (queries/dedup.py) predates this module and
keeps its own inline copy — BYTE-identical oracle strings are part of
the driver-window contract, so it is cross-referenced rather than
rewritten; any semantic change must land in all sites.
"""

from __future__ import annotations


def shingle5_cte(cols: str = "doc_id", where: str = "") -> str:
    """``toks``/``sh`` CTE pair producing per-doc-distinct word 5-grams.

    ``cols``: comma-separated passthrough columns (each row of ``sh``
    carries them alongside the gram ``s``). ``where``: optional SQL
    predicate over ``documents`` (e.g. the oracle-affordability cap).
    """
    where_sql = f"WHERE {where}" if where else ""
    return f"""
    toks AS (
      SELECT {cols},
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
      FROM documents {where_sql}
    ),
    sh AS (
      SELECT {cols},
             UNNEST(list_distinct(
               CASE WHEN len(t) >= 5
                    THEN list_transform(range(0, len(t) - 4),
                                        i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
                    ELSE [array_to_string(t, ' ')] END)) AS s
      FROM toks
    )
"""


# Planted exact twins over ``documents`` (r10): every 25th doc
# re-appears under doc_id + 1,000,000. Two flavors:
# - MANGLED (leading spaces + uppercase): byte-DIFFERENT but
#   normalization-IDENTICAL — exercises the normalize-then-fingerprint
#   path (norm(upper(t)) == norm(t) since the normalizer lowercases).
# - VERBATIM: byte-identical — for checksum-level dedup faces.
# The synthetic corpus has zero natural exact duplicates, so without
# planting, an exact-dedup face's oracle passes vacuously on an empty
# result (the same reason the embedding faces plant md5-perturbed
# twins). Both engines reconstruct the twins deterministically.
PLANT_MOD = 25
PLANT_OFFSET = 1_000_000


def planted_exact_twins_sql(mangled: bool = True, extra_where: str = "") -> str:
    """A FROM-able subquery: documents plus the planted twin rows.
    ``extra_where`` further restricts which docs spawn twins."""
    text_expr = "'  ' || upper(text)" if mangled else "text"
    more = f"AND ({extra_where})" if extra_where else ""
    return f"""(
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET}, {text_expr}, lang, source, n_chars
      FROM documents WHERE doc_id % {PLANT_MOD} = 0 {more}
    )"""
