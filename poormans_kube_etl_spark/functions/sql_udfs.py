"""SQL-surface registration of the engine's scalar library.

``register_sql_functions(spark)`` creates TEMPORARY SQL scalar
functions (Spark SQL ``CREATE FUNCTION ... RETURN expr``) mirroring the
Column builders in this package, so ``spark.sql`` users get the same
vocabulary as DataFrame users. These are SQL-macro expansions, NOT
Python UDFs — the body inlines into the plan and stays inside
whole-stage codegen, exactly like the Column forms.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = {
    # reference duration format incl. the %24 hour wrap (helpers.js:65-73)
    "dur_hmm": (
        "(s BIGINT) RETURNS STRING RETURN "
        "format_string('%dh:%02dmins', CAST(floor(s/3600) % 24 AS INT), "
        "CAST(floor(s/60) % 60 AS INT))"
    ),
    # canonical text form used by every fingerprint/dedup op
    "norm_text": (
        "(t STRING) RETURNS STRING RETURN "
        "lower(trim(regexp_replace(t, '\\\\s+', ' ')))"
    ),
    "fingerprint_md5": (
        "(t STRING) RETURNS STRING RETURN "
        "md5(lower(trim(regexp_replace(t, '\\\\s+', ' '))))"
    ),
    "ws_token_count": (
        "(t STRING) RETURNS INT RETURN size(split(t, ' '))"
    ),
    # path segment i (0-based) of an object key, NULL past the end
    "path_segment": (
        "(key STRING, i INT) RETURNS STRING RETURN get(split(key, '/'), i)"
    ),
    # does a string parse as a unix-epoch folder label (reference F1)
    "is_epoch_label": (
        "(s STRING) RETURNS BOOLEAN RETURN try_cast(s AS BIGINT) IS NOT NULL"
    ),
    # strict left-to-right double dot product / cosine over array<double>
    "vec_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    ),
    "vec_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / "
        "(sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) * "
        "sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create all engine SQL functions; returns the registered names."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_FUNCTIONS)
