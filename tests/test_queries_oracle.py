"""Every registered query must match its DuckDB oracle (the driver's t2
gate, reproduced locally at sf0.001 — see poormans_kube_etl_spark.oracle).
Queries without an oracle must at least build and execute (rows-only)."""

from __future__ import annotations

import pytest

from poormans_kube_etl_spark.oracle import check_query
from poormans_kube_etl_spark.queries import all_queries


def _names():
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, res.message()


def test_canon_is_driver_strict():
    """The local harness must distinguish what the driver's value hash
    distinguishes (VERDICT r01: 8 hash-fails masked by a loose local
    canonicalizer). Re-introducing the decimal-output bug must fail."""
    import decimal

    import pandas as pd

    from poormans_kube_etl_spark.oracle import compare_frames

    spark_like = pd.DataFrame({"x": [decimal.Decimal("138014.00")]})
    duck_like = pd.DataFrame({"x": [138014.0]})
    assert not compare_frames("decimal_vs_float", spark_like, duck_like).ok
    # trailing-zero collapse must also be gone
    assert not compare_frames(
        "scale_drift",
        pd.DataFrame({"x": [decimal.Decimal("1.50")]}),
        pd.DataFrame({"x": [decimal.Decimal("1.5")]}),
    ).ok
    # identical doubles still compare equal
    assert compare_frames(
        "same", pd.DataFrame({"x": [138014.0]}), pd.DataFrame({"x": [138014.0]})
    ).ok
    # array cells must RAISE, like the driver's canonicalizer crash
    # (CORRECTNESS_r02) — not stringify-and-pass
    import numpy as np

    with pytest.raises(TypeError, match="driver-hashable|not driver"):
        compare_frames(
            "array_cell",
            pd.DataFrame({"x": [np.array([1.0, 2.0])]}),
            pd.DataFrame({"x": [np.array([1.0, 2.0])]}),
        )
    # r7: type tags — cross-type collisions must fail the gate
    assert not compare_frames(
        "str_vs_int", pd.DataFrame({"x": ["3"]}), pd.DataFrame({"x": [3]})
    ).ok
    assert not compare_frames(
        "str_vs_bool", pd.DataFrame({"x": ["True"]}), pd.DataFrame({"x": [True]})
    ).ok
    assert not compare_frames(
        "str_vs_null",
        pd.DataFrame({"x": ["NULL"]}),
        pd.DataFrame({"x": [None]}).astype("object"),
    ).ok
    # ...while NaT and None are BOTH null (NaT used to read 'NaT')
    assert compare_frames(
        "nat_vs_none",
        pd.DataFrame({"x": pd.Series([pd.NaT], dtype="datetime64[ns]")}),
        pd.DataFrame({"x": [None]}).astype("object"),
    ).ok
    # duplicate result columns fail named, not with an AttributeError
    dup = pd.DataFrame([[1, 2]], columns=["x", "x"])
    with pytest.raises(ValueError, match="duplicate result column"):
        compare_frames("dup_cols", dup, dup)


def test_no_decimal_typed_outputs(spark, sf_dir):
    """No query may emit a DECIMAL column in its FINAL schema — Spark
    returns Decimal objects while DuckDB-via-pandas returns float64, so
    any decimal output hash-fails at the driver even when values are
    identical (CORRECTNESS_r01). Finals go through functions.hash_safe
    (decimal → double) or integer types instead. DATE finals are banned
    too (r7 review): DuckDB fetch_df returns DATE columns as midnight
    Timestamps while Spark toPandas yields datetime.date — the same
    logical date always hash-mismatches; cast to timestamp or string."""
    from pyspark.sql.types import ArrayType, DateType, DecimalType, MapType

    from poormans_kube_etl_spark.queries import all_oracles

    oracled = set(all_oracles())
    offenders = []
    array_offenders = []
    date_offenders = []
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, DecimalType):
                offenders.append(f"{name}.{f.name}")
            # arrays/maps in ORACLE-CHECKED finals crash the driver's
            # pandas canonicalizer (CORRECTNESS_r02: unhashable ndarray)
            if name in oracled and isinstance(f.dataType, (ArrayType, MapType)):
                array_offenders.append(f"{name}.{f.name}")
            if name in oracled and isinstance(f.dataType, DateType):
                date_offenders.append(f"{name}.{f.name}")
    assert not offenders, f"decimal-typed final columns: {offenders}"
    assert not array_offenders, (
        f"array/map-typed final columns in oracle-checked queries "
        f"(driver-unhashable, serialize with array_join): {array_offenders}"
    )
    assert not date_offenders, (
        f"date-typed final columns in oracle-checked queries (the engines "
        f"carry DATE through pandas differently): {date_offenders}"
    )


def test_corpus_is_printable_ascii():
    """Premise pin for the r4 multimodal oracles (mm_decode_features,
    mm_frame_sample_hashes): DuckDB 1.0 can only slice/hash VARCHAR, so
    those oracles reproduce BYTE semantics (offsets, md5, byte sums)
    with character functions. That equivalence holds iff the corpus is
    single-byte text; this pins it for every SF the driver touches."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        bad, nulls = duckdb.sql(
            "SELECT count(*) FILTER (WHERE NOT regexp_matches(text, '^[\\x20-\\x7e\\n\\t]*$')), "
            "       count(*) FILTER (WHERE text IS NULL) "
            f"FROM read_parquet('{path}')"
        ).fetchone()
        assert bad == 0, f"sf{sf}: {bad} docs with non-printable-ASCII text"
        assert nulls == 0, f"sf{sf}: {nulls} NULL texts"


def test_canon_rows_is_per_column_typed():
    """Self-review r4: iterrows built a per-row Series whose dtype was
    the row's common upcast — an all-numeric frame with mixed
    int64/float64 columns canonicalized int cells as floats, silently
    passing the exact int-vs-double drift this harness exists to catch."""
    import pandas as pd

    from poormans_kube_etl_spark.oracle import compare_frames

    spark_like = pd.DataFrame(
        {"k": pd.Series([3], dtype="int64"), "v": pd.Series([1.5], dtype="float64")}
    )
    oracle_like = pd.DataFrame(
        {"k": pd.Series([3.0], dtype="float64"), "v": pd.Series([1.5], dtype="float64")}
    )
    assert not compare_frames("drift", spark_like, oracle_like).ok
    assert compare_frames("same", spark_like.copy(), spark_like.copy()).ok


def test_shingle_fragment_matches_jaccard_inline_copy(tmp_path):
    """queries/_fragments.shingle5_cte vs the byte-frozen inline copy
    inside dedup_ngram_jaccard_pairs' oracle: both run over the same
    documents in DuckDB and must produce the SAME (doc, gram) multiset
    — the drift guard for the one construction that exists in two
    textual copies (the inline one is frozen to keep its oracle string
    byte-stable; see the NOTE at its @register site)."""
    import duckdb

    from poormans_kube_etl_spark.queries._fragments import shingle5_cte
    from poormans_kube_etl_spark.queries import all_oracles

    jac = all_oracles()["dedup_ngram_jaccard_pairs"]
    # lift the inline toks/sh CTE pair exactly as registered
    inline = jac[jac.index("WITH") + 4 : jac.index(",\n    sizes AS")]
    docs = [
        (0, "  A  b\tc d e f g  "),          # messy whitespace + case
        (1, "short doc"),                      # shorter than the shingle
        (2, "a b c d e a b c d e a b c d e"),  # repeats → per-doc distinct
        (3, ""),                               # empty text
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    q_frag = f"WITH {shingle5_cte(cols='doc_id', where='doc_id < 200')} SELECT doc_id, s FROM sh ORDER BY doc_id, s"
    q_inline = f"WITH {inline} SELECT doc_id, s FROM sh ORDER BY doc_id, s"
    assert con.execute(q_frag).fetchall() == con.execute(q_inline).fetchall()
