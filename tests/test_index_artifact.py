"""Shared index-artifact plumbing (r10, VERDICT r09 #8 + the two
artifact ADVICE items): identifier validation / property escaping for
the TBLPROPERTIES SQL, and the data-freshness fingerprint that makes
regenerated-data-at-the-same-path rebuild instead of silently probing
a stale index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.index_artifact import (
    corpus_fingerprint,
    get_or_build,
    load_table_properties,
    sf_dir_tag,
    stamp_table_properties,
    validate_identifier,
)


def test_validate_identifier_rejects_sql_metacharacters():
    for bad in ("a'b", "a;drop", "a b", "a-b", "", "1abc", "a.b"):
        with pytest.raises(ValueError):
            validate_identifier(bad)
    assert validate_identifier("pke_idx_v1_sf0_01") == "pke_idx_v1_sf0_01"


def test_stamp_escapes_single_quotes_in_values(spark):
    """A property VALUE containing a quote previously broke (or
    injected into) the ALTER TABLE statement — it must round-trip."""
    spark.range(1).write.mode("overwrite").saveAsTable("t_artifact_esc")
    try:
        stamp_table_properties(
            spark,
            "t_artifact_esc",
            "pke.test.",
            {"text_col": "it's quoted", "format_version": "1"},
        )
        constants = load_table_properties(
            spark,
            "t_artifact_esc",
            "pke.test.",
            ("text_col", "format_version"),
            family="test artifact",
            format_version="1",
            builder="n/a",
        )
        assert constants["text_col"] == "it's quoted"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_artifact_esc")


def test_stamp_refuses_unsafe_table_name(spark):
    with pytest.raises(ValueError):
        stamp_table_properties(spark, "x; DROP TABLE y", "p.", {"a": "1"})


def test_load_rejects_version_skew_and_foreign_tables(spark):
    spark.range(1).write.mode("overwrite").saveAsTable("t_artifact_skew")
    try:
        with pytest.raises(ValueError, match="missing table property"):
            load_table_properties(
                spark,
                "t_artifact_skew",
                "pke.test.",
                ("format_version",),
                family="test artifact",
                format_version="2",
                builder="n/a",
            )
        stamp_table_properties(
            spark, "t_artifact_skew", "pke.test.", {"format_version": "1"}
        )
        with pytest.raises(ValueError, match="index format"):
            load_table_properties(
                spark,
                "t_artifact_skew",
                "pke.test.",
                ("format_version",),
                family="test artifact",
                format_version="2",
                builder="n/a",
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_artifact_skew")


def test_corpus_fingerprint_tracks_count_and_key_range(spark):
    a = spark.range(10).select(F.col("id").alias("doc_id"))
    assert corpus_fingerprint(a, "doc_id") == "10:9"
    # appended rows change it; so does a regenerated key range at the
    # same count (truncate-and-reload with different ids)
    assert corpus_fingerprint(a.union(a), "doc_id") != "10:9"
    b = spark.range(5, 15).select(F.col("id").alias("doc_id"))
    assert corpus_fingerprint(b, "doc_id") == "10:14"


def test_get_or_build_rebuilds_on_fingerprint_mismatch():
    """The staleness mode format_version cannot see: data regenerated
    at the same path. get_or_build must rebuild exactly once."""

    class FakeIdx:
        def __init__(self, fp):
            self.constants = {"fingerprint": fp}

    state = {"stamped": "old", "builds": 0}

    def read():
        return FakeIdx(state["stamped"])

    def build():
        state["builds"] += 1
        state["stamped"] = "new"

    idx = get_or_build(read, build, live_fingerprint="new")
    assert state["builds"] == 1
    assert idx.constants["fingerprint"] == "new"
    # fresh artifact: no rebuild
    idx = get_or_build(read, build, live_fingerprint="new")
    assert state["builds"] == 1


def test_get_or_build_builds_when_read_fails():
    state = {"built": False}

    def read():
        if not state["built"]:
            raise ValueError("missing table")
        class Idx:
            constants = {"fingerprint": "fp"}
        return Idx()

    def build():
        state["built"] = True

    idx = get_or_build(read, build, live_fingerprint="fp")
    assert state["built"] and idx.constants["fingerprint"] == "fp"


def test_sf_dir_tag_distinguishes_sanitization_collisions(tmp_path):
    d1 = tmp_path / "sf0.1"
    d2 = tmp_path / "sf0_1"
    d1.mkdir()
    d2.mkdir()
    t1, t2 = sf_dir_tag(str(d1)), sf_dir_tag(str(d2))
    assert t1 != t2
    assert validate_identifier(f"pke_x_{t1}")  # tags compose into identifiers
