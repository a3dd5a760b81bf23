"""Persisted corpus gram index: writer/reader round-trip, parity with
the live incremental face, and the plan gate that a delta probe never
re-tokenizes the corpus — the substring member of the index-artifact
family (see tests/test_minhash_index.py for the MinHash/SRP siblings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.substring import (
    duplicate_spans,
    merge_islands,
    positional_kgrams,
    read_corpus_gram_index,
    substring_spans_indexed,
    write_corpus_gram_index,
)
from poormans_kube_etl_spark.sources import load_table

_K = 8


@pytest.fixture(scope="module")
def gram_index(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    path = str(tmp_path_factory.mktemp("ssidx"))
    write_corpus_gram_index(corpus, "t_ssidx", k=_K, path=path, n_buckets=4)
    yield read_corpus_gram_index(spark, "t_ssidx")
    spark.sql("DROP TABLE IF EXISTS t_ssidx_grams")


def test_index_roundtrip_restores_constants(gram_index):
    c = gram_index.constants
    assert gram_index.k == _K
    assert c["id_col"] == "doc_id" and c["text_col"] == "text"
    assert gram_index.grams.columns == ["g"]


def test_indexed_delta_matches_live_incremental(spark, sf_dir, gram_index):
    docs = load_table(spark, sf_dir, "documents")
    delta = docs.where(F.col("doc_id") % 10 == 0)
    live_corpus = (
        positional_kgrams(docs.where(F.col("doc_id") % 10 != 0), _K)
        .select("g")
        .distinct()
    )
    live_hits = positional_kgrams(delta, _K).join(live_corpus, "g").selectExpr(
        "doc_id", "s", f"s + {_K} as e"
    )
    live = {tuple(r) for r in merge_islands(live_hits).collect()}
    indexed = {tuple(r) for r in substring_spans_indexed(delta, gram_index).collect()}
    assert live, "expected known delta-vs-corpus spans on this corpus"
    assert indexed == live


def test_indexed_delta_never_retokenizes_corpus(spark, gram_index):
    """Round-2-of-a-delta-ingest gate: the indexed plan's only parquet
    scan is the gram table — corpus documents are never re-read."""
    delta = spark.createDataFrame(
        [(10_000_001, "one fresh delta document about ingest folders today ok")],
        "doc_id long, text string",
    )
    df = substring_spans_indexed(delta, gram_index)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        line
        for line in plan.splitlines()
        if "FileScan parquet" in line or "Scan parquet" in line
    ]
    assert scans, "expected the gram table to be scanned"
    for line in scans:
        assert "t_ssidx_grams" in line, line[:160]
    # and it still runs end to end (no spans for an unrelated doc)
    assert df.collect() == []


def test_reader_rejects_non_index_tables(spark, tmp_path):
    spark.range(3).withColumnRenamed("id", "g").write.mode("overwrite").option(
        "path", str(tmp_path / "plain")
    ).saveAsTable("t_ss_plain_grams")
    try:
        with pytest.raises(ValueError, match="missing table property"):
            read_corpus_gram_index(spark, "t_ss_plain")
        with pytest.raises(ValueError, match="not a corpus gram index"):
            read_corpus_gram_index(spark, "t_ss_never_written")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ss_plain_grams")


def test_width_comes_from_artifact_not_caller(spark, sf_dir, tmp_path_factory):
    """A k=5 artifact probed by a delta must gram the delta at k=5 —
    the caller never supplies a width that could disagree with the
    stored set (the two-engine banding-constants lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path_factory.mktemp("ssidx5"))
    write_corpus_gram_index(
        docs.where(F.col("doc_id") % 10 != 0), "t_ssidx5", k=5, path=path, n_buckets=2
    )
    try:
        idx = read_corpus_gram_index(spark, "t_ssidx5")
        assert idx.k == 5
        delta = docs.where(F.col("doc_id") % 10 == 0)
        spans = substring_spans_indexed(delta, idx).collect()
        assert spans  # k=5 finds at least the k=8 spans' content
        for r in spans:
            assert r.span_len >= 5, r
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ssidx5_grams")
