"""Persisted BM25 postings index: writer/reader round-trip, ranking
parity with the live text_bm25_topk path, and the plan gate that a
probe never re-tokenizes the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.retrieval_index import (
    bm25_topk_indexed,
    read_corpus_bm25_index,
    write_corpus_bm25_index,
)
from poormans_kube_etl_spark.sources import load_table


@pytest.fixture(scope="module")
def bm25_index(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path_factory.mktemp("bm25idx"))
    write_corpus_bm25_index(docs, "t_bm25idx", path=path, n_buckets=4)
    yield read_corpus_bm25_index(spark, "t_bm25idx")
    spark.sql("DROP TABLE IF EXISTS t_bm25idx_postings")


def test_bm25_index_roundtrip_restores_scalars(spark, sf_dir, bm25_index):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert bm25_index.n_docs == n
    assert bm25_index.avgdl > 0
    cols = set(bm25_index.postings.columns)
    assert cols == {"tok", "doc_id", "tf", "dl", "df"}


def test_bm25_indexed_matches_live_query(spark, sf_dir, bm25_index):
    """The artifact path is a pure optimization: rankings and rounded
    scores must equal the live (tokenize-per-run) registered query."""
    from poormans_kube_etl_spark.queries import all_queries
    from poormans_kube_etl_spark.queries.text_analysis import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_QUERIES,
    )

    live = [
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in all_queries()["text_bm25_topk"](spark, sf_dir).collect()
    ]
    qdf = spark.createDataFrame(list(_BM25_QUERIES), ["query_id", "qtext"])
    indexed = [
        (r.query_id, r.nn_id, r.sim, r.rank)
        for r in bm25_topk_indexed(
            qdf, bm25_index, _BM25_K, k1=_BM25_K1, b=_BM25_B
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert live == indexed
    assert live  # non-vacuous: the fixed queries hit the corpus vocab


def test_bm25_indexed_probe_never_scans_documents(spark, bm25_index):
    """A probe's only parquet scans are the postings table — the corpus
    documents are never re-read, never re-tokenized."""
    qdf = spark.createDataFrame([(0, "stream batch window")], ["query_id", "qtext"])
    df = bm25_topk_indexed(qdf, bm25_index, 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        line
        for line in plan.splitlines()
        if "FileScan parquet" in line or "Scan parquet" in line
    ]
    assert scans, "expected the postings table to be scanned"
    for line in scans:
        assert "t_bm25idx_postings" in line, line[:160]
    # no explode of a corpus text column anywhere in the probe plan
    assert "normalize_text" not in plan


def test_bm25_reader_rejects_non_index_tables(spark):
    with pytest.raises(ValueError, match="not a BM25 index|not found"):
        read_corpus_bm25_index(spark, "t_bm25_never_written")
    # a table that exists but carries no index properties
    spark.createDataFrame([(1,)], "x int").write.mode("overwrite").saveAsTable(
        "t_bm25_impostor_postings"
    )
    try:
        with pytest.raises(ValueError, match="missing table property"):
            read_corpus_bm25_index(spark, "t_bm25_impostor")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bm25_impostor_postings")
