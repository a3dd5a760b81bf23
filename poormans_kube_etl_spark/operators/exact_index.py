"""Persisted exact-dedup fingerprint index — the FIFTH index family,
and the proof of the r10 unification claim (operators/index_artifact.py
module docstring): with the artifact plumbing shared, a new family is
a page of adapter code.

The most common production incremental screen is also the simplest:
"has this exact document (modulo whitespace/case) been ingested
before, and who is its canonical keeper?" One catalog table per index:

- ``<name>_fps`` (fp, keeper), bucketed by ``fp``: the md5 fingerprint
  of the normalized text (operators/text.fingerprint_md5 — the SAME
  key dedup_exact_stats groups on) with the min-id corpus doc as the
  pre-resolved keeper. A delta probe is ONE join landing on the stored
  bucket distribution, then a min over the (rare) multi-fragment
  collisions — the corpus text is never re-read, never re-hashed.

Maintenance (operators/index_maintenance.merge_delta_into_fp_index):
append the delta's (fp, keeper) rows; a fingerprint present in several
fragments yields several keeper candidates at probe time, resolved by
the probe's own MIN — correctness is append-invariant, duplicates only
cost join fan-out until compaction (the family invariant).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.index_artifact import (
    corpus_fingerprint,
    load_table_properties,
    stamp_table_properties,
)
from poormans_kube_etl_spark.operators.text import fingerprint_md5

INDEX_FORMAT_VERSION = "1"

_PROP_PREFIX = "pke.exactfp."
_CONSTANT_KEYS = ("id_col", "text_col", "fingerprint", "format_version")


@dataclass(frozen=True)
class CorpusFpIndex:
    """Handle to a persisted fingerprint table plus its constants."""

    fps: DataFrame
    constants: dict[str, str]

    @property
    def id_col(self) -> str:
        return self.constants["id_col"]


def corpus_fps(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fp, keeper) — min-id keeper per normalized-text fingerprint."""
    return (
        docs.select(F.col(id_col), fingerprint_md5(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"))
    )


def write_corpus_fp_index(
    corpus_docs: DataFrame,
    name: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "errorifexists",
    source_fingerprint: str | None = None,
) -> None:
    """Hash the corpus ONCE and land the keeper-resolved fingerprint
    set, bucketed by fp."""
    spark = corpus_docs.sparkSession
    w = corpus_fps(corpus_docs, id_col, text_col).write.mode(mode).bucketBy(
        n_buckets, "fp"
    )
    if path is not None:
        w = w.option("path", f"{path}/fps")
    w.saveAsTable(f"{name}_fps")
    stamp_table_properties(
        spark,
        f"{name}_fps",
        _PROP_PREFIX,
        {
            "id_col": id_col,
            "text_col": text_col,
            "fingerprint": corpus_fingerprint(corpus_docs, id_col),
            "format_version": INDEX_FORMAT_VERSION,
            **(
                {"source_fingerprint": source_fingerprint}
                if source_fingerprint is not None
                else {}
            ),
        },
    )
    if path is not None:
        from poormans_kube_etl_spark.operators.index_artifact import (
            write_artifact_manifest,
        )

        write_artifact_manifest(spark, path, (f"{name}_fps",))


def read_corpus_fp_index(spark: SparkSession, name: str) -> CorpusFpIndex:
    try:
        fps = spark.table(f"{name}_fps")
    except Exception as e:
        raise ValueError(
            f"{name}: fingerprint table not found ({e.__class__.__name__}) — "
            "not an exact-dedup index; build with write_corpus_fp_index"
        ) from e
    constants = load_table_properties(
        spark,
        f"{name}_fps",
        _PROP_PREFIX,
        _CONSTANT_KEYS,
        family="exact-dedup fingerprint index",
        format_version=INDEX_FORMAT_VERSION,
        builder="write_corpus_fp_index",
    )
    return CorpusFpIndex(fps=fps, constants=constants)


def exact_duplicates_indexed(
    new_docs: DataFrame, index: CorpusFpIndex, text_col: str | None = None
) -> DataFrame:
    """(doc, keeper) for every NEW document whose normalized text
    already exists in the indexed corpus. The delta pays its own hash
    plus one fp-keyed join onto the stored bucket distribution; the
    MIN collapses multi-fragment keeper candidates (module docstring).
    The id/text column names come FROM the artifact unless overridden."""
    c = index.constants
    tcol = text_col if text_col is not None else c["text_col"]
    probe = new_docs.select(
        F.col(c["id_col"]).alias("doc"), fingerprint_md5(tcol).alias("fp")
    )
    return (
        probe.join(index.fps, "fp")
        .groupBy("doc")
        .agg(F.min("keeper").alias("keeper"))
    )
