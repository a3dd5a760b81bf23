"""Structured Streaming operators — the unbounded half of the engine.

The reference's outer loop IS a stream: an unbounded sequence of ingest
folders polled every 60 s (src/ingestor.js:54,80-95), each folder a
bounded batch — exactly Spark's micro-batch model (SURVEY.md §1
"stream vs batch"). This module provides the streaming primitives the
engine exposes on top of that model:

- file-source streams with bounded per-trigger intake
  (``maxFilesPerTrigger`` — the reference's one-folder-per-cycle
  throttle) and source cleanup after commit (its S3 delete-after-commit,
  src/ingestor.js:312-320)
- event-time windowed aggregation with watermarks (late-data bound)
- session windows (gap-based) on event time
- ``foreach_batch_pipeline``: run any batch DataFrame transform per
  micro-batch — how the orchestrator's pipelines attach to a stream
- a custom stateful operator (running per-key de-dup / counter) via
  ``applyInPandasWithState`` — the extension surface for semantics the
  built-in operators can't express

Scale notes: streaming state lives in the state store, partitioned by
the grouping key — the same shuffle-partitioning discipline as batch
aggs applies (skewed keys hurt state stores too). Watermarks bound
state size; without one, a windowed agg's state grows forever at
100 TB/day rates.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 1,
    clean_source: str | None = None,
    archive_dir: str | None = None,
) -> DataFrame:
    """File-source stream of event JSON files.

    ``max_files_per_trigger`` bounds per-cycle work (the reference's
    oldest-first, one-ingest-at-a-time discipline, src/helpers.js:24-25);
    ``clean_source='delete'|'archive'`` is its delete-after-commit."""
    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", False)
    )
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
        if archive_dir:
            reader = reader.option("sourceArchiveDir", archive_dir)
    return reader.json(source_dir)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time counts with a late-data watermark.

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted. Output: (window_start,
    window_end, event_type, n, total_value-free count agg)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (session_window merges events
    closer than ``gap``; state evicted past the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def foreach_batch_pipeline(
    stream: DataFrame,
    transform: Callable[[DataFrame, int], DataFrame],
    sink_dir: str,
    checkpoint_dir: str,
    query_name: str = "pipeline",
):
    """Attach a batch transform to a stream: per micro-batch, apply
    ``transform(batch_df, batch_id)`` and write the result under the
    sink keyed BY BATCH ID. This is the orchestrator's execution model
    as a streaming query.

    Exactly-once (self-review r4): foreachBatch is at-least-once — a
    crash between the sink write and the checkpoint commit REPLAYS the
    batch, so a blind ``mode("append")`` duplicated every row of the
    replayed batch. The write is made idempotent by landing each batch
    in its own hive partition dir (``batch_id=N``) with overwrite: the
    replay rewrites the same directory instead of appending a second
    copy. Readers see the sink as one partitioned parquet table (with a
    ``batch_id`` partition column). Migration note: a sink written by
    the pre-r4 FLAT append layout cannot be resumed in place — mixed
    depths break partition discovery; compact the old files into a
    ``batch_id=-1`` subdir first (no live deployment predates this)."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df, batch_id)
        if out is not None:
            out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def stream_dedup_events(
    events: DataFrame, watermark: str = "2 hours", keys: list[str] | None = None
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the same key within the
    watermark horizon (``dropDuplicatesWithinWatermark``). State holds
    one entry per key seen inside the horizon and is EVICTED as the
    watermark advances — the unbounded-state trap of a plain streaming
    dropDuplicates, solved; this is batch exact-dedup's streaming twin
    (at-least-once sources → effectively-once events)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks within the preceding ``within`` window.

    Both sides carry watermarks + the join carries a time-range
    condition — that pair is what lets Spark BOUND the join state (each
    side's buffered rows are evicted once the other side's watermark
    passes the interval). An unconstrained stream-stream join would
    buffer forever at 100 TB/day."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("p_user").alias("user_id"), "click_id", "purchase_id", "click_ts", "purchase_ts"
    )


# ---- custom stateful operator: first-seen de-dup with running counts ----

DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])
DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("new_events", LongType()),
        StructField("total_seen", LongType()),
    ]
)


def _dedup_count_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per user_id: count arriving events, carry the lifetime total in
    state. Module-level (not a closure) so cloudpickle serializes it by
    reference to the shipped package zip (see session._ship_package)."""
    n = 0
    for pdf in batches:
        n += len(pdf)
    seen = state.get[0] if state.exists else 0
    state.update((seen + n,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "new_events": [n], "total_seen": [seen + n]}
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Running per-user event totals across micro-batches — the
    ``applyInPandasWithState`` extension point (SURVEY.md §2b): Arrow-
    batched, state-store-backed, keyed by the shuffle partitioning."""
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_count_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_against_corpus(
    new_docs_stream: DataFrame,
    corpus_docs: DataFrame | None,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    query_name: str = "stream-dedup",
    index=None,
    **minhash_kwargs,
):
    """Continuous delta-vs-corpus near-dup detection: each micro-batch
    of arriving documents is MinHash-joined against the STANDING corpus
    and the surviving pairs land under ``sink_dir`` — the streaming
    face of the r8 incremental-dedup operator, composed through the
    same foreach_batch_pipeline idempotency discipline (one hive
    partition dir per batch id, overwrite, so an at-least-once replay
    rewrites rather than duplicates).

    Two corpus modes (exactly one of ``corpus_docs`` / ``index``):

    - ``corpus_docs`` (raw documents): corpus signatures recomputed per
      batch via minhash_incremental_near_duplicates — fine for small
      standing corpora and tests.
    - ``index`` (a ``CorpusMinhashIndex`` from
      operators/minhash_index.read_corpus_minhash_index — r9, VERDICT
      r08 #6): the production shape. Each micro-batch pays only its own
      signatures plus two joins landing on the persisted tables' bucket
      distribution; the corpus is never re-shingled, batch after batch.
      Banding constants come FROM the artifact, so ``minhash_kwargs``
      banding knobs are rejected to prevent silent disagreement.

    The batch function must re-enter the DataFrame API from a
    foreachBatch callback, which both operators support (pure batch
    DataFrames in, DataFrame out)."""
    if (corpus_docs is None) == (index is None):
        raise ValueError("pass exactly one of corpus_docs or index")
    if index is not None:
        banding_knobs = {
            "shingle_len",
            "num_hashes",
            "bands",
            "hash_family",
            "max_bucket",  # baked into the pre-aggregated buckets (r9)
        }
        bad = banding_knobs & set(minhash_kwargs)
        if bad:
            raise ValueError(
                f"banding knobs {sorted(bad)} come from the index's table "
                "properties; rebuild the index to change them"
            )
        from poormans_kube_etl_spark.operators.minhash_index import (
            minhash_incremental_near_duplicates_indexed,
        )

        if (index.constants["id_col"], index.constants["text_col"]) != (
            id_col,
            text_col,
        ):
            raise ValueError(
                f"index was built over ({index.constants['id_col']}, "
                f"{index.constants['text_col']}), stream is configured for "
                f"({id_col}, {text_col})"
            )

        def dedup_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
            return minhash_incremental_near_duplicates_indexed(
                batch_df.select(id_col, text_col),
                index,
                threshold=threshold,
                **minhash_kwargs,
            )

    else:
        from poormans_kube_etl_spark.operators.minhash import (
            minhash_incremental_near_duplicates,
        )

        def dedup_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
            return minhash_incremental_near_duplicates(
                batch_df.select(id_col, text_col),
                corpus_docs,
                id_col,
                text_col,
                threshold=threshold,
                **minhash_kwargs,
            )

    return foreach_batch_pipeline(
        new_docs_stream, dedup_batch, sink_dir, checkpoint_dir, query_name
    )


def stream_substring_screen(
    new_docs_stream: DataFrame,
    corpus_docs: DataFrame | None,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    query_name: str = "stream-substring-screen",
    index=None,
):
    """Continuous substring decontamination: each micro-batch of
    arriving documents is screened for token runs >= k that appear
    verbatim in the STANDING corpus, and the offending spans land under
    ``sink_dir`` per batch id (idempotent under replay, same
    foreach_batch_pipeline discipline as the MinHash stream face) — an
    ingest gate that quarantines lifted passages BEFORE a shard enters
    the corpus.

    Two corpus modes (exactly one of ``corpus_docs`` / ``index``):

    - ``corpus_docs`` (raw documents): corpus grams recomputed per
      batch — fine for small standing corpora and tests.
    - ``index`` (a ``CorpusGramIndex`` from
      operators/substring.read_corpus_gram_index): the production
      shape. Each micro-batch pays only its own tokenize+hash plus one
      membership probe landing on the gram table's bucket distribution;
      the corpus is never re-tokenized, batch after batch (2.5x the
      live face at sf1, SCALING.md). The gram width comes FROM the
      artifact, so a caller-supplied ``k`` that disagrees is rejected
      instead of silently screening at the wrong granularity.
    """
    from poormans_kube_etl_spark.operators.substring import (
        merge_islands,
        positional_kgrams,
        substring_spans_indexed,
    )

    if (corpus_docs is None) == (index is None):
        raise ValueError("pass exactly one of corpus_docs or index")
    if index is not None:
        c = index.constants
        if (c["id_col"], c["text_col"]) != (id_col, text_col):
            raise ValueError(
                f"index was built over ({c['id_col']}, {c['text_col']}), "
                f"stream is configured for ({id_col}, {text_col})"
            )
        if k != index.k:
            raise ValueError(
                f"k={k} disagrees with the artifact's k={index.k}; the gram "
                "width is baked into the index — rebuild it to change k"
            )

        def screen_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
            return substring_spans_indexed(
                batch_df.select(id_col, text_col), index
            )

    else:
        corpus_grams = (
            positional_kgrams(corpus_docs, k, id_col, text_col)
            .select("g")
            .distinct()
        )

        def screen_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
            hits = (
                positional_kgrams(
                    batch_df.select(id_col, text_col), k, id_col, text_col
                )
                .join(corpus_grams, "g")
                .select(id_col, "s", (F.col("s") + k).alias("e"))
            )
            return merge_islands(hits, id_col)

    return foreach_batch_pipeline(
        new_docs_stream, screen_batch, sink_dir, checkpoint_dir, query_name
    )


def stream_bm25_screen(
    new_docs_stream: DataFrame,
    index,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 5.0,
    k1: float = 1.2,
    b: float = 0.75,
    query_name: str = "stream-bm25-screen",
):
    """Retrieval-based contamination screen: each micro-batch of
    arriving documents plays the QUERY role against a persisted BM25
    postings index of a reference corpus (an eval benchmark, a
    blocklist, yesterday's shard), and every doc whose best match
    scores >= threshold lands under ``sink_dir`` with the matched
    reference id — the lexical-overlap ingest gate that complements
    the exact-substring screen (stream_substring_screen catches
    verbatim lifts; this face catches paraphrase-adjacent
    high-overlap text that shares vocabulary without sharing k-gram
    runs). Same foreach_batch_pipeline idempotency discipline as the
    other screens (one hive partition dir per batch id, overwrite).

    ``index`` is a ``CorpusBM25Index``
    (operators/retrieval_index.read_corpus_bm25_index): each batch pays
    one broadcast probe of the bucketed postings scan — the reference
    corpus is never re-tokenized, batch after batch. The batch side is
    broadcast (micro-batches are bounded by the trigger, the documented
    small-by-construction class). Scoring constants k1/b are query-time
    here, NOT artifact properties — the same index serves any
    calibration, so no knob-disagreement guard is needed."""
    from poormans_kube_etl_spark.operators.retrieval_index import bm25_topk_indexed

    def screen_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        q = batch_df.select(
            F.col(id_col).alias("query_id"), F.col(text_col).alias("qtext")
        )
        top = bm25_topk_indexed(q, index, 1, k1=k1, b=b)
        return top.where(F.col("sim") >= threshold).select(
            F.col("query_id").alias(id_col),
            F.col("nn_id").alias("matched_id"),
            F.col("sim").alias("score"),
        )

    return foreach_batch_pipeline(
        new_docs_stream, screen_batch, sink_dir, checkpoint_dir, query_name
    )


def stream_exact_screen(
    new_docs_stream: DataFrame,
    index,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "stream-exact-screen",
):
    """Exact-duplicate ingest gate — the CHEAPEST screen, and the one
    every pipeline runs first: each micro-batch of arriving documents
    probes the persisted keeper-resolved fingerprint index
    (operators/exact_index.read_corpus_fp_index), and every doc whose
    normalized text already exists in the corpus lands under
    ``sink_dir`` with its canonical keeper id. Verbatim re-uploads die
    here for the cost of one md5 per doc and one fp-keyed join landing
    on the stored bucket distribution; the near-dup screens
    (stream_dedup_against_corpus, stream_substring_screen,
    stream_bm25_screen) only ever see what survives. Same
    foreach_batch_pipeline idempotency discipline as the sibling
    screens (one hive partition dir per batch id, overwrite)."""
    from poormans_kube_etl_spark.operators.exact_index import (
        exact_duplicates_indexed,
    )

    def screen_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        renamed = batch_df.select(
            F.col(id_col).alias(index.constants["id_col"]),
            F.col(text_col).alias(index.constants["text_col"]),
        )
        return exact_duplicates_indexed(renamed, index).select(
            F.col("doc").alias(id_col), "keeper"
        )

    return foreach_batch_pipeline(
        new_docs_stream, screen_batch, sink_dir, checkpoint_dir, query_name
    )
