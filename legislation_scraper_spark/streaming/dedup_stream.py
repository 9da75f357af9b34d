"""Streaming exact dedup — the ingest-time twin of the batch dedup
ladder (SURVEY.md §2.9 + the training-data extensions).

A webtext ingest stream (WARC records, fetched pages) must drop
already-seen documents *online*, not in a nightly batch.  Spark's
native operator is ``dropDuplicatesWithinWatermark``: state is keyed
by the dedup column, and the watermark BOUNDS the state store — a key
older than the watermark horizon is evicted, which is exactly the
crawl's recrawl-window semantics (a page re-fetched after the horizon
is a new observation, not a duplicate).

Scale notes:
- State is hash-partitioned by fingerprint across executors (RocksDB
  state store in production conf) — the streaming analogue of the
  batch ``groupBy(fingerprint)`` exchange; no driver state.
- The fingerprint is computed BEFORE the stateful operator (md5 of the
  normalized text, same kernel as functions/text.fingerprint), so the
  state value is 16 bytes per key, never the document body.
- Batch/stream parity: ``dedup_batch_twin`` applies the identical
  first-observation-wins rule with a window; the streaming run over
  the same rows (single batch, in-order) must select the same
  survivors (tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the normalized-text md5 fingerprint (shared kernel with
    the batch exact dedup — functions/text.fingerprint)."""
    return df.withColumn("fp", fingerprint(F.col(text_col)))


def stream_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate documents within the watermark horizon.

    ``stream`` is a streaming DataFrame with an event-time column;
    duplicates = equal content fingerprint.  State per key is evicted
    once the watermark passes it (bounded state at any corpus size).
    """
    return (
        with_fingerprint(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def dedup_batch_twin(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch twin: first observation (by event time, id tiebreak) of
    each fingerprint survives — the semantics the streaming operator
    applies when rows arrive in event-time order."""
    w = Window.partitionBy("fp").orderBy(F.col(ts_col), F.col(id_col))
    return (
        with_fingerprint(df, text_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
