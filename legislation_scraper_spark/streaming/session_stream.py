"""Gap-based sessionization with the NATIVE session_window operator
(SURVEY.md §2.9 + the training-data extensions).

Crawl and user-event streams both need activity sessions (a burst of
fetches from one host, a browsing session of one user) delimited by an
inactivity gap.  The window+lag formulation (``q_sessionize_gap``)
works in batch but shuffles every event into a per-key sort; Spark's
``F.session_window`` is the purpose-built operator — Catalyst's
SessionWindow node assigns and MERGES gap-windows inside the
aggregation itself, and the same expression runs unchanged in batch
and in Structured Streaming (where the watermark evicts closed
sessions from the state store — bounded state at any stream length).

Scale notes:
- Batch plan: ONE hash-partitioned exchange on the session key +
  a per-partition sort for window merge — no per-row lag window, no
  second shuffle for re-aggregation by session id.
- Streaming plan: state is keyed by (key, merged window); the
  watermark closes sessions whose end precedes the horizon, so a key
  that never goes quiet cannot pin unbounded state (its window closes
  every time the gap elapses).
- Session end follows Spark's semantics: ``last event + gap`` — the
  oracle and the batch twin reproduce that convention exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key gap sessions via native session_window — works on both
    batch and streaming DataFrames.  Output: one row per session
    ``(key, session_start, session_end, n_events)`` with
    ``session_end = last event ts + gap``."""
    return (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "key",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin: identical session_window aggregation behind a
    watermark, so closed sessions emit in append mode and their state
    is evicted."""
    return sessionize(
        stream.withWatermark(ts_col, watermark),
        key_col=key_col,
        ts_col=ts_col,
        gap=gap,
    )
