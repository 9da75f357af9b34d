"""Structured Streaming surfaces.

The reference's only streaming-shaped machinery is the queue + daemon
saver thread with graceful drain (/root/reference/src/database/
saver.py:63-87, main.py:367-372).  Two Spark-native equivalents:

1. ``stream_crawl`` — the crawl loop as a Structured Streaming query: a
   rate source ticks micro-batches; ``foreachBatch`` executes one crawl
   round per tick (exactly the incremental-batch round from
   plans/crawl.py — state stays in snapshot tables, NOT in
   mapGroupsWithState, so the job survives restarts via the same
   checkpoints; SURVEY.md §2.9).  The query self-stops when the
   frontier drains.

2. ``windowed_fetch_metrics`` — event-time tumbling-window aggregation
   with a watermark over a streaming source of fetch/visit events (the
   late-data-tolerant version of the reference's per-group count
   prints, federal_legislation/scrape.py:367-369).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.crawl import CrawlEngine


def stream_crawl(
    spark: SparkSession,
    engine: CrawlEngine,
    tick_seconds: int = 1,
    max_rounds: int = 100,
):
    """Run the crawl as a streaming query (one round per micro-batch).

    Returns the (already stopped) StreamingQuery after the frontier
    drains or ``max_rounds`` ticks.
    """
    engine.bootstrap()
    start = engine.resume()
    state = {"round": start, "done": False, "metrics": []}

    def one_round(_batch_df: DataFrame, _batch_id: int) -> None:
        if state["done"] or state["round"] >= start + max_rounds:
            state["done"] = True
            return
        m = engine.round(state["round"])
        state["metrics"].append(m)
        state["round"] += 1
        if m["selected"] == 0:
            state["done"] = True

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.foreachBatch(one_round)
        .trigger(processingTime=f"{tick_seconds} seconds")
        .start()
    )
    import time

    while not state["done"]:
        time.sleep(0.25)
        if q.exception() is not None:
            break
    q.stop()
    q.awaitTermination(30)
    if q.exception() is not None:
        raise q.exception()
    return state["metrics"]


def windowed_fetch_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts over a *streaming* DataFrame.

    Works on any event stream with an event-time column; used for
    crawl-rate dashboards (fetches/errors per host per window) where
    events arrive late from stragglers.
    """
    # event-time must be TIMESTAMP (parquet may surface TIMESTAMP_NTZ)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("val_sum"),
        )
        .select(F.col("w.start").alias("win_start"), key_col, "cnt", "val_sum")
    )
