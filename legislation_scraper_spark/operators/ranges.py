"""Interval (range) join: events ⋈ intervals with
``start <= ts <= end`` — without a nested-loop join.

Open-source Spark has no range-join strategy: a raw
``l.ts BETWEEN r.start AND r.end`` predicate compiles to
BroadcastNestedLoopJoin (O(|L|·|R|)).  The standard fix (what
Databricks' range-join hint does under the hood) is bucketing:

1. pick a bucket width; map each event to its bucket;
2. explode each interval to every bucket it overlaps;
3. equi-join on (key?, bucket) — hash shuffle, not nested loop;
4. re-check the exact predicate.

Each (event, interval) match is produced exactly once because an
event's bucket is unique.  Bucket width trades shuffle fan-out
(intervals × buckets-covered) against candidate precision; pick it
near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join: event rows × interval rows with
    ``start <= ts <= end`` (and equal ``by`` key when given).
    Output = all event columns + all interval columns.
    """
    b = F.lit(bucket_seconds)
    ev = events.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / b)
    )
    iv = intervals.withColumn(
        "_bs",
        F.floor(F.unix_timestamp(F.col(start_col).cast("timestamp")) / b),
    ).withColumn(
        "_be", F.floor(F.unix_timestamp(F.col(end_col).cast("timestamp")) / b)
    )
    iv = iv.withColumn(
        "_b", F.explode(F.sequence(F.col("_bs"), F.col("_be")))
    ).drop("_bs", "_be")
    keys = ["_b"] + ([by] if by else [])
    joined = ev.join(iv, keys)
    exact = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    return joined.filter(exact).drop("_b")
