"""interval_join: bucketed equi-join construction — semantics + plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.ranges import interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_interval_join_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),  # inside iv A
            (2, "u", _ts("2024-01-01 11:59:59")),  # inside A (boundary-ish)
            (3, "u", _ts("2024-01-01 13:00:00")),  # outside all
            (4, "u", _ts("2024-01-02 00:00:00")),  # == start of B (inclusive)
            (5, "v", _ts("2024-01-01 10:00:00")),  # other key: no intervals
        ],
        "event_id long, user_id string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            ("A", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            ("B", "u", _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
        ],
        "iv_id string, user_id string, start timestamp, end timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, by="user_id").collect()
    )
    assert got == [(1, "A"), (2, "A"), (4, "B")]


def test_interval_join_plan_is_equi_not_nested_loop(spark):
    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.lit("u").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
    )
    iv = ev.select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    out = interval_join(ev, iv, by="user_id")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
