"""asof_join operator: union-and-carry construction vs hand oracle."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right → null
            (2, "u1", _ts("2024-01-02 00:00:00")),  # equal ts → sees it (>=)
            (3, "u1", _ts("2024-01-05 00:00:00")),  # carries latest (Jan 4)
            (4, "u2", _ts("2024-01-03 00:00:00")),  # other key isolated
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-02 00:00:00"), 10.0),
            ("u1", _ts("2024-01-04 00:00:00"), 40.0),
            ("u2", _ts("2024-01-01 00:00:00"), 7.0),
        ],
        "user_id string, ts timestamp, pval double",
    )
    got = {
        r["event_id"]: r["asof_pval"]
        for r in asof_join(left, right, by="user_id").collect()
    }
    assert got == {1: None, 2: 10.0, 3: 40.0, 4: 7.0}


def test_asof_join_plan_single_shuffle_no_join(spark):
    """One shuffle on the key, no join operator (union-and-carry)."""
    left = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit("u").alias("user_id"),
        F.current_timestamp().alias("ts"),
    )
    right = left.select("user_id", "ts", F.lit(1.0).alias("v"))
    out = asof_join(left, right, by="user_id")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
