"""Streaming exact dedup == batch first-observation twin."""

from __future__ import annotations

import datetime as dt

from legislation_scraper_spark.streaming.dedup_stream import (
    dedup_batch_twin,
    stream_dedup,
)


def _rows():
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    return [
        (0, mk(0), "alpha beta gamma"),
        (1, mk(1), "  ALPHA   beta GAMMA "),  # dup after normalization
        (2, mk(2), "delta"),
        (3, mk(3), "delta"),                   # dup
        (4, mk(4), "epsilon"),
    ]


def test_stream_matches_batch_twin(spark, tmp_path):
    schema = "doc_id long, ts timestamp, text string"
    batch = spark.createDataFrame(_rows(), schema)
    expect = sorted(
        r["doc_id"] for r in dedup_batch_twin(batch).collect()
    )
    assert expect == [0, 2, 4]

    src = tmp_path / "src"
    batch.coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(schema).json(str(src))
    out = stream_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()
    )
    assert got == expect
