"""Native session_window sessionization: batch semantics (boundary
rule, merge) and streaming twin == batch on closed sessions."""

from __future__ import annotations

import datetime as dt

from legislation_scraper_spark.streaming.session_stream import (
    sessionize,
    stream_sessionize,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def test_batch_sessions_merge_and_boundary(spark):
    rows = [
        # user 1: two events 10 min apart -> one session
        (1, _mk(0)), (1, _mk(600)),
        # exactly 30 min after the last -> still the SAME session
        # (Spark merges inclusively at the window end)
        (1, _mk(600 + 1800)),
        # 30 min + 1 s after that -> NEW session
        (1, _mk(600 + 1800 + 1801)),
        # user 2: a single event, then 29:59 later -> same session
        (2, _mk(100)),
        (2, _mk(100 + 1799)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df).collect()
    }
    assert got == {
        (1, _mk(0), _mk(2400 + 1800), 3),
        (1, _mk(4201), _mk(4201 + 1800), 1),
        (2, _mk(100), _mk(1899 + 1800), 2),
    }


def test_stream_emits_closed_sessions_equal_to_batch(spark, tmp_path):
    rows = [
        (1, _mk(0)), (1, _mk(60)),
        (2, _mk(10)),
        (1, _mk(5000)),  # second session for user 1
        # sentinel far in the future: pushes the watermark past every
        # other session's end so they all CLOSE and emit in append mode
        (99, _mk(10 ** 6)),
    ]
    schema = "user_id long, ts timestamp"
    batch = spark.createDataFrame(rows, schema)
    expect = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch).collect()
        if r["key"] != 99
    }
    assert len(expect) == 3

    src = tmp_path / "src"
    batch.coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        stream_sessionize(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("session_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    # the sentinel's own session is still open (watermark never passes
    # it); every closed session must match the batch result exactly
    assert got == expect
