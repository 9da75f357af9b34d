"""Stream-stream interval join: batch-twin equality + timeout rows."""

from __future__ import annotations

import pyspark.sql.functions as F

from legislation_scraper_spark.streaming.join_stream import (
    match_responses,
    stream_match_responses,
)


def _ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc) \
        + datetime.timedelta(seconds=s)


def test_batch_match_and_timeouts(spark):
    req = spark.createDataFrame(
        [(1, "u1", _ts(0)), (2, "u2", _ts(10)), (3, "u3", _ts(20)),
         (4, "u4", _ts(30))],
        "req_id long, url string, req_ts timestamp",
    )
    resp = spark.createDataFrame(
        [(1, _ts(5), 200),      # in horizon: latency 5000
         (2, _ts(200), 200),    # LATE: outside 60s horizon -> timeout
         (3, _ts(15), 503)],    # before req? no: 15 < 20 -> excluded
        "req_id long, resp_ts timestamp, status int",
    )
    got = {
        r["req_id"]: r
        for r in match_responses(req, resp, horizon="60 seconds").collect()
    }
    assert got[1]["latency_ms"] == 5000 and not got[1]["timed_out"]
    assert got[2]["timed_out"] and got[2]["status"] is None
    # a response BEFORE the request never matches
    assert got[3]["timed_out"]
    assert got[4]["timed_out"]
    assert len(got) == 4


def test_batch_dedupes_duplicate_responses(spark):
    req = spark.createDataFrame(
        [(1, "u1", _ts(0)), (2, "u2", _ts(10))],
        "req_id long, url string, req_ts timestamp",
    )
    resp = spark.createDataFrame(
        [(1, _ts(5), 200),     # earliest in-window -> kept
         (1, _ts(8), 503),     # retry duplicate -> dropped
         (1, _ts(200), 200),   # out of horizon anyway
         (2, _ts(12), 200),
         (2, _ts(12), 301)],   # same ts: tie-break min status -> 200
        "req_id long, resp_ts timestamp, status int",
    )
    out = match_responses(req, resp, horizon="60 seconds").collect()
    assert len(out) == 2  # one row per request despite duplicates
    got = {r["req_id"]: r for r in out}
    assert got[1]["latency_ms"] == 5000 and got[1]["status"] == 200
    assert got[2]["status"] == 200 and got[2]["latency_ms"] == 2000


def test_stream_equals_batch(spark, tmp_path):
    rows_req = [(i, f"u{i}", _ts(i * 10)) for i in range(6)]
    rows_resp = [
        (i, _ts(i * 10 + (5 if i % 2 == 0 else 300)), 200)
        for i in range(6)
    ]
    # sentinels push both watermarks far forward so every pending
    # left-outer NULL flushes
    rows_req.append((99, "sentinel", _ts(10 ** 6)))
    rows_resp.append((99, _ts(10 ** 6), 200))
    rs = "req_id long, url string, req_ts timestamp"
    ps = "req_id long, resp_ts timestamp, status int"
    breq = spark.createDataFrame(rows_req, rs)
    bresp = spark.createDataFrame(rows_resp, ps)
    expect = {
        (r["req_id"], r["status"], r["latency_ms"], r["timed_out"])
        for r in match_responses(breq, bresp, horizon="60 seconds")
        .collect()
        if r["req_id"] != 99
    }
    # evens matched (latency 5000), odds timed out (late by 300s)
    assert (0, 200, 5000, False) in expect
    assert (1, None, None, True) in expect

    sreq_dir, sresp_dir = tmp_path / "req", tmp_path / "resp"
    breq.coalesce(1).write.json(str(sreq_dir))
    bresp.coalesce(1).write.json(str(sresp_dir))
    sreq = spark.readStream.schema(rs).json(str(sreq_dir))
    sresp = spark.readStream.schema(ps).json(str(sresp_dir))
    q = (
        stream_match_responses(
            sreq, sresp, horizon="60 seconds", watermark="5 minutes"
        )
        .writeStream.format("memory")
        .queryName("rr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["req_id"], r["status"], r["latency_ms"], r["timed_out"])
        for r in spark.sql("SELECT * FROM rr_out").collect()
        if r["req_id"] != 99
    }
    assert got == expect
