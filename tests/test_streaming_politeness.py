"""Stateful per-host token-bucket admission: batch == streaming == oracle.

Covers SURVEY.md §2.9/§2.11 (per-host politeness as an explicitly
stateful operator) — the streaming form must carry bucket state across
micro-batches AND across a query restart from checkpoint.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from legislation_scraper_spark.streaming.politeness_stream import (
    EVENT_SCHEMA,
    _token_bucket_kernel,
    admit_batch,
    admit_stream,
)

RATE, BURST = 1.0, 2.0  # 1 token/s refill, burst of 2


def _events():
    """Two hosts: one hammering (should defer), one slow (all admitted)."""
    rows = []
    for i in range(8):  # fast.example: 4 req/s — bucket must defer most
        rows.append(("fast.example", f"http://fast.example/p{i}", 250 * i))
    for i in range(4):  # slow.example: one per 2 s — never deferred
        rows.append(("slow.example", f"http://slow.example/p{i}", 2000 * i))
    return rows


def _oracle(rows):
    out = {}
    for host in sorted({r[0] for r in rows}):
        pdf = pd.DataFrame(
            [r for r in rows if r[0] == host],
            columns=["host", "url", "event_ms"],
        )
        dec, _, _ = _token_bucket_kernel(pdf, BURST, None, RATE, BURST)
        for _, r in dec.iterrows():
            out[r["url"]] = bool(r["admitted"])
    return out


def test_batch_admission_matches_oracle(spark):
    df = spark.createDataFrame(_events(), schema=EVENT_SCHEMA)
    got = {
        r["url"]: r["admitted"]
        for r in admit_batch(df, RATE, BURST).collect()
    }
    assert got == _oracle(_events())
    # sanity on the shape: slow host all admitted, fast host throttled
    assert all(v for u, v in got.items() if "slow" in u)
    fast = [v for u, v in got.items() if "fast" in u]
    assert sum(fast) < len(fast)


def test_stream_carries_state_across_restart(spark, tmp_path):
    """Split the event log at t=1000ms into two files; run the stream
    twice (availableNow + same checkpoint).  The second run must resume
    the bucket state left by the first, and the union of outputs must
    equal the single-pass batch decisions."""
    rows = _events()
    in_dir, cp_dir = str(tmp_path / "in"), str(tmp_path / "cp")
    os.makedirs(in_dir)

    def write_file(name, batch):
        spark.createDataFrame(batch, schema=EVENT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(in_dir, name))

    batch1 = [r for r in rows if r[2] < 1000]
    batch2 = [r for r in rows if r[2] >= 1000]
    results: dict[str, bool] = {}

    def run_once():
        src = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
        )

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                results[r["url"]] = r["admitted"]

        q = (
            admit_stream(src, RATE, BURST)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_file("b1", batch1)
    run_once()
    n_after_first = len(results)
    assert n_after_first == len(batch1)

    write_file("b2", batch2)
    run_once()
    assert len(results) == len(rows)
    assert results == _oracle(rows)
