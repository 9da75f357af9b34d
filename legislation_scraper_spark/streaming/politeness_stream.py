"""Per-host crawl-delay admission as a custom stateful operator.

The reference serializes requests per host with a driver pool busy-wait
(/root/reference/src/scraper/base/scraper.py:160-171) and fixed
politeness sleeps (parana.py:457-459).  The batch engine enforces the
same budget with a window rank (operators/politeness.py).  This module
is the *streaming* form: a token bucket per host, carried as explicit
operator state, deciding admit/defer per fetch event.

The admission recurrence is sequential per host — each decision depends
on the tokens left by every previous decision — so it is NOT
window-expressible (a window can rank, but cannot model refill-between-
events with clamping).  Hence a custom stateful operator:

- batch form: ``admit_batch`` — ``groupBy(host).applyInPandas`` over
  event-time-sorted events; one pass, state lives only within the group.
- streaming form: ``admit_stream`` — ``groupBy(host).
  applyInPandasWithState``; the bucket (tokens, last event time)
  persists in the state store between micro-batches and survives
  restarts via the streaming checkpoint.

Both share ``_token_bucket_kernel`` so batch == streaming by
construction (asserted by tests/test_streaming_politeness.py).

Scale notes: state per host is two scalars (16 bytes) — 10^7 hosts is
~160 MB across the cluster, partitioned by the groupBy(host) shuffle.
Host skew does not apply: the *state* is per host regardless of event
volume, and event batches stream through the kernel in Arrow chunks.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("event_ms", LongType()),
    ]
)

ADMIT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("event_ms", LongType()),
        StructField("admitted", BooleanType()),
        StructField("tokens_after", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("tokens", DoubleType()), StructField("last_ms", LongType())]
)


def _token_bucket_kernel(
    events: pd.DataFrame,
    tokens: float,
    last_ms: int | None,
    rate_per_sec: float,
    burst: float,
) -> Tuple[pd.DataFrame, float, int | None]:
    """Run the bucket over event-time-sorted events; return decisions
    plus the carried-out state.  Pure function — shared verbatim by the
    batch and streaming operators and by the test oracle."""
    events = events.sort_values(["event_ms", "url"], kind="mergesort")
    admitted, tokens_after = [], []
    for ms in events["event_ms"]:
        ms = int(ms)
        if last_ms is not None and ms > last_ms:
            tokens = min(burst, tokens + (ms - last_ms) * rate_per_sec / 1000.0)
        last_ms = ms if last_ms is None else max(last_ms, ms)
        if tokens >= 1.0:
            tokens -= 1.0
            admitted.append(True)
        else:
            admitted.append(False)
        tokens_after.append(tokens)
    out = events.assign(admitted=admitted, tokens_after=tokens_after)
    return out, tokens, last_ms


def admit_batch(
    events: DataFrame, rate_per_sec: float = 1.0, burst: float = 2.0
) -> DataFrame:
    """Batch token-bucket admission: one pass per host group."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _, _ = _token_bucket_kernel(pdf, burst, None, rate_per_sec, burst)
        return out[[f.name for f in ADMIT_SCHEMA.fields]]

    return events.groupBy("host").applyInPandas(run, schema=ADMIT_SCHEMA)


def admit_stream(
    events: DataFrame, rate_per_sec: float = 1.0, burst: float = 2.0
) -> DataFrame:
    """Streaming token-bucket admission; bucket state persists across
    micro-batches in the state store (restart-safe via checkpoint)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def run(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, last_ms = state.get
        else:
            tokens, last_ms = burst, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        out, tokens, last_ms = _token_bucket_kernel(
            batch, tokens, last_ms, rate_per_sec, burst
        )
        state.update((float(tokens), None if last_ms is None else int(last_ms)))
        yield out[[f.name for f in ADMIT_SCHEMA.fields]]

    return events.groupBy("host").applyInPandasWithState(
        run,
        outputStructType=ADMIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
