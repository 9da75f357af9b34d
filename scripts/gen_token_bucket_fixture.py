#!/usr/bin/env python
"""Generate the token_bucket_admission oracle fixture.

The per-host token-bucket recurrence is sequential (each admission
depends on every earlier one), so DuckDB cannot express it directly;
like the multimodal fixture, the expected rows are precomputed by an
INDEPENDENT straight-line implementation — the recurrence is re-written
here from the spec, NOT imported from
streaming/politeness_stream.py — and committed as parquet for the
oracle SQL to read (VERDICT r1's fixture pattern, applied to the last
rows-only query).

Spec (must stay in lockstep with __spark_entry__
q_token_bucket_admission):
- input: events table; host = 'host-<user_id%20>.example',
  url = 'http://e/<event_id>', event_ms = epoch millis of ts (UTC)
- per host, events sorted by (event_ms, url): refill
  rate = 1/7200 tokens/s (clamped at burst=2.0, starting full),
  admit iff tokens >= 1 (then spend 1)
- output: host, n_admitted, n_events

Usage: python scripts/gen_token_bucket_fixture.py [sf_dir] [out]
"""

from __future__ import annotations

import sys
from collections import defaultdict

import duckdb

RATE_PER_SEC = 1.0 / 7200.0
BURST = 2.0


def expected_rows(sf_dir: str):
    rows = duckdb.sql(
        f"""
        SELECT 'host-' || CAST(user_id % 20 AS VARCHAR) || '.example'
                 AS host,
               'http://e/' || CAST(event_id AS VARCHAR) AS url,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS event_ms
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchall()
    by_host: dict[str, list] = defaultdict(list)
    for host, url, ms in rows:
        by_host[host].append((int(ms), url))
    out = []
    for host, evts in sorted(by_host.items()):
        tokens, last_ms = BURST, None
        n_admitted = 0
        for ms, _url in sorted(evts):
            if last_ms is not None and ms > last_ms:
                tokens = min(
                    BURST, tokens + (ms - last_ms) * RATE_PER_SEC / 1000.0
                )
            last_ms = ms if last_ms is None else max(last_ms, ms)
            if tokens >= 1.0:
                tokens -= 1.0
                n_admitted += 1
        out.append((host, n_admitted, len(evts)))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "fixtures/token_bucket_sf0.01.parquet"
    )
    rows = expected_rows(sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (host VARCHAR, n_admitted BIGINT, n_events BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
