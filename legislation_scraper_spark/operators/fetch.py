"""Fetch operator: retry/backoff policy over an Arrow-batched executor.

The reference fetches with requests + 5 retries + 5 s backoff sleeps and
error-text sniffing (/root/reference/src/scraper/base/scraper.py:203-257,
retry decorator 37-56).  In this engine the fetch stage is a
``mapInPandas`` over salt-repartitioned batches: each executor task
"fetches" its batch, applying the retry policy per URL.

In the sandbox there is no network: the "web" is the ``pages_raw``
table, so resolution is a distributed **left join on canonical URL**
(the join IS the network), and the transport layer — status codes,
transient 503s, permanent failures, retry accounting — is simulated
deterministically from the URL hash so that retry/backoff/error-routing
code paths are really exercised:

- ``md5_64(url) % 20 == 0``  → one transient 503, succeeds on retry 2
- ``md5_64(url) % 97 == 3``  → permanent 503 (retries exhausted)
- URL absent from pages_raw  → 404 (permanent)

(md5-derived so the straight-line Python simulator used by the
crawl-ordering parity test can reproduce outcomes bit-for-bit.)

On a real cluster the simulate step is replaced by an HTTP client in
the same mapInPandas (per-task connection/session reuse mirrors
use_requests_session, base/scraper.py:129-132); everything upstream
(politeness, salting) and downstream (error routing, metrics) is
unchanged.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FetchPolicy:
    max_retries: int = 5
    base_delay_s: float = 0.0  # exp backoff base; 0 disables sleeping
    transient_mod: int = 20
    permanent_mod: int = 97


def md5_64(url: str) -> int:
    """64-bit transport-simulation key (Python-reproducible)."""
    return int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "big")


def resolve_against_web(selected: DataFrame, pages_raw: DataFrame) -> DataFrame:
    """Left join the scheduled URLs to the sandbox web on canonical URL."""
    web = pages_raw.select(
        F.col("url").alias("canon_url"),
        F.col("html").alias("body"),
        F.col("warc_ts"),
    )
    return selected.join(web, "canon_url", "left")


_FETCH_EXTRA = (
    "status int, attempts int, fetched boolean, fetch_error string"
)


def simulate_transport(resolved: DataFrame, policy: FetchPolicy) -> DataFrame:
    """Apply the retry/backoff policy per URL (vectorized batches)."""
    p = policy

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            h = np.fromiter(
                (md5_64(u) for u in pdf["canon_url"]), dtype=np.uint64, count=n
            )
            has_body = pdf["body"].notna().to_numpy()
            transient = (h % np.uint64(p.transient_mod) == 0) & has_body
            permanent = (h % np.uint64(p.permanent_mod) == 3) & has_body
            status = np.where(has_body, 200, 404)
            attempts = np.ones(n, dtype=np.int32)
            fetched = has_body.copy()
            # transient: one 503 then success on attempt 2
            attempts[transient & ~permanent] = 2
            if p.base_delay_s > 0 and (transient & ~permanent).any():
                time.sleep(p.base_delay_s)
            # permanent 503: retries exhausted
            status[permanent] = 503
            attempts[permanent] = p.max_retries
            fetched[permanent] = False
            err = np.where(
                fetched,
                None,
                np.where(
                    has_body,
                    "503 server error (retries exhausted)",
                    "404 not found",
                ),
            )
            out = pdf.copy()
            out["status"] = status.astype("int32")
            out["attempts"] = attempts
            out["fetched"] = fetched
            out["fetch_error"] = err
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in resolved.schema.fields
    ) + ", " + _FETCH_EXTRA
    return resolved.mapInPandas(run, schema=schema)


def fetch(
    selected: DataFrame, pages_raw: DataFrame, policy: FetchPolicy | None = None
) -> DataFrame:
    """Full fetch stage: resolve → transport policy.  Returns rows with
    body/status/attempts/fetched/fetch_error."""
    return simulate_transport(
        resolve_against_web(selected, pages_raw), policy or FetchPolicy()
    )
