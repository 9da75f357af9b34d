"""Rendered-DOM fetch — the engine twin of the reference's Selenium
driver pool (SURVEY.md §2.1 S7 / §2.11 C3).

The reference keeps ONE global Chrome driver guarded by a lock
(maranhao.py:124-161, parana.py:57-80: every thread serializes on
``with lock: driver.get(...)``) — a concurrency bottleneck the engine
replaces with share-nothing task-local drivers: ``mapInPandas`` calls
``driver_factory()`` ONCE per task, reuses that driver for every row
the task streams, and closes it on exhaustion.  On a 1000-executor
cluster that is one headless browser per task slot with zero
cross-task coordination — the driver "pool" is the scheduler itself.

No browser ships in this container, so the default factory is a
deterministic STUB (same policy as operators/multimodal.py codecs):
``render(url, body)`` returns the body with a ``<!-- rendered:… -->``
marker derived from the content md5, standing in for executed-JS DOM
mutations.  The Spark-side plumbing — factory lifecycle, per-task
reuse, batch streaming, typed output — is real and tested
(tests/test_render.py asserts exactly one factory call per task)."""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


class StubDriver:
    """Deterministic rendered-DOM stand-in (no JS engine in sandbox)."""

    def render(self, url: str, body: bytes | None) -> str:
        raw = body or b""
        tag = hashlib.md5(raw).hexdigest()[:8]
        return (raw.decode("utf-8", "replace")
                + f"<!-- rendered:{tag} -->")

    def close(self) -> None:  # matches the selenium Driver surface
        pass


def rendered_fetch(
    df: DataFrame,
    driver_factory: Callable[[], object] | None = None,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Render each (url, body) row's DOM with a task-local driver.

    Output = input columns + ``rendered string``.  ``driver_factory``
    runs once per task (NOT per row, NOT per batch) — the semantics a
    real deployment needs for browser startup cost amortization.
    """
    factory = driver_factory or StubDriver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        driver = None
        try:
            for pdf in batches:
                if driver is None:  # lazy: empty tasks never start one
                    driver = factory()
                out = pdf.copy()
                out["rendered"] = [
                    driver.render(u, None if b is None else bytes(b))
                    for u, b in zip(pdf[url_col], pdf[body_col])
                ]
                yield out
        finally:
            if driver is not None:
                driver.close()

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", rendered string"
    return df.mapInPandas(run, schema)
