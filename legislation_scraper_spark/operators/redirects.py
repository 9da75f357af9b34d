"""Redirect-chain resolution over the crawl's HTTP 3xx edges.

The reference follows redirects implicitly inside ``requests``
(``/root/reference/src/scraper/base/scraper.py`` relies on
``requests.get`` default ``allow_redirects=True``), one URL at a time.
A web-scale frontier instead accumulates the 3xx hops as an edge table
(src_url → location) and must resolve every source to its terminal URL
in bulk — the canonical-URL of record for dedup, the URL-seen set, and
politeness accounting all key on the terminal, not the alias.

Scale notes:
- **Pointer doubling, not step-by-step walking.**  Each round joins the
  mapping with itself (``f := f ∘ f``), so a chain of length ``L``
  resolves in ``ceil(log2 L)`` self-joins instead of ``L`` sequential
  ones — the same O(log n) discipline as dedup's large-star/small-star
  components.  Real redirect chains are short (browsers cap at ~20),
  so ``max_hops=32`` means 5 shuffle rounds, each a plain equi-join on
  a URL key.
- **Cycles terminate by construction.**  A redirect loop never reaches
  a terminal node; its hop counter doubles every round and the row is
  reported with ``resolved = false`` once the rounds are exhausted —
  no driver-side convergence check, no unbounded iteration.
- **Lineage is cut every round** (``localCheckpoint``) because the
  self-join doubles the logical plan per round — 5 rounds would
  otherwise embed 2^5 copies of the scan.
- ``max_hops`` must be a power of two so the doubled Spark walk and a
  step-capped sequential oracle land on the SAME node for cyclic rows
  (after exactly ``max_hops`` steps both report the same ``cur``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve each redirect source to its terminal URL.

    Input: a FUNCTIONAL edge list (each ``src`` appears once — a URL
    redirects to exactly one location; callers dedup upstream).

    Output: one row per input source —
    ``(src, final_url, hops, resolved)`` where ``hops`` is the exact
    chain length for resolved rows and exactly ``max_hops`` for
    unresolved ones (loops or over-long chains), and ``resolved`` is
    true iff ``final_url`` has no outgoing redirect within
    ``max_hops`` steps.

    ``checkpoint=False`` keeps the full lineage (plan-shape tests).
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    f = e.select(
        "src",
        F.col("dst").alias("cur"),
        F.lit(1).cast("int").alias("hops"),
    )
    # f maps src -> (node 2^r steps away, saturating at the terminal).
    # One round: follow cur through the CURRENT mapping, doubling the
    # stride; rows whose cur is already terminal find no match and pass
    # through unchanged (hence "saturating").
    for _ in range(int(math.log2(max_hops))):
        g = f.select(
            F.col("src").alias("g_src"),
            F.col("cur").alias("g_cur"),
            F.col("hops").alias("g_hops"),
        )
        f = (
            f.join(g, f["cur"] == g["g_src"], "left")
            .select(
                "src",
                F.coalesce("g_cur", "cur").alias("cur"),
                (
                    F.col("hops") + F.coalesce("g_hops", F.lit(0))
                ).cast("int").alias("hops"),
            )
        )
        if checkpoint:
            f = f.localCheckpoint(eager=False)
    has_out = e.select(F.col("src").alias("cur")).distinct().withColumn(
        "_out", F.lit(True)
    )
    return (
        f.join(has_out, "cur", "left")
        .select(
            "src",
            F.col("cur").alias("final_url"),
            "hops",
            (F.col("_out").isNull() & (F.col("hops") <= max_hops)).alias(
                "resolved"
            ),
        )
    )
