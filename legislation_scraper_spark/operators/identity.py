"""Fetch-identity rotation — the engine-side twin of the reference's
VPN cycling (completes SURVEY §2 C5 beyond the error-driven cooldown).

The reference reacts to blocked access by cycling to the
least-recently-used VPN configuration and retrying
(/root/reference/src/scraper/state_legislation/parana.py:354-366 —
``_handle_blocked_access`` loops ``_change_vpn_connection`` until
unblocked; /root/reference/src/utils/openvpn.py:766 —
``change_vpn_connection`` pops the LRU config from a rotation queue
seeded in random order).  That is inherently single-process state; the
distributed formulation must give every executor the SAME answer
without a coordination service.

Deterministic restatement (same observable behavior):
- Each host starts at a pseudo-random pool position — md5-derived, so
  hosts spread across identities like ``initial_queue_order="random"``
  but reproducibly.
- Every observed BLOCK event for a host advances it one position
  (mod pool size) — exactly the LRU cycle a single host experiences
  under the reference's queue, since its own rotations are the ones
  that matter to it.
- Identity is then a pure function ``pool[(start(host) + n_blocks(host))
  % len(pool)]`` computable per row anywhere in the cluster, and the
  NEXT round's fetch tasks pick it up from the block log — no shared
  mutable queue, no lock (the engine's share-nothing discipline,
  SURVEY C4).

Plan shape / scale: block counting is one partial-aggregatable count
shuffled on host (bounded by the HOST set, not fetch volume); the
assignment join broadcasts that per-host count table (hosts ≪ URLs;
10^7 hosts × 16 B fits any driver), so the frontier side never
shuffles.  The pool is crawl config — a literal array column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _start_slot(host: Column) -> Column:
    """Engine-neutral pseudo-random pool start: first 3 hex digits of
    md5 (the repo's cross-engine hash convention, operators/sketches.py)."""
    return F.conv(F.substring(F.md5(host), 1, 3), 16, 10).cast("bigint")


def assign_identities(
    frontier: DataFrame,
    block_events: DataFrame,
    pool: list[str],
    host_col: str = "host",
) -> DataFrame:
    """Annotate ``frontier`` rows with (n_blocks, identity): the fetch
    identity each host must use after advancing once per block event.

    ``block_events`` is one row per observed block (host column only is
    read) — typically the fetch log filtered to 403/429/blocked-text
    statuses.  ``pool`` is the identity roster (VPN configs, proxy
    endpoints); empty pools raise.
    """
    if not pool:
        raise ValueError("identity pool must be non-empty")
    n = F.count("*").cast("bigint").alias("n_blocks")
    blocks = block_events.groupBy(F.col(host_col).alias("_bh")).agg(n)
    out = (
        frontier.join(
            F.broadcast(blocks),
            frontier[host_col] == F.col("_bh"),
            "left",
        )
        .drop("_bh")
        .withColumn(
            "n_blocks", F.coalesce("n_blocks", F.lit(0).cast("bigint"))
        )
    )
    idx = (
        (_start_slot(F.col(host_col)) + F.col("n_blocks")) % len(pool)
    ).cast("int")
    return out.withColumn(
        "identity",
        F.element_at(F.array(*[F.lit(p) for p in pool]), idx + 1),
    )
