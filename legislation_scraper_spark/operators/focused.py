"""Focused (topical) crawl ordering — Shark-Search (Hersovici,
Jacovi, Maarek, Pelleg, Shtalhaim, Ur: "The shark-search algorithm —
an application: tailored Web site mapping", WWW'98).

A general crawl ranks the frontier by authority (OPIC/PageRank/
TrustRank — `operators/graph.py`); a FOCUSED crawl building a topical
corpus (the LLM-data shape: "crawl everything about X") must instead
predict, before fetching, how relevant an UNSEEN url is to the topic.
Shark-Search is the classic published answer: a child URL's *potential
score* blends the parent's topical relevance (decayed — fish-search's
"energy" made continuous) with local evidence from the link itself
(anchor text relevance, and the anchor's surrounding context).

The reference scraper needs nothing like this (its URL space is
enumerated per site), but its *selector* — only legislation pages are
kept — is exactly the relevance oracle a focused crawl would feed
back: the loop is score frontier → fetch best → classify fetched
(`operators/classifier.py`) → rescore children.

This module is the batch twin of one frontier-expansion step; the
`CrawlEngine` consumes the output as a `priority` column the
politeness rank already orders by.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def shark_scores(
    parents: DataFrame,
    links: DataFrame,
    gamma: float = 0.5,
    delta: float = 0.5,
    beta: float = 0.75,
    ndigits: int = 6,
) -> DataFrame:
    """One Shark-Search frontier-expansion step.

    ``parents``: ``(url, relevance, inherited)`` — the parent page's
    measured topical relevance in [0, 1] (its similarity to the query/
    topic; 0 = irrelevant) and the inherited score it carried when it
    was itself frontier.  ``links``: ``(src, dst, anchor_rel,
    context_rel)`` — per-link relevance of the anchor text and of the
    anchor's surrounding context.

    Paper semantics, per link:

    - child inherited = ``delta * relevance(parent)`` if the parent
      proved relevant, else ``delta * inherited(parent)`` (decay
      through irrelevant pages — fish-search killed the branch
      outright; the continuous decay is Shark-Search's contribution);
    - neighborhood = ``beta * anchor_rel + (1-beta) * context'`` where
      ``context'`` is 1 when the anchor itself matched (a relevant
      anchor certifies its context), else ``context_rel``;
    - potential = ``gamma * inherited_child + (1-gamma) * neighborhood``.

    A url discovered via several links keeps its BEST evidence (max
    potential — the paper's frontier replace-if-higher rule) plus the
    count of recommending parents.

    Plan: ONE src-keyed equi-join (links ⋈ parents) + ONE dst-keyed
    agg; both partial-aggregatable/AQE-skew-splittable.  All scoring
    is in-row codegen.  Returns ``(url, potential, n_parents)``.

    Default weights are dyadic rationals (0.5/0.5/0.75) so every
    constant — including ``1 - beta`` — is an exact double and the
    cross-engine oracle gets bit parity, not just 6dp closeness.
    """
    p = parents.select(
        F.col("url").alias("src"),
        F.col("relevance").cast("double").alias("rel"),
        F.col("inherited").cast("double").alias("inh"),
    )
    l = links.select(
        "src",
        "dst",
        F.col("anchor_rel").cast("double").alias("arel"),
        F.col("context_rel").cast("double").alias("crel"),
    )
    child_inh = F.lit(delta) * F.when(
        F.col("rel") > 0, F.col("rel")
    ).otherwise(F.col("inh"))
    ctx = F.when(F.col("arel") > 0, F.lit(1.0)).otherwise(F.col("crel"))
    neigh = F.lit(beta) * F.col("arel") + F.lit(1.0 - beta) * ctx
    potential = F.lit(gamma) * child_inh + F.lit(1.0 - gamma) * neigh
    return (
        l.join(p, "src")
        .select("dst", potential.alias("pot"))
        .groupBy(F.col("dst").alias("url"))
        .agg(
            F.round(F.max("pot"), ndigits).alias("potential"),
            F.count("*").cast("bigint").alias("n_parents"),
        )
    )
