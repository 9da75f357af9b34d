"""Link-graph analytics over the crawl's extracted edges.

The reference keeps no link graph (each site scraper enumerates its own
search pages), but a web-scale crawl's frontier prioritization and spam
filtering live on exactly these primitives: per-host degree counts and
a PageRank-style authority score over the host graph.  Both are
first-class, oracle-checked operators here.

Scale notes:
- ``degrees`` is two partial-aggregatable counts + one outer join on
  the node id — the minimal shuffle for the answer.
- ``pagerank`` is the classic iterate-as-joins formulation: each
  iteration shuffles ``(dst, contribution)`` pairs once and joins the
  rank vector back to the node list.  The edge list is augmented with
  out-degree ONCE up front (so no per-iteration degree join) and cached;
  ranks are ``localCheckpoint``-ed every iteration to cut the growing
  lineage (same discipline as dedup.connected_components).  Dangling
  nodes (no out-edges) keep the plain ``(1-d)/N`` base — their mass is
  NOT redistributed; the fixed-iteration oracle mirrors that choice
  exactly.
- Float determinism: double sums are order-dependent across engines, so
  query-level parity rounds to 6dp (same convention as every other
  floating aggregate in __spark_entry__).
- ``anchor_texts`` is the web-corpus anchor-harvest: two
  partial-aggregatable shuffles and a map-side-limited window — the
  per-target top-k never materializes a popular page's full anchor set
  on one task (WindowGroupLimit pushes ``rank <= k`` below the sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node (out_deg, in_deg) over a directed edge list; nodes with
    only one side present get 0 for the other."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
        )
    )


def anchor_texts(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """Top-``k`` anchor texts per link target — the classic web-corpus
    enrichment signal (anchor text describes the TARGET page; search
    engines and LLM-corpus builders attach it as page metadata).

    Input: one row per extracted link (src, dst, anchor).  Output: one
    row per surviving (dst, anchor) with (dst, anchor, n_links, rnk),
    ``rnk`` 1..k ordered by (count desc, anchor asc) — fully
    deterministic tie-break.

    Plan shape: count per (dst, anchor) is a partial-aggregatable
    hash agg (map-side combine absorbs the duplicate-anchor mass that
    dominates real link graphs — most links to a page carry its title);
    the per-dst top-k is a rank window that Spark ≥3.5 executes as
    WindowGroupLimit (per-partition partial top-k BEFORE the shuffle),
    so a page with 10^7 distinct anchors never collects them on one
    task.  Same discipline as operators/politeness.py's budget rank.
    """
    from pyspark.sql import Window

    counts = (
        edges.groupBy(F.col(dst).alias("dst"), F.col(anchor).alias("anchor"))
        .agg(F.count("*").alias("n_links"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` after ``iters`` synchronous iterations from
    the uniform vector 1/N.  No dangling-mass redistribution (see module
    docstring).  ``checkpoint=False`` keeps the full lineage (used by
    tests that assert the plan shape).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("od"))
    # degree-annotated edges, computed once and reused every iteration
    ew = e.join(out_deg, "src")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        # empty graph (e.g. a quiet crawl round filtered all edges):
        # return the empty (node, rank) frame instead of dividing by 0
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("od")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs-and-authorities) over a
    directed edge list; returns ``(node, auth, hub)``.

    The crawl uses both halves: authority scores rank *targets* for
    frontier priority (complementing PageRank's random-surfer view),
    hub scores flag link-farm *sources* whose outlinks should be
    down-weighted — the classic spam signal PageRank alone misses.

    Semantics: synchronous iterations from the all-ones hub vector;
    each iteration is auth(v) = Σ hub(u) over in-edges then
    hub(u) = Σ auth(v) over out-edges, each half L1-normalized (sum of
    scores = 1) so fixed-iteration results are comparable across graph
    sizes.  Nodes missing a side score 0 on it.

    Plan shape (mirrors ``pagerank``): each half-iteration is ONE
    (node, contribution) aggregation shuffle plus a join back to the
    node list; the L1 normalizer is a 1-row aggregate crossJoin'd as a
    BroadcastNestedLoopJoin (1 row × N — no driver collect, same
    discipline as curation.mixture_weights).  Edges and nodes are
    localCheckpoint-ed once; scores re-checkpoint per iteration to cut
    lineage growth.  Float parity: query level rounds to 6dp (repo
    convention for order-dependent double sums).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    scores = nodes.select(
        "node", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
    )
    for _ in range(iters):
        a_raw = (
            e.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a"))
        )
        if checkpoint:
            # a_raw/h_raw are each consumed twice (normalizer agg + the
            # join back to nodes); checkpointing materializes the
            # half-iteration's shuffle once instead of twice
            a_raw = a_raw.localCheckpoint(eager=False)
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_raw.agg(F.sum("a").alias("ta"))))
            .select(
                "node",
                (F.coalesce("a", F.lit(0.0)) / F.col("ta")).alias("auth"),
            )
        )
        h_raw = (
            e.join(
                auth.select(F.col("node").alias("dst"), "auth"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h"))
        )
        if checkpoint:
            h_raw = h_raw.localCheckpoint(eager=False)
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_raw.agg(F.sum("h").alias("th"))))
            .select(
                "node",
                (F.coalesce("h", F.lit(0.0)) / F.col("th")).alias("hub"),
            )
        )
        scores = auth.join(hub, "node")
        if checkpoint:
            scores = scores.localCheckpoint(eager=False)
    return scores.select("node", "auth", "hub")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration TrustRank (Gyöngyi, Garcia-Molina, Pedersen,
    VLDB'04): PageRank with the teleport vector personalized to a
    hand-vetted seed set instead of uniform — trust flows OUT of the
    seeds along links, so link-farm spam that inflates vanilla PageRank
    scores ~0 here unless a trusted page links toward it.

    For this crawl the seed set IS the reference's hardcoded source
    list (Planalto, Senado, Câmara, state diários — the 23 scraper
    classes under /root/reference/src/scraper/): those hosts are
    trusted by construction, and frontier admission of a NEW host is
    gated on the trust mass reaching it.

    Semantics: ``r_0 = s``; ``r_{t+1}(v) = (1-d)·s(v) + d·Σ_{(u,v)∈E}
    r_t(u)/od(u)`` where ``s`` is uniform over ``seeds ∩ nodes`` and 0
    elsewhere.  Dangling mass is dropped, not redistributed (same
    choice as ``pagerank``; the oracle mirrors it).  An empty
    ``seeds ∩ nodes`` returns all-zero ranks (nothing is trusted).

    Plan shape: identical to ``pagerank`` — degree-annotated edges
    computed once, one (dst, contribution) shuffle per iteration,
    localCheckpoint per iteration.  The seed set is crawl config
    (10^1–10^4 rows) and is broadcast for the semi/left joins; the
    teleport column rides the node list so no per-iteration seed join.
    Two scalar driver actions (node count is not needed here; seed
    count is a 1-row agg) — justified, same as pagerank's ``N``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    seeded = nodes.join(F.broadcast(s), "node", "left_semi")
    ns = seeded.count()
    if ns == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    tn = nodes.join(
        F.broadcast(seeded.withColumn("tele", F.lit(1.0 / ns))),
        "node",
        "left",
    ).select("node", F.coalesce("tele", F.lit(0.0)).alias("tele"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("od"))
    ew = e.join(out_deg, "src")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
        tn = tn.localCheckpoint(eager=False)
    ranks = tn.select("node", F.col("tele").alias("rank"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("od")).alias("c"))
        )
        ranks = (
            tn.join(contrib, tn["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def seed_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Minimum link distance from the trusted seed set (synchronous BFS
    relaxation, ``max_hops`` rounds) — TrustRank's discrete cousin and
    the classic frontier-prioritization signal: a URL five hops from
    every seed is far likelier spam/trap than a seed's direct outlink,
    and crawl schedulers budget by hop tier.

    Returns ``(node, hops)``; nodes unreached within ``max_hops`` carry
    NULL.  Semantics: hops(seed ∩ nodes) = 0; each round relaxes
    ``hops(v) = min(hops(v), min over in-edges hops(u) + 1)``.

    Plan shape: pagerank's loop — one (dst, min) aggregation shuffle
    per round against the cached edge list, localCheckpoint per round
    to cut lineage.  The seed set broadcasts once onto the node list.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    dist = nodes.join(
        F.broadcast(s.withColumn("hops", F.lit(0).cast("bigint"))),
        "node",
        "left",
    )
    if checkpoint:
        e = e.localCheckpoint(eager=False)
        dist = dist.localCheckpoint(eager=False)
    for _ in range(max_hops):
        cand = (
            e.join(
                dist.filter(F.col("hops").isNotNull()).select(
                    F.col("node").alias("src"), "hops"
                ),
                "src",
            )
            .groupBy("dst")
            .agg((F.min("hops") + 1).alias("cand"))
        )
        dist = (
            dist.join(cand, dist["node"] == cand["dst"], "left")
            .select("node", F.least("hops", "cand").alias("hops"))
        )
        if checkpoint:
            dist = dist.localCheckpoint(eager=False)
    return dist


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Relative spam mass per node (Gyöngyi et al., "Link Spam
    Detection Based on Mass Estimation", VLDB'06): the fraction of a
    node's PageRank NOT accounted for by trust flowing from the vetted
    seed set — ``sm = (pr - tr) / pr`` with PageRank and TrustRank run
    at the same damping and iteration count.  Link farms inflate
    ``pr`` without receiving seed trust, so their mass → 1; pages
    reachable from the reference's hardcoded source list (the seed
    set, see :func:`trustrank`) sit near the seed-coverage floor.  The
    crawl uses it as the demotion twin of TrustRank's admission gate:
    frontier hosts above a spam-mass threshold get budget cuts before
    a blocklist ever sees them.

    TrustRank's teleport is a probability vector over seeds while
    PageRank's is uniform over all nodes, so ``tr`` is not bounded by
    ``pr`` node-wise; mass is clamped to [0, 1] (both engines) — the
    standard reading where negative mass means "more trust than rank".

    Plan shape: the two rank chains share the degree-annotated edge
    frame's shape (one (dst, contribution) shuffle per iteration, see
    :func:`pagerank`) and meet in ONE node-keyed equi-join; ranks are
    node-cardinality frames, never edge-cardinality.  Scalar driver
    actions are the two chains' own (node count, seed count).
    """
    pr = pagerank(
        edges, iters=iters, damping=damping, src=src, dst=dst,
        checkpoint=checkpoint,
    ).withColumnRenamed("rank", "pr")
    tr = trustrank(
        edges, seeds, iters=iters, damping=damping, src=src, dst=dst,
        checkpoint=checkpoint,
    ).withColumnRenamed("rank", "tr")
    sm = F.when(
        F.col("pr") > 0,
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0), (F.col("pr") - F.col("tr")) / F.col("pr")
            ),
        ),
    ).otherwise(F.lit(0.0))
    return pr.join(tr, "node").select(
        "node",
        F.round("pr", ndigits).alias("pr"),
        F.round("tr", ndigits).alias("tr"),
        F.round(sm, ndigits).alias("spam_mass"),
    )


def reciprocity(edges: DataFrame, ndigits: int = 6) -> DataFrame:
    """Per-node link reciprocity: fraction of out-links answered by a
    back-link.

    Link farms exchange links (reciprocity → 1); editorial linking is
    mostly one-way (the web's global reciprocity is far below 0.5), so
    a high-reciprocity host cluster with low TrustRank is the classic
    spam-farm signature (complements :func:`spam_mass`).

    Plan: distinct edges, one self-join on the REVERSED pair (equi-join
    on both columns — co-partitioned, no broadcast needed at any
    scale), one agg.  Returns (node, out_deg, n_recip, reciprocity).
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    back = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).withColumn("has_back", F.lit(1))
    return (
        e.join(back, ["src", "dst"], "left")
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.count("*").alias("out_deg"),
            F.coalesce(F.sum("has_back"), F.lit(0)).alias("n_recip"),
        )
        .select(
            "node",
            "out_deg",
            "n_recip",
            F.round(F.col("n_recip") / F.col("out_deg"), ndigits).alias(
                "reciprocity"
            ),
        )
    )


def triangle_stats(edges: DataFrame, ndigits: int = 6) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient.

    Triangle density separates organic communities from link farms
    (farms are near-bipartite: huge degree, few closed wedges), and the
    local clustering coefficient 2·T/(d·(d−1)) is the per-node form.

    Plan (Suri & Vassilvitskii WWW'11 degree-ordered node-iterator —
    the MapReduce-scalable triangle algorithm):

    1. simple undirected edge set (self-loops out, both directions
       collapsed to ``u < v``), one distinct;
    2. degrees, joined onto both endpoints (degree dim is
       node-cardinality);
    3. orient every edge low→high in the (degree, node) total order —
       this caps out-degree at O(√m) even for celebrity nodes, so
    4. the wedge self-join on the oriented source emits only
       O(m^{3/2}) wedges overall (vs unbounded d² around hubs), and
    5. one equi-join of wedges against oriented edges closes them.

    Per-triangle rows explode to the 3 member nodes, one count agg,
    left-joined back onto degrees (nodes in no triangle report 0).
    Returns (node, degree, n_tri, clustering) for every node with
    degree ≥ 1.
    """
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ranked = und.join(du, "u").join(dv, "v")
    # orient low→high in the (degree, node) total order
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    lo = oriented.select(F.col("a"), F.col("b").alias("x"), F.col("db").alias("dx"))
    hi = oriented.select(F.col("a"), F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = lo.join(hi, "a").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("a", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.round(
                F.when(
                    F.col("degree") > 1,
                    2.0
                    * F.coalesce("n_tri", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                ndigits,
            ).alias("clustering"),
        )
    )


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Self-loops out, both directions collapsed to u < v, distinct."""
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 8) -> DataFrame:
    """Bounded-round k-core peel: the dense-core extractor.

    Repeat ``rounds`` times: drop every node whose degree in the
    current induced subgraph is < k (all at once — the synchronous
    peel), then re-induce the edge set.  The k-core (maximal subgraph
    with all degrees ≥ k) is the fixpoint; a FIXED round count keeps
    the computation a deterministic, oracle-expressible function of the
    input while preserving the production plan shape — at cluster scale
    the same loop runs to convergence (each round is one degree agg +
    one semi-join pair, all node-/edge-cardinality frames).

    Crawl use: the k-core of the host graph is the mutually-linked
    center (directories, link exchanges, genuine hubs); peel survivors
    get different trust priors than the tree-like fringe.

    Returns (node, core_degree): degrees within the edge set after
    ``rounds`` peels (no final filter — round counts are part of the
    contract).  Each round ``localCheckpoint``s the shrinking edge set:
    the degree agg and both joins read it twice, and lineage would
    otherwise double per round.
    """
    cur = _simple_undirected(edges)
    for _ in range(rounds):
        cur = cur.localCheckpoint(eager=False)
        keep = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
        )
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
        )
    return (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
    )


def degree_mixing(edges: DataFrame, ndigits: int = 6) -> DataFrame:
    """Average-neighbor-degree curve knn(d) — degree assortativity.

    For each degree d, the mean degree of the neighbors of degree-d
    nodes (Pastor-Satorras et al.: knn(d) rising = assortative social
    core; falling = disassortative hub-and-spoke, the link-farm /
    spam-network signature — farms wire low-degree sybils to one hub).

    Plan: one degree agg, two node-cardinality dim joins onto the
    distinct edge list (co-partitioned equi-joins), each undirected
    edge contributing both (d_u→d_v) and (d_v→d_u) endpoints in-row,
    then a ≤ max-degree-row agg.  No iteration, no wedge expansion.

    Returns (degree, n_endpoints, avg_nbr_degree).
    """
    und = _simple_undirected(edges)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    joined = und.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(
        deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v"
    )
    ends = joined.select(
        F.col("du").alias("degree"), F.col("dv").alias("nbr")
    ).unionAll(
        joined.select(F.col("dv").alias("degree"), F.col("du").alias("nbr"))
    )
    return ends.groupBy("degree").agg(
        F.count("*").alias("n_endpoints"),
        F.round(F.avg("nbr"), ndigits).alias("avg_nbr_degree"),
    )


def opic(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW'03), the crawl-ordering score Nutch ships as its
    default and Frontera's backends approximate: every page holds
    *cash*; each step it banks its cash into *history* and distributes
    it equally along its out-links; dangling pages return their cash
    uniformly to the whole graph (the paper's virtual node).  Pages
    that accumulate history fastest are the pages the frontier should
    fetch first — unlike PageRank, the estimate is meaningful after
    ANY number of steps, which is why crawlers use it online.

    Batch twin of ``iters`` synchronous steps from the uniform 1/N
    cash vector.  Returns ``(node, cash, hist, score)`` with ``score =
    (hist + cash) / (iters + 1)`` — total cash is conserved at 1.0
    every step, so the normalizer is closed-form and scores sum to 1.

    Plan shape per step (same discipline as :func:`pagerank`): one
    node-keyed contribution join+agg, one broadcast 1-row dangling-mass
    total (anti-join + scalar agg — never a collect), one left join to
    re-attach absent nodes; state is ``localCheckpoint``-ed per step so
    lineage stays flat at any ``iters``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("od"))
    ew = e.join(out_deg, "src")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0.0).alias("cash"),
            F.lit(0.0).alias("hist"),
            F.lit(0.0).alias("score"),
        )
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    has_out = out_deg.select(F.col("src").alias("node"))
    for _ in range(iters):
        contrib = (
            ew.join(
                state.select(F.col("node").alias("src"), "cash"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("od")).alias("c"))
        )
        dangling = (
            state.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dtot"))
        )
        state = (
            state.join(contrib, state["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("dtot") / n
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        )
        if checkpoint:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "node",
        "cash",
        "hist",
        ((F.col("hist") + F.col("cash")) / (iters + 1)).alias("score"),
    )


def collapse_aliases(
    edges: DataFrame,
    aliases: DataFrame,
    src: str = "src",
    dst: str = "dst",
    alias_col: str = "url",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Rewrite a link graph through an alias→canonical map (redirect
    terminals from `redirects.resolve_redirects` + ``rel=canonical``
    targets from `meta.extract_meta`) and fold duplicate edges into a
    multiplicity weight.

    Search engines collapse duplicate pages BEFORE link analysis —
    otherwise a page reachable via 5 aliases splits its in-link mass 5
    ways and every alias dilutes PageRank/OPIC/TrustRank (and a
    link-farm can manufacture rank by fanning aliases).  Output
    ``(src, dst, weight)`` with self-loops dropped, ready for the
    iterative scorers in this module.

    Plan: two left equi-joins on the endpoint key + one (src, dst)
    agg.  The alias map of a real crawl is much smaller than the edge
    list but NOT broadcast-small (10^8 aliases vs 10^10 edges), so the
    joins stay shuffle joins — co-located when both sides are bucketed
    by url (`tables.BucketedLog`), and AQE converts to broadcast
    automatically when a tenant's map IS small.  Aliases are resolved
    ONE level (callers feed fully-resolved maps; `resolve_redirects`
    already chases chains with pointer doubling).
    """
    amap = aliases.select(
        F.col(alias_col).alias("_a"), F.col(canonical_col).alias("_c")
    )
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .join(amap, F.col("src") == F.col("_a"), "left")
        .select(
            F.coalesce("_c", "src").alias("src"), "dst"
        )
        .join(amap, F.col("dst") == F.col("_a"), "left")
        .select(
            "src", F.coalesce("_c", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("weight")
    )


# --- HyperBall (Boldi & Vigna, "In-core computation of geometric
# centralities with HyperBall", 2013) ---------------------------------

HB_M = 16          # registers per node (p=4; production uses p>=6 —
                   # same algorithm, more hex chars in the bucket)
HB_RANK_CAP = 50   # fixed-point exponent cap (16 * 2^50 << 2^63)
HB_WINDOW = 13     # hex chars of the rank window (52 bits)
HB_ALPHA = 0.673   # HLL alpha for m=16


def _hb_register(col: Column) -> tuple[Column, Column]:
    """(bucket, rank) HLL register for one node id — the same
    engine-neutral md5 discipline as ``sketches.hll_register`` at
    m=16 (1 hex char of bucket so a per-node counter stays 16 ints)."""
    h = F.md5(col.cast("string"))
    bucket = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    w = F.substring(h, 2, HB_WINDOW)
    trimmed = F.regexp_replace(w, "^0+", "")
    lz = F.length(w) - F.length(trimmed)
    first = F.substring(trimmed, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return bucket, (lz * 4 + extra + 1).cast("int")


def _hb_estimate(reg_cols: list[Column]) -> Column:
    """HLL cardinality estimate from 16 in-row register columns —
    pure codegen arithmetic, no agg (each node's ball is estimated
    inside its own row)."""
    cap = F.lit(HB_RANK_CAP)
    # each term is an exact power of two <= 2^50; summed as BIGINT
    # because 16 * 2^50 = 2^54 > 2^53 — a double sum would round and
    # the rounding would depend on summation order (the DuckDB oracle
    # sums over rows in arbitrary order; same discipline as
    # sketches.hll_cardinality's s_fixed)
    terms = [
        F.pow(
            F.lit(2.0), (cap - F.least(r, cap)).cast("double")
        ).cast("bigint")
        for r in reg_cols
    ]
    s_fixed = terms[0]
    for t in terms[1:]:
        s_fixed = s_fixed + t
    v_empty = None
    for r in reg_cols:
        e = F.when(r == 0, 1).otherwise(0)
        v_empty = e if v_empty is None else v_empty + e
    m = float(HB_M)
    # single multiply (alpha * 256), matching the oracle's literal
    # association so the double product is bit-identical
    raw = (
        F.lit(HB_ALPHA * (HB_M * HB_M))
        * F.pow(F.lit(2.0), F.lit(float(HB_RANK_CAP)))
        / s_fixed.cast("double")
    )
    v = v_empty.cast("double")
    return F.when(
        (raw < 2.5 * m) & (v_empty > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)


def hyperball(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    ndigits: int = 4,
) -> DataFrame:
    """HyperBall: approximate neighborhood function and harmonic
    centrality on a web-scale graph (Boldi & Vigna 2013 — the
    algorithm behind the published Facebook/web-graph "degrees of
    separation" measurements).  Every node carries a 16-register
    HyperLogLog counter of its out-ball; one iteration unions each
    node's counter with its out-neighbors' counters (element-wise
    register max — union of HLL sketches is exact), so after t rounds
    the counter estimates ``|ball(v, t)|``.  Exact ball counting is
    infeasible at scale (balls grow to the graph size); HLL counters
    make the per-node state O(m) and the union associative — the
    whole iteration is ONE dst-keyed join + ONE node-keyed max agg,
    and register max is partial-aggregatable (map-side combine).

    State is 16 INT COLUMNS per node, not an array: the per-register
    ``max`` aggregates and the in-row estimate stay in whole-stage
    codegen with zero array allocation per row.

    Returns ``(node, ball_1 .. ball_iters, harmonic)`` — ball
    estimates per radius (2dp-free doubles rounded to ``ndigits``)
    and harmonic centrality ``Σ_t (ball_t − ball_{t−1})/t`` with
    ``ball_0`` the (estimated) singleton.  Estimates reuse the
    engine-neutral md5 register discipline of `sketches.hll_register`,
    so the DuckDB oracle replays them bit-for-bit.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    bucket, rank = _hb_register(F.col("node"))
    state = nodes.select(
        "node",
        *[
            F.when(bucket == j, rank).otherwise(0).cast("int").alias(f"r{j}")
            for j in range(HB_M)
        ],
    )
    if checkpoint:
        state = state.localCheckpoint(eager=False)
    regs = [F.col(f"r{j}") for j in range(HB_M)]
    balls = [_hb_estimate(regs).alias("ball_0")]
    ests: list[str] = ["ball_0"]
    state = state.select("node", *[f"r{j}" for j in range(HB_M)],
                         *balls)
    for t in range(1, iters + 1):
        nbr = e.join(
            state.select(
                F.col("node").alias("dst"),
                *[F.col(f"r{j}").alias(f"n{j}") for j in range(HB_M)],
            ),
            "dst",
        )
        contrib = nbr.groupBy(F.col("src").alias("node")).agg(
            *[F.max(f"n{j}").alias(f"c{j}") for j in range(HB_M)]
        )
        merged = state.join(contrib, "node", "left").select(
            "node",
            *[
                F.greatest(
                    F.col(f"r{j}"), F.coalesce(F.col(f"c{j}"), F.lit(0))
                ).alias(f"r{j}")
                for j in range(HB_M)
            ],
            *[F.col(b) for b in ests],
        )
        state = merged.select(
            "*", _hb_estimate(regs).alias(f"ball_{t}")
        )
        ests.append(f"ball_{t}")
        if checkpoint:
            state = state.localCheckpoint(eager=False)
    harmonic = None
    for t in range(1, iters + 1):
        d = (F.col(f"ball_{t}") - F.col(f"ball_{t-1}")) / t
        harmonic = d if harmonic is None else harmonic + d
    return state.select(
        "node",
        *[
            F.round(F.col(f"ball_{t}"), ndigits).alias(f"ball_{t}")
            for t in range(1, iters + 1)
        ],
        F.round(harmonic, ndigits).alias("harmonic"),
    )


def salsa(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """SALSA — Stochastic Approach for Link-Structure Analysis (Lempel
    & Moran, WWW'00; the scorer behind Twitter's Who-To-Follow
    production system).  Like HITS it separates hub and authority
    roles, but each step is a RANDOM WALK (contributions normalized by
    the degree of the node being left), which makes it far more
    resistant to tightly-knit-community (link-farm) score capture than
    HITS' mutual reinforcement — a farm's internal edges divide their
    own weight away instead of compounding it.

    Batch twin of ``iters`` synchronous hub/authority walk steps from
    the uniform vector:

        h(i) = Σ_{j ∈ F(i)} a(j) / |B(j)|     (authority→hub, back-walk)
        a(j) = Σ_{i ∈ B(j)} h(i) / |F(i)|     (hub→authority, fwd-walk)

    Both vectors stay probability distributions (each step is a
    stochastic matrix), so no normalization pass is needed — unlike
    HITS' L2 pass — and scores are directly comparable across rounds.

    Plan shape per step (the `pagerank`/`opic`/`hits` discipline): the
    degree-annotated edge list is computed ONCE and localCheckpoint-ed;
    each half-step is one node-keyed join + agg exchange.  Returns
    ``(node, hub, authority)`` rounded to ``ndigits``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("od"))
    in_deg = e.groupBy("dst").agg(F.count("*").alias("id_"))
    ew = (
        e.join(out_deg, "src")
        .join(in_deg, "dst")
        .select("src", "dst", "od", "id_")
    )
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
    hubs = ew.select(F.col("src").alias("node")).distinct()
    auths = ew.select(F.col("dst").alias("node")).distinct()
    n_h = hubs.count()
    n_a = auths.count()
    if n_h == 0:
        return hubs.select(
            "node",
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        )
    a = auths.select("node", F.lit(1.0 / n_a).alias("a"))
    h = hubs.select("node", F.lit(1.0 / n_h).alias("h"))
    for _ in range(iters):
        h = (
            ew.join(a.select(F.col("node").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("a") / F.col("id_")).alias("h"))
        )
        a = (
            ew.join(h.select(F.col("node").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("h") / F.col("od")).alias("a"))
        )
        if checkpoint:
            h = h.localCheckpoint(eager=False)
            a = a.localCheckpoint(eager=False)
    return (
        hubs.join(h, "node", "left")
        .select("node", F.coalesce("h", F.lit(0.0)).alias("hub"))
        .join(
            auths.join(a, "node", "left").select(
                "node", F.coalesce("a", F.lit(0.0)).alias("authority")
            ),
            "node",
            "full_outer",
        )
        .select(
            "node",
            F.round(F.coalesce("hub", F.lit(0.0)), ndigits).alias("hub"),
            F.round(F.coalesce("authority", F.lit(0.0)), ndigits).alias(
                "authority"
            ),
        )
    )


def pagerank_weighted(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank: contributions split by EDGE WEIGHT instead of
    uniformly — ``contrib(u→v) = rank(u) · w(u,v) / Σ_x w(u,x)``.

    This is the natural companion of :func:`collapse_aliases`: folding
    duplicate pages turns the web multigraph into a weighted graph
    whose weights ARE the collapsed multiplicities; running uniform
    PageRank on it would throw that evidence away (ten thousand alias
    pages linking v once each ≠ one page linking v once).  Anchor-count
    weights and intra-host damping factors ride the same column.

    Identical plan and parity discipline to :func:`pagerank` (one
    (dst, contribution) agg exchange per iteration, weight-sum
    annotated edges computed once, localCheckpoint per iteration, no
    dangling redistribution, 6dp at the query level) — the ONLY
    change is the per-edge factor ``w/W`` replacing ``1/od``.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = e.join(out_w, "src")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.col("rank") * F.col("w") / F.col("ow")
                ).alias("c")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
