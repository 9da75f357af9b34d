"""Embedding clustering: Lloyd's k-means as pure DataFrame algebra.

The curation tier above SemDeDup (operators/dedup.semantic_dedup) and
IVF-ANN (operators/similarity.ivf_topk) both need a *trained* cluster
structure over the embedding column — SemDeDup's published recipe
clusters first and dedups within clusters, and IVF recall improves
sharply when cells come from k-means rather than a hash sample.  This
module supplies that trainer, Spark-first:

- **centroid init** — the ``k`` vectors with the smallest
  ``(md5(id), id)``: engine-neutral (DuckDB computes the identical
  order, the operators/sketches.py convention), and ``orderBy.limit``
  compiles to TakeOrderedAndProject, so init never sorts or
  single-partitions the corpus.
- **assignment is zero-shuffle** — the k centroids are folded into ONE
  broadcast row holding an ``array<struct<cluster,c>>``; each vector
  computes argmin-distance IN-ROW via ``transform`` + ``array_min``
  (struct ordering = lexicographic ⇒ min distance, then min cluster id
  as the deterministic tie-break).  No crossJoin row blow-up, no
  per-id window shuffle: the whole assignment is one
  whole-stage-codegen projection over the corpus.
- **update is partial-aggregated** — ``posexplode`` + two-level
  groupBy: map-side combine reduces the exchange to
  O(partitions × k × d) partial sums, never O(n × d) rows; the
  k-row centroid frame is ``localCheckpoint``-ed per round so plan
  lineage stays flat across iterations (the operators/graph.py idiom).

At 100 TB the per-iteration cost is therefore one corpus scan plus a
k×d-row exchange — the textbook scalable shape (mini-batch variants
drop the scan to a sample; the algebra here is unchanged).

No reference parity cite: the reference scraper has no clustering
tier; this belongs to the LLM-data-pipeline surface (SemDeDup, Abbas
et al. 2023 §3.1 clusters with k-means before intra-cluster dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(a, b):
    """Squared L2 between two array<double> columns, folded in-row
    left-to-right (the element order DuckDB's ``list_aggregate 'sum'``
    reproduces bit-for-bit, keeping integer assignments oracle-safe)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def init_centroids(
    v: DataFrame, k: int, id_col: str = "id", vec_col: str = "v"
) -> DataFrame:
    """Deterministic hash-sample init: the ``k`` rows with smallest
    ``(md5(id), id)`` → ``(cluster 1..k, c)``.  TakeOrderedAndProject
    (partial per-partition top-k merged at k rows) — O(scan), no full
    sort, engine-neutral so the DuckDB oracle selects the same rows."""
    return (
        v.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("_h", id_col))
            .alias("cluster"),
            F.col(vec_col).alias("c"),
        )
    )


def assign_clusters(
    v: DataFrame, cents: DataFrame, vec_col: str = "v"
) -> DataFrame:
    """Nearest-centroid assignment, zero-shuffle: centroids collapse to
    one broadcast row of ``array<struct<cluster,c>>``; argmin runs
    in-row (``array_min`` over ``struct(dist, cluster)`` — ties break
    to the smaller cluster id).  Adds a ``cluster`` column."""
    carr = cents.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cluster"), F.col("c")))
        ).alias("_cs")
    )
    dists = F.transform(
        F.col("_cs"),
        lambda s: F.struct(
            _sqdist(F.col(vec_col), s["c"]).alias("d"),
            s["cluster"].alias("cluster"),
        ),
    )
    return (
        v.crossJoin(F.broadcast(carr))
        .withColumn("cluster", F.array_min(dists)["cluster"])
        .drop("_cs")
    )


def update_centroids(
    assigned: DataFrame, vec_col: str = "v"
) -> DataFrame:
    """Per-cluster element-wise mean → ``(cluster, c)``.  posexplode +
    (cluster, pos) groupBy partial-aggregates map-side, so the exchange
    carries O(partitions × k × d) partial sums; the k-row result is
    localCheckpoint-ed to keep iteration lineage flat."""
    return (
        assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
        .localCheckpoint(eager=True)
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means over an embedding column → ``(id, cluster)``.

    ``iters`` assignment passes with a centroid update between
    consecutive passes (c0→a0→c1→a1 for ``iters=2``); the returned
    assignment is against the final centroids.  Deterministic
    end-to-end: hash-sample init + lexicographic tie-breaks.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cents = init_centroids(v, k)
    a = None
    for i in range(iters):
        a = assign_clusters(v, cents)
        if i < iters - 1:
            cents = update_centroids(a)
    return a.select("id", F.col("cluster").cast("int").alias("cluster"))


def bcubed(
    assign: DataFrame,
    cluster_col: str = "cluster",
    truth_col: str = "truth",
    ndigits: int = 6,
) -> DataFrame:
    """B-cubed precision/recall/F1 of a flat clustering against
    ground-truth classes (Bagga & Baldwin, 1998; the standard
    extrinsic metric for dedup clusterings — Amigó et al. 2009 show
    it is the only common one satisfying all four clustering-metric
    constraints).  Item-level averages reduce to contingency sums::

        B³P = Σ_{c,t} n_ct² / |c|  / N      B³R = Σ_{c,t} n_ct² / |t| / N

    over the (cluster, truth) contingency cells — no per-item pair
    expansion, so the O(N²) pairwise definition never materializes.

    Scale: one (cluster, truth) count shuffle for the cells plus the
    two marginal size aggregations; the cluster marginal joins the
    cells on the SAME cluster key (co-partitioned exchange reuse), the
    truth marginal on the truth key.  Rows after the cells agg are
    bounded by distinct (cluster, truth) pairs ≤ N — never pairs of
    items.  Returns ONE row ``(n_items, n_clusters, n_classes,
    bcubed_precision, bcubed_recall, bcubed_f1)``.
    """
    cells = assign.groupBy(
        F.col(cluster_col).alias("c"), F.col(truth_col).alias("t")
    ).agg(F.count("*").cast("double").alias("n_ct"))
    csize = cells.groupBy("c").agg(F.sum("n_ct").alias("c_sz"))
    tsize = cells.groupBy("t").agg(F.sum("n_ct").alias("t_sz"))
    j = cells.join(csize, "c").join(tsize, "t")
    agg = j.agg(
        F.sum("n_ct").alias("n"),
        F.countDistinct("c").cast("bigint").alias("n_clusters"),
        F.countDistinct("t").cast("bigint").alias("n_classes"),
        F.sum(F.col("n_ct") * F.col("n_ct") / F.col("c_sz")).alias("sp"),
        F.sum(F.col("n_ct") * F.col("n_ct") / F.col("t_sz")).alias("sr"),
    )
    p = F.col("sp") / F.col("n")
    r = F.col("sr") / F.col("n")
    return agg.select(
        F.col("n").cast("bigint").alias("n_items"),
        "n_clusters",
        "n_classes",
        F.round(p, ndigits).alias("bcubed_precision"),
        F.round(r, ndigits).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), ndigits).alias("bcubed_f1"),
    )
