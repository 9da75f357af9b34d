"""k-means trainer: correctness on separable data, determinism, and
the zero-shuffle assignment plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.operators.clustering import (
    assign_clusters,
    init_centroids,
    kmeans_assign,
    update_centroids,
)

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def blobs(spark):
    """Two well-separated 4-d blobs of 40 points each: group g's
    coordinates live in [10g, 10g+1)."""
    return spark.range(80).select(
        F.col("id"),
        (F.col("id") % 2).alias("g"),
        F.array(
            *[
                (F.col("id") % 2) * 10.0
                + ((F.col("id") * (i + 3)) % 97) / 97.0
                for i in range(4)
            ]
        ).alias("embedding"),
    )


def test_separable_blobs_recovered(blobs):
    out = kmeans_assign(blobs, id_col="id", k=2, iters=3)
    joined = out.join(blobs.select("id", "g"), "id")
    # each learned cluster maps to exactly one true blob
    purity = joined.groupBy("cluster").agg(
        F.countDistinct("g").alias("n_groups"),
        F.count("*").alias("n"),
    )
    rows = purity.collect()
    assert len(rows) == 2
    assert all(r["n_groups"] == 1 and r["n"] == 40 for r in rows)


def test_deterministic_rerun(blobs):
    a = sorted(kmeans_assign(blobs, id_col="id", k=4, iters=2).collect())
    b = sorted(kmeans_assign(blobs, id_col="id", k=4, iters=2).collect())
    assert a == b


def test_every_row_assigned_once(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = kmeans_assign(emb, k=8, iters=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("id").distinct().count() == n
    assert out.agg(F.countDistinct("cluster")).first()[0] <= 8


def test_update_means_match_manual(blobs):
    v = blobs.select("id", F.col("embedding").alias("v"))
    cents = init_centroids(v, k=2)
    a = assign_clusters(v, cents)
    c1 = update_centroids(a)
    # element-wise mean equals a hand-computed per-cluster average
    manual = (
        a.select("cluster", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    got = {r["cluster"]: r["c"] for r in c1.collect()}
    for r in manual:
        assert abs(got[r["cluster"]][r["i"]] - r["m"]) < 1e-12


def test_assignment_plan_is_shuffle_free(blobs):
    """Assignment = broadcast 1-row centroid array + in-row argmin:
    no sort-merge join, no per-id window, and the only exchange in the
    subtree is the broadcast itself."""
    v = blobs.select("id", F.col("embedding").cast("array<double>").alias("v"))
    cents = init_centroids(v, k=4).localCheckpoint(eager=True)
    plan = _explain(assign_clusters(v, cents))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
