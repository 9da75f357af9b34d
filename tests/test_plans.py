"""Physical-plan discipline: the plans we designed are the plans Spark
runs — broadcasts where intended, predicate/column pushdown reaching
the parquet scan, no sort-merge shuffle of page bodies."""

from __future__ import annotations

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.fetch import resolve_against_web
from legislation_scraper_spark.operators.politeness import apply_robots
from legislation_scraper_spark.operators.seen import with_url_key
from legislation_scraper_spark.synth import synth_world

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    plan = _explain(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # column pruning: scan schema must not include unprojected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_robots_join_is_broadcast(spark):
    w = synth_world(spark, seed=5, docs_per_source=5, n_sources=2, partitions=2)
    cand = with_url_key(
        w["pages_raw"].select("url"), "url", 4
    ).withColumn("host", F.lit("www.planalto.leg.br"))
    out = apply_robots(cand, w["robots"])
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan


def test_fetch_join_never_shuffles_bodies(spark):
    w = synth_world(spark, seed=5, docs_per_source=5, n_sources=2, partitions=2)
    sel = with_url_key(w["pages_raw"].select("url").limit(10), "url", 4)
    resolved = resolve_against_web(sel, w["pages_raw"])
    plan = _explain(resolved)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_lsh_plan_has_no_join(spark):
    """The LSH pair producer is groupBy + in-array expansion — the plan
    must contain NO join of any kind and NO cartesian product."""
    from legislation_scraper_spark.operators.dedup import minhash_lsh_pairs

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _explain(minhash_lsh_pairs(df))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # covers SortMergeJoin/BroadcastHashJoin/...


def test_jaccard_dict_join_is_broadcast(spark):
    """Token-dictionary encoding must broadcast the dict, and the pair
    join must stay an equi join (no cartesian)."""
    from legislation_scraper_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _explain(ngram_jaccard_pairs(df, ["source"], threshold=0.8))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan