"""Round-4 batch-8 operators: Kneser-Ney bigram LM scoring, Wilson
host quality, spam mass, deterministic stratified sampling, B-cubed
clustering eval."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.clustering import bcubed
from legislation_scraper_spark.operators.curation import (
    kn_logprob_scores,
    wilson_host_quality,
)
from legislation_scraper_spark.operators.graph import spam_mass
from legislation_scraper_spark.operators.sampling import (
    BUCKETS,
    sample_bucket,
    stratified_sample,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- Kneser-Ney bigram LM ---------------------------------------------


def test_kn_short_docs_filtered(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b a b a c")],
        "doc_id long, text string",
    )
    rows = kn_logprob_scores(df).collect()
    assert [r["id"] for r in rows] == [3]
    assert rows[0]["n_bigrams"] == 5


def test_kn_probabilities_are_probabilities(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 3} w{(i + 1) % 3} w{i % 5} fim") for i in range(40)],
        "doc_id long, text string",
    )
    for r in kn_logprob_scores(df).collect():
        # log10 P of a product of probabilities: strictly negative
        assert r["mean_logprob"] < 0


def test_kn_frequent_bigram_scores_higher(spark):
    # doc 1 repeats the corpus's dominant bigram; doc 2 is one-off junk
    rows = [(1, "alpha beta " * 20)] + [
        (i, "alpha beta gamma delta") for i in range(2, 12)
    ] + [(99, "zz qq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["mean_logprob"] for r in kn_logprob_scores(df).collect()}
    assert got[1] > got[99]


def test_kn_unseen_context_uses_continuation(spark):
    # 'qq zz': neither in the LM → the CASE falls to pure Pcont, which
    # the add-one guard keeps finite and < 1
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "qq zz")], "doc_id long, text string"
    )
    got = {r["id"]: r["mean_logprob"] for r in kn_logprob_scores(df).collect()}
    assert math.isfinite(got[2]) and got[2] < 0
    assert got[1] > got[2]


# --- Wilson host quality ----------------------------------------------


def _wilson(spark, rows):
    df = spark.createDataFrame(rows, "source string, good boolean")
    return {
        r["host"]: r
        for r in wilson_host_quality(df, "good").collect()
    }


def test_wilson_small_sample_shrinks(spark):
    rows = [("tiny", True)] * 3 + [("big", True)] * 950 + [
        ("big", False)
    ] * 50
    got = _wilson(spark, rows)
    # raw rates: tiny 1.0 > big 0.95 — the bound must flip the order
    assert got["tiny"]["rate"] > got["big"]["rate"]
    assert got["tiny"]["wilson_low"] < got["big"]["wilson_low"]


def test_wilson_bound_below_rate(spark):
    rows = [("h", i % 3 != 0) for i in range(30)]
    got = _wilson(spark, rows)["h"]
    assert 0 < got["wilson_low"] < got["rate"] < 1


def test_wilson_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [("h", True)], "source string, good boolean"
    )
    plan = _explain(wilson_host_quality(df, "good"))
    # formatted explain prints each node twice (tree line + detail
    # header) — count tree lines "Exchange (N" only.
    assert plan.count("Exchange (") == 1


# --- spam mass ---------------------------------------------------------


def test_spam_mass_farm_vs_seeded(spark):
    # seeds -> good; farm nodes boost each other, unreachable from seed
    edges = spark.createDataFrame(
        [("seed", "good"), ("good", "seed"), ("farm1", "farm2"),
         ("farm2", "farm1"), ("farm1", "good")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("seed",)], ["node"])
    got = {r["node"]: r for r in spam_mass(edges, seeds).collect()}
    assert got["farm2"]["spam_mass"] == 1.0  # no trust reaches it
    assert got["good"]["spam_mass"] < got["farm2"]["spam_mass"]
    for r in got.values():
        assert 0.0 <= r["spam_mass"] <= 1.0


def test_spam_mass_no_seeds_all_one(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    seeds = spark.createDataFrame([("zz",)], ["node"]).filter("node = 'q'")
    got = spam_mass(edges, seeds).collect()
    assert {r["spam_mass"] for r in got} == {1.0}


# --- stratified sampling ----------------------------------------------


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("pt").alias("lang"),
    )


def _rates(spark, pairs):
    return spark.createDataFrame(pairs, ["lang", "rate"])


def test_sample_rate_one_keeps_stratum(spark):
    d = _docs(spark)
    kept = stratified_sample(
        d, _rates(spark, [("en", 1.0)]), "doc_id", "lang"
    )
    assert kept.count() == d.filter("lang = 'en'").count()


def test_sample_absent_stratum_dropped(spark):
    d = _docs(spark)
    kept = stratified_sample(
        d, _rates(spark, [("en", 1.0)]), "doc_id", "lang"
    )
    assert kept.filter("lang = 'pt'").count() == 0


def test_sample_partitioning_invariant(spark):
    d = _docs(spark)
    r = _rates(spark, [("en", 0.3), ("pt", 0.6)])
    a = {
        x["doc_id"]
        for x in stratified_sample(d, r, "doc_id", "lang").collect()
    }
    b = {
        x["doc_id"]
        for x in stratified_sample(
            d.repartition(7, "lang"), r, "doc_id", "lang"
        ).collect()
    }
    assert a == b and 0 < len(a) < 400


def test_sample_salts_compose(spark):
    d = _docs(spark)
    r = _rates(spark, [("en", 0.5), ("pt", 0.5)])
    once = stratified_sample(d, r, "doc_id", "lang", salt="A")
    twice = stratified_sample(once, r, "doc_id", "lang", salt="B")
    # nested Bernoulli: the composition is a subset of the first pass
    ids1 = {x["doc_id"] for x in once.collect()}
    ids2 = {x["doc_id"] for x in twice.collect()}
    assert ids2 <= ids1 and len(ids2) < len(ids1)


def test_sample_bucket_range(spark):
    vals = (
        spark.range(1000)
        .select(sample_bucket(F.col("id")).alias("b"))
        .agg(F.min("b"), F.max("b"))
        .collect()[0]
    )
    assert 0 <= vals[0] and vals[1] < BUCKETS


def test_sample_no_shuffle_on_fact_side(spark):
    d = _docs(spark)
    r = _rates(spark, [("en", 0.5)])
    plan = _explain(stratified_sample(d, r, "doc_id", "lang"))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


# --- B-cubed -----------------------------------------------------------


def _assign(spark, triples):
    return spark.createDataFrame(triples, ["id", "cluster", "truth"])


def test_bcubed_perfect(spark):
    a = _assign(
        spark, [(1, "c1", "t1"), (2, "c1", "t1"), (3, "c2", "t2")]
    )
    r = bcubed(a).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert r["bcubed_recall"] == 1.0
    assert r["bcubed_f1"] == 1.0


def test_bcubed_one_big_cluster(spark):
    a = _assign(
        spark, [(1, "c", "t1"), (2, "c", "t1"), (3, "c", "t2"), (4, "c", "t2")]
    )
    r = bcubed(a).collect()[0]
    # all together: recall perfect, precision = avg |t|/|c| = 0.5
    assert r["bcubed_recall"] == 1.0
    assert r["bcubed_precision"] == 0.5


def test_bcubed_singletons(spark):
    a = _assign(
        spark, [(1, "c1", "t"), (2, "c2", "t"), (3, "c3", "t"), (4, "c4", "t")]
    )
    r = bcubed(a).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert r["bcubed_recall"] == 0.25
    assert r["n_clusters"] == 4 and r["n_classes"] == 1
