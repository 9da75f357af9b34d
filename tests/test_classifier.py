"""Hashed-feature classifier inference (operators/classifier.py)."""

import hashlib

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.classifier import (
    DIMS,
    classifier_scores,
    feature_index,
    weight_int,
)


def test_score_matches_python_twin(spark):
    texts = [
        "lei complementar nº 101 de 2000",
        "single",
        "ação ção ção repetida",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: r for r in classifier_scores(df).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        idxs = [
            int(hashlib.md5(w.encode()).hexdigest()[:2], 16) for w in toks
        ]
        want = sum(weight_int(j) for j in idxs)
        assert got[i].score_int == want
        assert got[i].n_toks == len(toks)


def test_empty_text_yields_null_prob(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id int, text string")
    rows = {r.doc_id: r for r in classifier_scores(df).collect()}
    for r in rows.values():
        assert r.n_toks == 0 and r.score_int == 0
        assert r.prob is None and r.label is None


def test_plan_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        classifier_scores(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_feature_index_range(spark):
    df = spark.range(300).select(F.col("id").cast("string").alias("t"))
    mn, mx = (
        df.select(feature_index(F.col("t")).alias("i"))
        .agg(F.min("i"), F.max("i"))
        .collect()[0]
    )
    assert 0 <= mn and mx < DIMS
