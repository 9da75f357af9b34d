"""Blocked Levenshtein fuzzy join: exact distances, blocking recall
contract, cap behavior, and the join-free plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.fuzzy import fuzzy_pairs


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, title string")


def test_exact_distances(spark):
    df = _df(
        spark,
        [
            (1, "lei complementar 101"),
            (2, "lei complementar 102"),  # dist 1 to id 1
            (3, "lei complementar"),      # dist 4 to id 1
            (4, "decreto estadual 9"),    # different block
        ],
    )
    out = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_pairs(df, max_dist=2).collect()
    }
    assert out == {(1, 2): 1}
    wide = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_pairs(df, max_dist=4).collect()
    }
    assert wide == {(1, 2): 1, (1, 3): 4, (2, 3): 4}


def test_blocking_misses_cross_block_pairs(spark):
    # dist 1 but first tokens differ → by contract, not a candidate
    df = _df(spark, [(1, "lei x"), (2, "lai x")])
    assert fuzzy_pairs(df, max_dist=3).count() == 0


def test_case_insensitive_block(spark):
    df = _df(spark, [(1, "Lei antiga"), (2, "lei antigas")])
    assert fuzzy_pairs(df, max_dist=2).count() == 1


def test_oversize_block_dropped(spark):
    df = _df(spark, [(i, f"lei {i}") for i in range(10)])
    assert fuzzy_pairs(df, max_dist=9, max_block=5).count() == 0
    assert fuzzy_pairs(df, max_dist=9, max_block=100).count() == 45


def test_duplicate_id_no_self_pair(spark):
    df = _df(spark, [(1, "lei a"), (1, "lei b"), (2, "lei c")])
    out = fuzzy_pairs(df, max_dist=3).collect()
    assert all(r["a_id"] != r["b_id"] for r in out)


def test_plan_is_join_free_single_shuffle(spark):
    df = _df(spark, [(1, "lei a"), (2, "lei b")])
    plan = _explain(fuzzy_pairs(df, max_dist=2))
    assert "Join" not in plan  # in-array expansion, no bucket self-join
    # exactly one hash exchange tree: the blocking groupBy (+ the
    # distinct's reuse); levenshtein stays inside codegen
    assert "levenshtein" in plan.lower()
