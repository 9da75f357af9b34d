"""Round-4 batch-11 operators: k-core peel, degree mixing,
cumulative HLL merge, language-ID evaluation."""

from __future__ import annotations

from datetime import date

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.graph import (
    degree_mixing,
    kcore_peel,
)
from legislation_scraper_spark.operators.sketches import (
    hll_cardinality,
    hll_cumulative,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# --- kcore_peel -------------------------------------------------------


def test_kcore_k4_plus_pendant(spark):
    nodes = ["a", "b", "c", "d"]
    k4 = [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1 :]]
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_edges(spark, k4 + [("d", "e")]), k=3).collect()
    }
    # e (deg 1) peels off round 1; K4 survives with degree 3 each
    assert got == {n: 3 for n in nodes}


def test_kcore_chain_peels_iteratively(spark):
    # triangle x-y-z with a 3-node tail: the tail peels one node per
    # round (END first, then its parent, ...), needing >1 round
    pairs = [
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("z", "p1"), ("p1", "p2"), ("p2", "p3"),
    ]
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_edges(spark, pairs), k=2, rounds=8).collect()
    }
    assert got == {"x": 2, "y": 2, "z": 2}


def test_kcore_bounded_rounds_contract(spark):
    # with rounds=1 the partially-peeled state is returned as-is
    pairs = [
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("z", "p1"), ("p1", "p2"), ("p2", "p3"),
    ]
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_peel(_edges(spark, pairs), k=2, rounds=1).collect()
    }
    # p3 (deg 1) removed; p1-p2 edge survives round 1
    assert got == {"x": 2, "y": 2, "z": 3, "p1": 2, "p2": 1}


def test_kcore_empty_when_no_core(spark):
    # a tree has no 2-core
    got = kcore_peel(
        _edges(spark, [("a", "b"), ("b", "c"), ("b", "d")]), k=2
    ).collect()
    assert got == []


# --- degree_mixing ----------------------------------------------------


def test_degree_mixing_star(spark):
    star = [("h", x) for x in ("a", "b", "c")]
    got = {
        r["degree"]: (r["n_endpoints"], r["avg_nbr_degree"])
        for r in degree_mixing(_edges(spark, star)).collect()
    }
    # hub (deg 3) sees avg neighbor degree 1; leaves see 3
    assert got == {3: (3, 1.0), 1: (3, 3.0)}


def test_degree_mixing_regular_graph(spark):
    # 4-cycle: everyone degree 2, neighbors degree 2
    got = degree_mixing(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ).collect()
    assert len(got) == 1
    assert (got[0]["degree"], got[0]["n_endpoints"],
            got[0]["avg_nbr_degree"]) == (2, 8, 2.0)


# --- hll_cumulative ---------------------------------------------------


def _keyed(spark, rows):
    return spark.createDataFrame(rows, "day date, k string")


def test_hll_cumulative_exact_curve(spark):
    d1, d2, d3 = date(2024, 1, 1), date(2024, 1, 2), date(2024, 1, 3)
    rows = (
        [(d1, f"a{i}") for i in range(50)]
        + [(d2, f"a{i}") for i in range(25)]      # all repeats
        + [(d2, f"b{i}") for i in range(30)]      # 30 new
        + [(d3, f"c{i}") for i in range(20)]      # 20 new
    )
    out = {
        r["day"]: (r["n_exact"], r["est"])
        for r in hll_cumulative(_keyed(spark, rows), "k").collect()
    }
    assert [out[d][0] for d in (d1, d2, d3)] == [50, 80, 100]
    # linear-counting regime: estimate within 5% of exact
    for d in (d1, d2, d3):
        n, est = out[d]
        assert abs(est - n) / n < 0.05
    # register merge is monotone -> estimate curve non-decreasing
    assert out[d1][1] <= out[d2][1] <= out[d3][1]


def test_hll_cumulative_last_day_equals_batch(spark):
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    rows = [(d1, f"x{i}") for i in range(40)] + [
        (d2, f"y{i}") for i in range(40)
    ]
    df = _keyed(spark, rows)
    last = (
        hll_cumulative(df, "k")
        .filter(F.col("day") == d2)
        .collect()[0]
    )
    batch = hll_cardinality(df, "k").collect()[0]
    # the as-of-last-day merged registers ARE the batch registers
    assert last["s_fixed"] == batch["s_fixed"]
    assert last["v_empty"] == batch["v_empty"]
    assert last["est"] == batch["est"]
    assert last["n_exact"] == batch["n_exact"]


# --- langid_eval ------------------------------------------------------


def test_langid_eval_confusion(spark):
    import __spark_entry__  # noqa: F401  (query defined there)
    from __spark_entry__ import q_langid_eval

    en = "the of and to in is a " * 3
    pt = "de da do que e em uma " * 3
    rows = [
        (1, "en", en), (2, "en", en),
        (3, "en", pt),            # mislabeled: model says pt
        (4, "pt", pt),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from legislation_scraper_spark.functions import text as T

    cells = (
        df.select("lang", T.lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )
    got = {(r["lang"], r["pred"]): r["n"] for r in cells.collect()}
    assert got == {("en", "en"): 2, ("en", "pt"): 1, ("pt", "pt"): 1}


# --- registry parity (the driver's own compare, at sf0.001) ------------


def test_b11_queries_match_oracles(spark):
    from conftest import SF_SMALL, compare_query

    for name in ("kcore", "degree_mixing", "hll_cumulative", "langid_eval"):
        compare_query(spark, name, SF_SMALL)
