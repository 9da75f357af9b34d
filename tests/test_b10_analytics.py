"""Round-4 batch-10 operators: triangle counts / clustering,
Efraimidis–Spirakis weighted sampling, ordered funnels, cohort
retention."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.analytics import (
    cohort_retention,
    funnel_stages,
)
from legislation_scraper_spark.operators.graph import triangle_stats
from legislation_scraper_spark.operators.sampling import weighted_sample


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- triangle_stats ---------------------------------------------------


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["degree"], r["n_tri"], r["clustering"])
        for r in triangle_stats(df).collect()
    }


def test_triangle_plus_pendant(spark):
    # triangle a-b-c plus pendant c-d; reversed dup + self-loop noise
    got = _tri(
        spark,
        [
            ("a", "b"),
            ("b", "c"),
            ("a", "c"),
            ("c", "d"),
            ("b", "a"),  # reversed duplicate collapses
            ("a", "a"),  # self-loop dropped
        ],
    )
    assert got == {
        "a": (2, 1, 1.0),
        "b": (2, 1, 1.0),
        "c": (3, 1, round(2 / 6, 6)),
        "d": (1, 0, 0.0),
    }


def test_triangle_k4(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [
        (u, v) for i, u in enumerate(nodes) for v in nodes[i + 1 :]
    ]
    got = _tri(spark, edges)
    # K4: every node in C(3,2)=3 triangles, clustering 1
    assert got == {n: (3, 3, 1.0) for n in nodes}


def test_triangle_free_graph(spark):
    # 4-cycle: degrees 2, zero triangles
    got = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert got == {n: (2, 0, 0.0) for n in "abcd"}


# --- weighted_sample --------------------------------------------------


def _ws_df(spark):
    rows = [
        (i, "s" + str(i % 2), float(w))
        for i, w in enumerate([5, 40, 1, 80, 3, 60, 0, -2, 7, 9])
    ]
    return spark.createDataFrame(rows, "id long, stratum string, w double")


def test_weighted_sample_shape(spark):
    df = _ws_df(spark)
    out = weighted_sample(
        df, key=F.col("id"), weight=F.col("w"), stratum_col="stratum", k=3
    )
    rows = out.collect()
    # k per stratum, ranks 1..k dense, es in (0, 1]
    by_s = {}
    for r in rows:
        by_s.setdefault(r["stratum"], []).append(r["sample_rank"])
        assert 0.0 < r["es_key"] <= 1.0
        assert r["w"] > 0  # non-positive weights never qualify
    assert all(sorted(v) == [1, 2, 3] for v in by_s.values())


def test_weighted_sample_deterministic(spark):
    df = _ws_df(spark)
    a = weighted_sample(
        df, key=F.col("id"), weight=F.col("w"), stratum_col="stratum", k=2
    )
    b = weighted_sample(
        df.repartition(7),
        key=F.col("id"),
        weight=F.col("w"),
        stratum_col="stratum",
        k=2,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_weighted_sample_salt_changes_selection(spark):
    # big strata so at least one rank flips under a different salt
    rows = [(i, "s", float(i % 17 + 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, stratum string, w double")
    a = weighted_sample(
        df, key=F.col("id"), weight=F.col("w"), stratum_col="stratum", k=5
    )
    b = weighted_sample(
        df,
        key=F.col("id"),
        weight=F.col("w"),
        stratum_col="stratum",
        k=5,
        salt="other",
    )
    ids = lambda d: sorted(r["id"] for r in d.collect())  # noqa: E731
    assert ids(a) != ids(b)


def test_weighted_sample_plan_windowgrouplimit(spark):
    df = _ws_df(spark)
    out = weighted_sample(
        df, key=F.col("id"), weight=F.col("w"), stratum_col="stratum", k=3
    )
    # rank<=k must push below the per-stratum sort (map-side top-k)
    assert "WindowGroupLimit" in _explain(out)


# --- funnel_stages ----------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_strict_order(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "signup"), (1, 2, "view"), (1, 3, "click"),
            # out-of-order click never counts; view@3 does
            (2, 1, "signup"), (2, 2, "click"), (2, 3, "view"),
            # view before signup doesn't count toward stage 2
            (3, 1, "view"), (3, 2, "signup"),
            (4, 1, "click"),  # never signs up
        ],
    )
    out = funnel_stages(ev, ("signup", "view", "click"))
    got = {
        r["stage_idx"]: (r["stage"], r["n_users"], r["conversion"])
        for r in out.collect()
    }
    assert got == {
        1: ("signup", 3, 1.0),
        2: ("view", 2, round(2 / 3, 6)),
        3: ("click", 1, 0.5),
    }


def test_funnel_interleaved_noise(spark):
    # non-stage events interleave freely; repeats don't double-count
    ev = _ev(
        spark,
        [
            (1, 1, "signup"), (1, 2, "error"), (1, 3, "signup"),
            (1, 4, "view"), (1, 5, "view"),
        ],
    )
    out = funnel_stages(ev, ("signup", "view", "click"))
    got = {r["stage_idx"]: r["n_users"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_funnel_single_shuffle_for_user_agg(spark):
    ev = _ev(spark, [(1, 1, "signup")])
    plan = _explain(funnel_stages(ev, ("signup", "view")))
    # the subject walk is one fold, not a window or self-join
    assert "Window" not in plan.replace("WindowGroupLimit", "")
    assert "SortMergeJoin" not in plan


# --- cohort_retention -------------------------------------------------


def test_cohort_matrix(spark):
    # weeks of 2024-01: w0=Jan1, w1=Jan8, w2=Jan15 (Jan 1 is a Monday)
    rows = [
        ("a", datetime(2024, 1, 2)), ("a", datetime(2024, 1, 16)),
        ("b", datetime(2024, 1, 3)),
        ("c", datetime(2024, 1, 9)), ("c", datetime(2024, 1, 15)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = cohort_retention(ev)
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["n_users"],
            r["retention"],
        )
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 2): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
        ("2024-01-08", 1): (1, 1.0),
    }


def test_cohort_multiple_events_one_week_dedup(spark):
    rows = [
        ("a", datetime(2024, 1, 2)),
        ("a", datetime(2024, 1, 4)),  # same week — counted once
        ("a", datetime(2024, 1, 10)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        r["week_offset"]: r["n_users"] for r in cohort_retention(ev).collect()
    }
    assert got == {0: 1, 1: 1}


# --- registry parity (the driver's own compare, at sf0.001) ------------


def test_b10_queries_match_oracles(spark):
    from conftest import SF_SMALL, compare_query

    for name in (
        "triangle_stats",
        "weighted_sample",
        "funnel_stages",
        "cohort_retention",
    ):
        compare_query(spark, name, SF_SMALL)
