"""Revisit-scheduling (change-rate estimation) + anchor-text tests.

Pins operators/revisit.py against a straight-line Python twin of the
Cho & Garcia-Molina estimator, covers the degenerate histories the
driver synth never produces (single capture, zero span, tie
timestamps), and asserts the anchor-text top-k executes as a map-side
WindowGroupLimit.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.graph import anchor_texts
from legislation_scraper_spark.operators.revisit import (
    change_rates,
    revisit_priorities,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "urlkey string, ts timestamp, digest string"
    )


T0 = datetime(2024, 1, 1)


def _caps(key, digests, step_days=1.0):
    return [
        (key, T0 + timedelta(days=i * step_days), d)
        for i, d in enumerate(digests)
    ]


def _lam(n, x, avg_days):
    return -math.log((n - x + 0.5) / (n + 0.5)) / avg_days


def test_change_rates_match_python_twin(spark):
    rows = (
        _caps("a", ["d0", "d0", "d0", "d0"])          # X=0
        + _caps("b", ["d0", "d1", "d2", "d3"], 2.0)   # X=n
        + _caps("c", ["d0", "d0", "d1", "d1"], 0.5)   # X=1
    )
    got = {
        r["urlkey"]: r
        for r in change_rates(_hist(spark, rows)).collect()
    }
    assert set(got) == {"a", "b", "c"}
    for key, x, avg in [("a", 0, 1.0), ("b", 3, 2.0), ("c", 1, 0.5)]:
        r = got[key]
        assert r["n_captures"] == 4 and r["n_changes"] == x
        assert r["span_secs"] == int(3 * avg * 86400)
        lam = _lam(3, x, avg)
        assert abs(r["lambda_per_day"] - round(lam, 6)) < 1e-9
        assert abs(r["staleness"] - round(1 - math.exp(-lam * 7), 6)) < 1e-9
    # the never-changing page has rate exactly... not 0 (bias-corrected
    # estimator keeps a floor) but the lowest of the three
    assert got["a"]["lambda_per_day"] < got["c"]["lambda_per_day"]
    assert got["b"]["staleness"] > got["c"]["staleness"]


def test_degenerate_histories_are_dropped(spark):
    rows = (
        _caps("single", ["d0"])                     # 1 capture: no info
        + [("zspan", T0, "d0"), ("zspan", T0, "d1")]  # zero span
        + _caps("ok", ["d0", "d1"])
    )
    got = change_rates(_hist(spark, rows))
    assert [r["urlkey"] for r in got.collect()] == ["ok"]


def test_tie_timestamps_order_by_digest_like_oracle(spark):
    # two captures at the SAME ts: array_sort orders (ts, digest) —
    # matching the oracle's ORDER BY epoch, digest — so the change
    # count is deterministic
    rows = [
        ("t", T0, "b"),
        ("t", T0, "a"),
        ("t", T0 + timedelta(days=1), "b"),
    ]
    r = change_rates(_hist(spark, rows)).collect()[0]
    # sorted digests at T0: a, b -> transitions a->b (change), b->b (no)
    assert r["n_changes"] == 1 and r["n_captures"] == 3


def test_revisit_priorities_topk_deterministic(spark):
    rows = []
    for i in range(20):
        # alternating all-change / no-change histories => two staleness
        # levels with ties inside each; tie-break is the key itself
        ds = ["d0", "d1", "d2"] if i % 2 == 0 else ["d0", "d0", "d0"]
        rows += _caps(f"k{i:02d}", ds)
    pri = revisit_priorities(
        change_rates(_hist(spark, rows)), budget=5, key="urlkey"
    ).collect()
    assert [r["urlkey"] for r in pri] == [
        "k00", "k02", "k04", "k06", "k08"
    ]
    assert all(pri[0]["staleness"] == r["staleness"] for r in pri)


def test_anchor_topk_count_order_and_tiebreak(spark):
    edges = spark.createDataFrame(
        [("s", "p", a) for a in ["x"] * 3 + ["y"] * 3 + ["z"] * 2 + ["w"]],
        "src string, dst string, anchor string",
    )
    got = anchor_texts(edges, k=3).orderBy("rnk").collect()
    assert [(r["anchor"], r["n_links"], r["rnk"]) for r in got] == [
        ("x", 3, 1),  # count tie with y -> anchor asc
        ("y", 3, 2),
        ("z", 2, 3),  # w (1 link) cut by k
    ]


def test_anchor_topk_is_window_group_limit(spark):
    from tests.test_plans import _explain

    edges = spark.createDataFrame(
        [("s", "p", "x")], "src string, dst string, anchor string"
    )
    plan = _explain(anchor_texts(edges, k=3))
    assert "WindowGroupLimit" in plan
