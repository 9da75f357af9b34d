"""Politeness semantics: per-host budgets, crawl-delay caps, robots."""

from __future__ import annotations

import pyspark.sql.functions as F

from legislation_scraper_spark.operators import politeness
from legislation_scraper_spark.operators.seen import with_url_key


def _candidates(spark, hosts: dict[str, int]):
    rows = []
    for h, n in hosts.items():
        for i in range(n):
            rows.append((f"https://{h}/doc/{i}", h, i % 3, 0))
    df = spark.createDataFrame(
        rows, "url string, host string, priority int, discovered_round int"
    )
    return with_url_key(df, "url", 8)


def _robots(spark, rows):
    return spark.createDataFrame(
        rows, "host string, allow boolean, crawl_delay_ms long, max_parallel int"
    )


def test_budget_respected_per_host(spark):
    cand = _candidates(spark, {"a.br": 20, "b.br": 5})
    robots = _robots(spark, [("a.br", True, 1000, 3), ("b.br", True, 1000, 10)])
    sel = politeness.schedule_round(cand, robots)
    got = {r["host"]: r["cnt"] for r in
           sel.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"a.br": 3, "b.br": 5}


def test_crawl_delay_caps_budget(spark):
    cand = _candidates(spark, {"a.br": 50, "b.br": 50})
    robots = _robots(
        spark,
        [("a.br", True, 2000, 30),   # 60s window / 2s delay → cap 30→30... 30
         ("b.br", True, 10_000, 30)],  # 60s / 10s → cap 6
    )
    sel = politeness.schedule_round(
        cand, robots, round_window_ms=60_000
    )
    got = {r["host"]: r["cnt"] for r in
           sel.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"a.br": 30, "b.br": 6}
    # without a window, only max_parallel binds
    sel2 = politeness.schedule_round(cand, robots)
    got2 = {r["host"]: r["cnt"] for r in
            sel2.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert got2 == {"a.br": 30, "b.br": 30}


def test_disallowed_host_dropped(spark):
    cand = _candidates(spark, {"a.br": 5, "bad.br": 5})
    robots = _robots(spark, [("a.br", True, 0, 10), ("bad.br", False, 0, 10)])
    sel = politeness.schedule_round(cand, robots)
    hosts = {r["host"] for r in sel.select("host").distinct().collect()}
    assert hosts == {"a.br"}


def test_rank_order_deterministic(spark):
    cand = _candidates(spark, {"a.br": 10})
    robots = _robots(spark, [("a.br", True, 0, 4)])
    sel = politeness.schedule_round(cand, robots).orderBy("host_rank")
    urls = [r["canon_url"] for r in sel.select("canon_url").collect()]
    # order: priority asc (i%3), then canon_url asc
    want = sorted(
        (i % 3, f"https://a.br/doc/{i}") for i in range(10)
    )[:4]
    assert urls == [u for _, u in want]
