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


def test_salting_defeats_host_skew(spark):
    """North-rule skew evidence: a mega-host (100× the others) must not
    land in one fetch partition.  Salted repartition bounds the largest
    partition near the mean; plain host-hash partitioning puts the whole
    mega-host in one partition."""
    from pyspark.sql import functions as F

    from legislation_scraper_spark.functions.urls import salted_host

    rows = [("mega.example", f"https://mega.example/p{i}") for i in range(8000)]
    for h in range(10):
        rows += [
            (f"small{h}.example", f"https://small{h}.example/p{i}")
            for i in range(80)
        ]
    df = spark.createDataFrame(rows, "host string, canon_url string")
    n_parts = 16

    def sizes(d):
        return [
            r["cnt"]
            for r in d.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        ]

    plain = sizes(df.repartition(n_parts, F.col("host")))
    # salt buckets scale with parallelism (CrawlConfig.salt_buckets=cores
    # in bench): ≥ 2× the partition count spreads a mega-host finely
    salted = sizes(
        df.repartition(
            n_parts, salted_host(F.col("host"), F.col("canon_url"), 32)
        )
    )
    total = len(rows)
    # plain host partitioning: the mega-host's 8000 rows share one partition
    assert max(plain) >= 8000
    # salted: largest partition within 3× the ideal mean
    assert max(salted) <= 3 * total / n_parts, (max(salted), total / n_parts)
    # salting preserves host affinity upstream invariants: every row kept
    assert sum(salted) == total


def test_range_rank_equals_window_rank(spark):
    """Skew-safe range-partitioned ranking must reproduce the window
    rank EXACTLY on a skewed candidate set (mega-host + small hosts),
    including the (priority, discovered_round, canon_url) tie order."""
    cand = _candidates(
        spark, {"mega.example": 900, "a.example": 40, "b.example": 7}
    )
    w = {
        (r["host"], r["canon_url"]): r["host_rank"]
        for r in politeness.rank_per_host(cand).collect()
    }
    g = {
        (r["host"], r["canon_url"]): r["host_rank"]
        for r in politeness.rank_per_host_range(cand, partitions=7).collect()
    }
    assert w == g
    assert max(v for (h, _), v in g.items() if h == "mega.example") == 900


def test_schedule_round_range_impl_equals_window(spark):
    """The full politeness pass must select the same rows with either
    rank implementation."""
    cand = _candidates(spark, {"mega.example": 300, "a.example": 11})
    robots = _robots(
        spark,
        [("mega.example", True, 0, 5), ("a.example", True, 0, 3)],
    )
    key = lambda r: (r["host"], r["canon_url"], r["host_rank"])  # noqa: E731
    a = sorted(
        map(key, politeness.schedule_round(cand, robots).collect())
    )
    b = sorted(
        map(
            key,
            politeness.schedule_round(
                cand, robots, rank_impl="range"
            ).collect(),
        )
    )
    assert a == b and len(a) == 8


def test_allocate_budgets_sums_exactly_and_breaks_ties(spark):
    from legislation_scraper_spark.operators.politeness import (
        allocate_budgets,
    )

    hosts = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0)], "host string, weight double"
    )
    # 10/3: base 3 each, leftover 1 → equal fracs, host asc tie → 'a'
    got = {
        r["host"]: r["budget"]
        for r in allocate_budgets(hosts, 10).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 3}
    assert sum(got.values()) == 10
    # proportionality: weights 3:1 over B=8 → 6 and 2 exactly
    h2 = spark.createDataFrame(
        [("x", 3.0), ("y", 1.0)], "host string, weight double"
    )
    got2 = {
        r["host"]: r["budget"] for r in allocate_budgets(h2, 8).collect()
    }
    assert got2 == {"x": 6, "y": 2}
    # zero mass → all zero (no invented split)
    h0 = spark.createDataFrame(
        [("x", 0.0), ("y", 0.0)], "host string, weight double"
    )
    assert {
        r["budget"] for r in allocate_budgets(h0, 5).collect()
    } == {0}
    # empty input → empty output
    assert allocate_budgets(h0.filter("1=0"), 5).collect() == []


def test_ip_politeness_caps_shared_address(spark):
    """Many hostnames md5-resolve onto few addresses; the budget binds
    per ADDRESS: per-ip admitted ≤ budget, every frontier row of an
    under-budget ip is admitted, and ip octets match the straight-line
    hashlib computation."""
    import hashlib

    rows = [
        (f"https://h{i}.br/doc/{j}", f"h{i}.br", j % 3, i * 100 + j)
        for i in range(12)
        for j in range(8)
    ]
    fr = spark.createDataFrame(
        rows, "url string, host string, priority int, doc_id long"
    )
    sel = politeness.schedule_by_ip(fr, per_ip_budget=10, n_ips=4)
    got = sel.collect()

    def ip_of(host: str) -> str:
        h = int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % 4
        return f"10.0.{h // 256}.{h % 256}"

    for r in got:
        assert r["ip"] == ip_of(r["host"])
    per_ip_total: dict[str, int] = {}
    for _u, host, _p, _d in rows:
        per_ip_total[ip_of(host)] = per_ip_total.get(ip_of(host), 0) + 1
    per_ip_sel: dict[str, int] = {}
    for r in got:
        per_ip_sel[r["ip"]] = per_ip_sel.get(r["ip"], 0) + 1
    for ip, total in per_ip_total.items():
        assert per_ip_sel.get(ip, 0) == min(total, 10)
    assert all(r["ip_rank"] <= 10 for r in got)


def test_ip_politeness_empty_frontier(spark):
    fr = spark.createDataFrame(
        [], "url string, host string, priority int, doc_id long"
    )
    assert politeness.schedule_by_ip(fr, per_ip_budget=5).count() == 0
