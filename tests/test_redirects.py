"""Redirect-chain resolution: pointer doubling vs a straight-line walk,
loop handling, hop exactness, and the BM25 retrieval companion."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from legislation_scraper_spark.operators.redirects import resolve_redirects


def _walk(edges: dict[str, str], src: str, max_hops: int):
    """Straight-line simulator: (final, hops, resolved) after at most
    max_hops steps."""
    cur, hops = src, 0
    while cur in edges and hops < max_hops:
        cur = edges[cur]
        hops += 1
    return cur, hops, cur not in edges


def _check(spark, edges: dict[str, str], max_hops: int = 32):
    df = spark.createDataFrame(
        list(edges.items()), "src string, dst string"
    )
    got = {
        r["src"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert set(got) == set(edges)
    for s in edges:
        final, hops, resolved = _walk(edges, s, max_hops)
        # hops starts at 1 for edge sources in both formulations
        assert got[s] == (final, hops, resolved), (s, got[s],
                                                   (final, hops, resolved))


def test_plain_chain_exact_hops(spark):
    # a → b → c → d (terminal): hops are exact chain lengths
    _check(spark, {"a": "b", "b": "c", "c": "d"})


def test_long_chain_saturates(spark):
    # 20-hop chain with max_hops=32: resolves with hops=20
    edges = {f"n{i}": f"n{i+1}" for i in range(20)}
    _check(spark, edges)


def test_chain_longer_than_cap_unresolved(spark):
    # 40-hop chain with max_hops=32: lands 32 steps in, unresolved
    edges = {f"n{i}": f"n{i+1}" for i in range(40)}
    _check(spark, edges, max_hops=32)


def test_pure_cycle_and_rho_tail(spark):
    # x ↔ y two-cycle plus a tail feeding it: all unresolved, landing
    # node determined by parity of max_hops — must match the
    # sequential walk exactly
    edges = {"x": "y", "y": "x", "t1": "t2", "t2": "x"}
    _check(spark, edges)


def test_self_loop(spark):
    _check(spark, {"s": "s", "a": "s"})


def test_max_hops_must_be_power_of_two(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=20)


def test_doubling_resolves_max_chain_in_log_rounds(spark):
    # max_hops=32 runs only log2(32)=5 join rounds; a 31-hop chain can
    # only resolve under 5 rounds if each round doubles the stride —
    # a step-by-step walk would need 31
    edges = {f"n{i}": f"n{i+1}" for i in range(31)}
    _check(spark, edges, max_hops=32)


def test_checkpoint_truncates_lineage(spark):
    # with checkpointing (the default) the final plan must NOT carry
    # the exponential self-join tree — only the last round's join and
    # the terminal-marking join survive
    df = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(10)],
        "src string, dst string",
    )
    out = resolve_redirects(df, max_hops=16)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    n_joins = sum(
        1 for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Join" in line
    )
    assert n_joins <= 2, plan


def test_bm25_matches_hand_computation(spark):
    from legislation_scraper_spark.operators.index import bm25_topk

    rows = [
        (0, "spark join merge spark"),
        (1, "merge merge merge window"),
        (2, "the quick fox"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["score"]
           for r in bm25_topk(df, ["spark", "merge"], k=10).collect()}

    def idf(dfreq, n=4):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    docs = {i: t.split() for i, t in rows}
    avgdl = sum(len(w) for w in docs.values()) / 4
    exp = {}
    for i, ws in docs.items():
        s = 0.0
        for term, dfreq in (("spark", 1), ("merge", 2)):
            tf = ws.count(term)
            s += idf(dfreq) * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)
            )
        if s > 0:
            exp[i] = round(s, 6)
    assert got.keys() == exp.keys()
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-6)


def test_bm25_plan_is_one_pass_topk(spark):
    from legislation_scraper_spark.operators.index import bm25_topk

    df = spark.createDataFrame(
        [(0, "spark"), (1, "merge")], "doc_id long, text string"
    )
    out = bm25_topk(df, ["spark", "merge"], k=5)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # partial top-k, no global Sort; stats side reaches the corpus by
    # broadcast, never by shuffle
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
