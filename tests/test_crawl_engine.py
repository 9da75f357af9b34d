"""End-to-end crawl engine tests: ordering parity vs the straight-line
simulator, URL-seen set equality, byte-identical extracted pages,
error routing, robots refusal, and no-URL-fetched-twice."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from legislation_scraper_spark.plans.simulator import SimWorld, simulate
from legislation_scraper_spark.synth import (
    DISALLOWED_SOURCE,
    host_of,
    synth_world,
)
from legislation_scraper_spark.tables import Catalog

N_SOURCES = 6
DOCS = 25


@pytest.fixture(scope="module")
def world(spark):
    w = synth_world(
        spark, seed=7, docs_per_source=DOCS, skew=3,
        n_sources=N_SOURCES, partitions=8, budget_base=6,
    )
    return {k: v.cache() for k, v in w.items()}


@pytest.fixture(scope="module")
def sim_result(world):
    pages = {
        r["url"]: bytes(r["html"])
        for r in world["pages_raw"].select("url", "html").collect()
    }
    robots = {
        r["host"]: {"allow": r["allow"], "max_parallel": r["max_parallel"]}
        for r in world["robots"].collect()
    }
    seeds = [r.asDict() for r in world["seeds"].collect()]
    return simulate(SimWorld(pages, robots, seeds), max_rounds=60)


@pytest.fixture(scope="module")
def engine_result(spark, world, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("crawlstore")))
    eng = CrawlEngine(
        spark, cat, world["pages_raw"], world["seeds"], world["robots"],
        CrawlConfig(n_shards=16, fetch_partitions=8),
    )
    rounds = eng.run(max_rounds=60)
    return eng, rounds


def test_visit_order_matches_simulator(engine_result, sim_result):
    eng, _ = engine_result
    log = eng.crawl_log.read()
    got = sorted(
        (r["round"], r["host"], r["host_rank"], r["canon_url"], r["fetched"])
        for r in log.collect()
    )
    want = sorted(sim_result.visit_log)
    assert len(got) == len(want), f"{len(got)} visits vs {len(want)}"
    assert got == want


def test_seen_set_matches_simulator(engine_result, sim_result):
    eng, _ = engine_result
    seen = {
        r["canon_url"] for r in eng.seen.df().select("canon_url").collect()
    }
    assert seen == sim_result.seen


def test_extracted_pages_byte_identical(engine_result, sim_result, world):
    eng, _ = engine_result
    pages = eng.pages.read()
    got = {
        r["document_url"]: r["text_markdown"]
        for r in pages.select("document_url", "text_markdown").collect()
    }
    assert got == sim_result.pages
    # and equal to the golden text column per URL
    gold = dict(
        world["pages_raw"].filter(~F.col("url").contains("/busca"))
        .select("url", "text").collect()
    )
    for u, t in got.items():
        assert gold[u] == t


def test_errors_match_simulator(engine_result, sim_result):
    eng, _ = engine_result
    errs = eng.errors.read()
    got = {r["canon_url"]: r["error"] for r in errs.collect()}
    assert got == sim_result.errors


def test_no_url_fetched_twice(engine_result):
    eng, _ = engine_result
    log = eng.crawl_log.read()
    dup = (
        log.groupBy("canon_url").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_robots_disallowed_never_fetched(engine_result):
    eng, _ = engine_result
    bad_host = host_of(DISALLOWED_SOURCE)
    log = eng.crawl_log.read()
    assert log.filter(F.col("host") == bad_host).count() == 0


def test_frontier_drained(engine_result, world):
    """Every allowed URL in the world ends up attempted exactly once."""
    eng, rounds = engine_result
    assert rounds[-1]["selected"] == 0
    state = eng.frontier_state()
    n_pending = state.filter(F.col("state") == "pending").count()
    # only disallowed-host URLs may remain pending
    bad_host = host_of(DISALLOWED_SOURCE)
    leftovers = state.filter(
        (F.col("state") == "pending") & (F.col("host") != bad_host)
    ).count()
    assert leftovers == 0, f"{n_pending} pending, {leftovers} not disallowed"


def test_lineage_recorded(engine_result):
    eng, _ = engine_result
    snap = eng.pages.snapshot()
    assert snap is not None and snap.lineage, "pages lineage missing"
    # lineage keys are 'type|situation' partition values
    assert any("|" in k for k in snap.lineage)
