"""Streaming crawl loop, watermarked window aggs, offline dataset build."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from legislation_scraper_spark.plans.dataset_build import build_dataset
from legislation_scraper_spark.streaming.crawl_stream import (
    stream_crawl,
    windowed_fetch_metrics,
)
from legislation_scraper_spark.synth import synth_world
from legislation_scraper_spark.tables import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world(spark):
    w = synth_world(
        spark, seed=3, docs_per_source=10, skew=2, n_sources=3,
        partitions=4, budget_base=8,
    )
    return {k: v.cache() for k, v in w.items()}


def test_streaming_crawl_equals_batch(spark, world, tmp_path):
    batch_eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "batch")),
        world["pages_raw"], world["seeds"], world["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    batch_eng.run(max_rounds=30)

    stream_eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "stream")),
        world["pages_raw"], world["seeds"], world["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    metrics = stream_crawl(spark, stream_eng, tick_seconds=1, max_rounds=30)
    assert metrics and metrics[-1]["selected"] == 0

    def rows(eng, name, cols):
        df = eng.catalog.table(name).read()
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    for name, cols in [
        ("pages", ("document_url", "text_markdown")),
        ("crawl_log", ("round", "host", "host_rank", "canon_url")),
    ]:
        assert rows(batch_eng, name, cols) == rows(stream_eng, name, cols)


def test_windowed_metrics_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    # stream the driver-provided events table through a file source
    batch = spark.read.parquet(f"{SF}/events.parquet")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = windowed_fetch_metrics(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM winagg").collect()
    want = (
        batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("val_sum"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt",
                "val_sum")
        .collect()
    )
    assert sorted(map(repr, got)) == sorted(map(repr, want))


def test_dataset_build(spark, world, tmp_path):
    eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "ds")),
        world["pages_raw"], world["seeds"], world["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    eng.run(max_rounds=30)
    pages = eng.pages.read()
    ds = build_dataset(pages)
    rows = ds.collect()
    assert len(rows) == pages.select("document_url").distinct().count()
    cols = set(ds.columns)
    assert {"document_url", "text", "year", "type", "situation",
            "n_tokens", "quality", "lang_pred", "fingerprint"} <= cols
    for r in rows[:20]:
        assert r["n_tokens"] > 0 and 0 <= r["quality"] <= 1
        assert len(r["fingerprint"]) == 32


def test_hf_layout_export(spark, world, tmp_path):
    """S20 twin: the export directory is a loadable HF dataset repo —
    train-XXXXX-of-NNNNN shards under data/, dataset_infos.json whose
    split sizes equal the parquet footers, a card with the YAML config
    header — and reading the shards back reproduces build_dataset."""
    import json
    import os

    from legislation_scraper_spark.plans.dataset_build import (
        export_hf_layout,
    )

    eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "hf")),
        world["pages_raw"], world["seeds"], world["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    eng.run(max_rounds=30)
    pages = eng.pages.read()
    out = str(tmp_path / "hf_repo")
    split = export_hf_layout(pages, out, shard_rows=10)

    files = sorted(os.listdir(os.path.join(out, "data")))
    n = len(files)
    assert files == [f"train-{i:05d}-of-{n:05d}.parquet" for i in range(n)]
    assert n >= 2  # shard_rows small enough to force multiple shards
    info = json.load(open(os.path.join(out, "dataset_infos.json")))
    tr = info["default"]["splits"]["train"]
    assert tr == split and tr["num_shards"] == n
    expect = build_dataset(pages)
    assert tr["num_examples"] == expect.count()
    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == tr["num_examples"]
    assert set(got.columns) == set(expect.columns)
    card = open(os.path.join(out, "README.md")).read()
    assert card.startswith("---\n") and "data/train-*" in card


def test_streaming_crawl_multihop_bfs(spark, tmp_path):
    """VERDICT r3 item 8: the foreachBatch loop must SUSTAIN BFS — many
    micro-batches of frontier growth + seen-set feedback on a ≥3-hop
    world (next-link pagination chains reach depth ≥3 before the last
    docs are discovered), not just drain a one-shot frontier.  Equality
    with the batch engine on pages + crawl ordering is the contract."""
    w = synth_world(
        spark, seed=19, docs_per_source=35, skew=2, n_sources=2,
        partitions=4, budget_base=2,  # small budgets → many rounds
    )
    w = {k: v.cache() for k, v in w.items()}

    batch_eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "batch")),
        w["pages_raw"], w["seeds"], w["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    batch_rounds = batch_eng.run(max_rounds=60)

    stream_eng = CrawlEngine(
        spark, Catalog(spark, str(tmp_path / "stream")),
        w["pages_raw"], w["seeds"], w["robots"],
        CrawlConfig(n_shards=8, fetch_partitions=4),
    )
    metrics = stream_crawl(spark, stream_eng, tick_seconds=1, max_rounds=60)

    # multi-round BFS actually happened: >3 productive micro-batches,
    # frontier GREW mid-stream (discoveries beyond the seed set), and
    # the world is ≥3 hops deep
    productive = [m for m in metrics if m["selected"] > 0]
    assert len(productive) > 3
    assert any(m["new_urls"] > 0 for m in metrics[1:])
    depth = stream_eng.frontier.read().agg(F.max("depth")).first()[0]
    assert depth >= 3
    assert metrics[-1]["selected"] == 0  # drained

    def rows(eng, name, cols):
        df = eng.catalog.table(name).read()
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    for name, cols in [
        ("pages", ("document_url", "text_markdown")),
        ("crawl_log", ("round", "host", "host_rank", "canon_url")),
    ]:
        assert rows(batch_eng, name, cols) == rows(stream_eng, name, cols)
    # same number of productive rounds as the batch engine — the stream
    # sustains the SAME BFS schedule, round for round
    assert len(productive) == len(
        [m for m in batch_rounds if m["selected"] > 0]
    )
