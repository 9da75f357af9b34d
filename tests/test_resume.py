"""Checkpoint/resume: kill after round k (including torn mid-round
state), restart from the catalog, and the final tables must equal an
uninterrupted run's (SURVEY.md §5 test 3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from legislation_scraper_spark.synth import synth_world
from legislation_scraper_spark.tables import Catalog

CFG = CrawlConfig(n_shards=8, fetch_partitions=4)


@pytest.fixture(scope="module")
def world(spark):
    w = synth_world(
        spark, seed=11, docs_per_source=12, skew=2, n_sources=3,
        partitions=4, budget_base=5,
    )
    return {k: v.cache() for k, v in w.items()}


def _mk_engine(spark, world, root):
    return CrawlEngine(
        spark, Catalog(spark, root),
        world["pages_raw"], world["seeds"], world["robots"], CFG,
    )


def _table_rows(eng, name, cols):
    df = eng.catalog.table(name).read()
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_resume_equals_uninterrupted(spark, world, tmp_path):
    # Uninterrupted reference run
    a = _mk_engine(spark, world, str(tmp_path / "a"))
    a.run(max_rounds=40)

    # Interrupted run: 3 rounds, then a *torn* extra commit (crash mid
    # round: pages appended but checkpoint never written), then resume.
    b1 = _mk_engine(spark, world, str(tmp_path / "b"))
    b1.bootstrap()
    for r in range(3):
        b1.round(r)
    junk = world["pages_raw"].limit(5).select(
        F.col("url").alias("document_url"),
        F.lit("junk").alias("source"),
        F.lit("t").alias("title"),
        F.lit(0).alias("year"),
        F.lit("Lei").alias("type"),
        F.lit("x").alias("situation"),
        F.lit("s").alias("summary"),
        F.lit("torn").alias("text_markdown"),
        F.lit(99).alias("fetched_round"),
    )
    b1.pages.append(junk, partition_cols=["type", "situation"])

    b2 = _mk_engine(spark, world, str(tmp_path / "b"))
    start = b2.resume()
    # checkpoints 0..3 survive (bootstrap + rounds 0-2) → next round is 3
    assert start == 3
    # torn append rolled back
    assert b2.pages.read().filter(
        F.col("text_markdown") == "torn"
    ).count() == 0
    b2.run(max_rounds=40)

    for name, cols in [
        ("pages", ("document_url", "text_markdown", "type", "situation")),
        ("seen", ("canon_url",)),
        ("crawl_log", ("round", "host", "host_rank", "canon_url", "fetched")),
        ("fetch_errors", ("canon_url", "error")),
    ]:
        assert _table_rows(a, name, cols) == _table_rows(b2, name, cols), name


def test_bucketed_overwrite_crash_safety(spark, tmp_path):
    """BucketedLog.overwrite orders rename-in BEFORE delete-old (r3
    ADVICE): a lost manifest claim rolls the renames back and leaves
    the previous snapshot byte-identical; stray un-manifested files
    (the crash-between-rename-and-claim window) are invisible to
    read()."""
    import os

    from legislation_scraper_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "store"))
    log = cat.bucketed_log("t", "k", 4)
    df1 = spark.range(100).select(
        F.col("id").cast("string").alias("k"), F.lit("v1").alias("val")
    )
    log.append(df1)
    before_files = sorted(log._data_files())
    before_rows = sorted(
        (r.k, r.val) for r in log.read().collect()
    )

    df2 = spark.range(50).select(
        F.col("id").cast("string").alias("k"), F.lit("v2").alias("val")
    )

    # lost claim → overwrite must raise AND roll its renames back
    real_claim = log._claim_version
    log._claim_version = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("claim lost")
    )
    with pytest.raises(RuntimeError, match="claim lost"):
        log.overwrite(df2)
    log._claim_version = real_claim

    assert sorted(log._data_files()) == before_files, "renames not rolled back"
    assert sorted((r.k, r.val) for r in log.read().collect()) == before_rows

    # crash window: files renamed in, claim never happened — simulate
    # by dropping a stray parquet into data_dir; read() must ignore it
    stray = os.path.join(log.data_dir, "part-99999-deadbeef_00001.parquet")
    df2.limit(1).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    src = next(
        f for f in os.listdir(str(tmp_path / "stray"))
        if f.startswith("part-")
    )
    os.rename(str(tmp_path / "stray" / src), stray)
    assert sorted((r.k, r.val) for r in log.read().collect()) == before_rows
    os.remove(stray)

    # successful overwrite replaces content and prunes replaced files
    log.overwrite(df2)
    assert sorted((r.k, r.val) for r in log.read().collect()) == sorted(
        (str(i), "v2") for i in range(50)
    )
    assert not (set(before_files) & log._data_files()), "old files not pruned"
