"""Cuckoo filter: no false negatives, deletion, FPP sanity, SeenSet parity."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from legislation_scraper_spark.operators.cuckoo import (
    build_table,
    delete_from_table,
    n_buckets_for,
    probe_table,
)


def _keys(seed: int, n: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n).astype(np.uint64)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 3000))
@example(seed=0, n=115)  # hypothesis-discovered failure, pinned
def test_no_false_negatives(seed, n):
    keys = np.unique(_keys(seed, n))
    m = n_buckets_for(len(keys))
    blob = build_table(keys, m)
    assert probe_table(blob, keys, m).all()


def test_false_positive_rate_sane():
    keys = np.unique(_keys(1, 50_000))
    m = n_buckets_for(len(keys))
    blob = build_table(keys, m)
    others = np.setdiff1d(np.unique(_keys(2, 50_000)), keys)
    fpp = probe_table(blob, others, m).mean()
    assert fpp < 0.01, fpp  # theoretical ≈ 2·4/2^16 ≈ 0.00012


def test_deletion_removes_membership():
    keys = np.unique(_keys(3, 2000))
    m = n_buckets_for(len(keys))
    blob = build_table(keys, m)
    gone, kept = keys[:500], keys[500:]
    blob2 = delete_from_table(blob, gone, m)
    # kept keys still present (no false negatives survive deletion)
    assert probe_table(blob2, kept, m).all()
    # deleted keys mostly absent (a residue can remain only via another
    # key sharing (bucket, fingerprint) — rare)
    assert probe_table(blob2, gone, m).mean() < 0.05


def test_shard_congruent_keys_build_at_sized_m():
    """Keys all congruent mod n_shards (= the real per-shard distribution:
    shard = pmod(url_hash, 64) pins the low 6 bits).  Before the _bucket1
    remix, only m/64 buckets were reachable and the sized-m build failed;
    now the first construction must succeed at n_buckets_for's m."""
    n_shards = 64
    rng = np.random.RandomState(7)
    keys = (rng.randint(0, 2**57, size=20_000).astype(np.uint64)
            * np.uint64(n_shards) + np.uint64(5))
    keys = np.unique(keys)
    m = n_buckets_for(len(keys))
    blob = build_table(keys, m)  # must not raise at the sized m
    assert probe_table(blob, keys, m).all()
    # occupancy spread: i1 buckets actually reachable across most of m
    from legislation_scraper_spark.operators.cuckoo import _bucket1

    used = len(np.unique(_bucket1(keys, m)))
    assert used > m // 2, f"only {used}/{m} i1 buckets reachable"


def test_seenset_cuckoo_matches_bloom(spark, tmp_path):
    from pyspark.sql import functions as F

    from legislation_scraper_spark.operators.seen import SeenSet
    from legislation_scraper_spark.tables import Catalog

    urls = [(f"https://h{i % 7}.example/p{i}",) for i in range(500)]
    df = spark.createDataFrame(urls, "url string")
    seen_urls = df.filter(F.xxhash64("url") % 3 == 0)

    results = {}
    for kind in ("bloom", "cuckoo"):
        cat = Catalog(spark, str(tmp_path / kind))
        ss = SeenSet(cat.table("seen"), n_shards=8, filter_kind=kind)
        ss.add(seen_urls, "url")
        unseen = ss.filter_unseen(df, "url")
        results[kind] = sorted(r["url"] for r in unseen.select("url").collect())
    assert results["bloom"] == results["cuckoo"]
    assert 0 < len(results["bloom"]) < len(urls)
