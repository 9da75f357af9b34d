"""Round-4 batch-9 operators: winnowing fingerprints, incremental
corpus dedup, politeness fetch schedule, consistent-hash worker
assignment, MAD outlier gate, link reciprocity."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from legislation_scraper_spark.functions.text import winnow_fingerprints
from legislation_scraper_spark.operators.curation import mad_outlier_report
from legislation_scraper_spark.operators.dedup import incremental_minhash_dedup
from legislation_scraper_spark.operators.graph import reciprocity
from legislation_scraper_spark.operators.politeness import (
    build_hash_ring,
    consistent_assign,
    fetch_schedule,
)


def _fps(spark, text, k=3, w=4):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        winnow_fingerprints(F.col("text"), k=k, w=w).alias("f")
    ).collect()[0]["f"]


# --- winnowing fingerprints -------------------------------------------


def test_winnow_empty_and_short(spark):
    assert _fps(spark, "") == []
    assert _fps(spark, "um dois") == []  # < k words -> no shingles


def test_winnow_single_window(spark):
    # exactly k words -> 1 shingle hash, fewer than w -> global min
    fps = _fps(spark, "um dois tres")
    h = hashlib.md5(b"um dois tres").hexdigest()[:16]
    assert fps == [h]


def test_winnow_guarantee_shared_run(spark):
    # Schleimer guarantee: a shared token run of >= w+k-1 tokens gives
    # at least one shared fingerprint between the two documents.
    run = "alfa beta gama delta epsilon zeta"  # 6 = w+k-1 tokens
    a = _fps(spark, "prefixo unico aqui " + run)
    b = _fps(spark, run + " sufixo totalmente diferente agora")
    assert set(a) & set(b)


def test_winnow_sorted_distinct(spark):
    fps = _fps(spark, " ".join(f"w{i % 5}" for i in range(40)))
    assert fps == sorted(set(fps))


def test_winnow_density(spark):
    # winnowing keeps ~2/(w+1) of shingle hashes, far fewer than all
    text = " ".join(f"tok{i}" for i in range(200))
    fps = _fps(spark, text)
    n_shingles = 198
    assert 0 < len(fps) < n_shingles / 2


# --- incremental minhash dedup ----------------------------------------


def test_incremental_dedup_flags_near_copy(spark):
    base = (
        "lei que dispõe sobre o transporte coletivo urbano e dá "
        "outras providências relevantes ao município"
    )
    old = spark.createDataFrame(
        [(1, base), (2, "texto antigo completamente distinto dos demais "
                        "aqui presente nesta coleção")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " fim"),  # near-copy of old #1
            (11, "assunto novo sem qualquer relação com o corpus velho "
                 "existente até agora"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["is_dup"] for r in
           incremental_minhash_dedup(new, old).collect()}
    assert got[10] is True
    assert got[11] is False
    assert set(got) == {10, 11}  # old ids never returned


def test_incremental_dedup_short_docs_dropped(spark):
    old = spark.createDataFrame([(1, "so duas")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "um")], "doc_id long, text string")
    assert incremental_minhash_dedup(new, old).count() == 0


# --- fetch schedule ----------------------------------------------------


def test_fetch_schedule_slots(spark):
    # host a: 3 urls, 400ms delay -> starts 0, 400, 800 (all slot 0)
    # host b: 2 urls, 1500ms delay -> starts 0, 1500 (slots 0 and 1)
    fr = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)],
        "host string, doc_id long",
    )
    delay = F.when(F.col("host") == "a", 400).otherwise(1500).cast("bigint")
    rows = {r["slot"]: r for r in
            fetch_schedule(fr, delay, order_cols=("doc_id",)).collect()}
    assert rows[0]["n_fetches"] == 4 and rows[0]["n_hosts"] == 2
    assert rows[1]["n_fetches"] == 1 and rows[1]["n_hosts"] == 1


# --- consistent-hash assignment ----------------------------------------


def _ring_assign(host, ring):
    h = hashlib.md5(host.encode()).hexdigest()
    for p, w in ring:
        if p >= h:
            return w
    return ring[0][1]


def test_consistent_assign_matches_reference(spark):
    hosts = [f"host{i}.example" for i in range(50)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["assigned_worker"]
           for r in consistent_assign(df, n_workers=8).collect()}
    ring = build_hash_ring(8, 16)
    for h in hosts:
        assert got[h] == _ring_assign(h, ring)


def test_consistent_assign_minimal_remap(spark):
    # adding a 9th worker must only move hosts, never shuffle the ones
    # whose ring point is unchanged — and should move roughly 1/9.
    hosts = [f"site{i}.gov.br" for i in range(200)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    a8 = {r["host"]: r["assigned_worker"]
          for r in consistent_assign(df, n_workers=8).collect()}
    a9 = {r["host"]: r["assigned_worker"]
          for r in consistent_assign(df, n_workers=9).collect()}
    moved = sum(1 for h in hosts if a8[h] != a9[h])
    # every move must be TO the new worker 8 (ring points of workers
    # 0..7 are identical in both rings)
    assert all(a9[h] == 8 for h in hosts if a8[h] != a9[h])
    assert moved < len(hosts) * 0.35  # ~1/9 expected, generous bound


def test_consistent_assign_no_shuffle(spark):
    df = spark.createDataFrame([("x",)], "host string")
    plan = consistent_assign(df, 4)._jdf.queryExecution().toString()
    assert "Exchange" not in plan


# --- MAD outliers -------------------------------------------------------


def test_mad_outlier_report(spark):
    # group g: tight cluster + one wild point -> 1 outlier
    # group c: constant values -> MAD 0 -> 0 outliers (no div-by-zero)
    rows = [("g", float(v)) for v in (10, 11, 12, 11, 10, 12, 500)]
    rows += [("c", 7.0)] * 5
    df = spark.createDataFrame(rows, "source string, v double")
    got = {r["source"]: r
           for r in mad_outlier_report(df, F.col("v")).collect()}
    assert got["g"]["n_outliers"] == 1 and got["g"]["med"] == 11.0
    assert got["c"]["n_outliers"] == 0 and got["c"]["mad"] == 0.0


# --- reciprocity ---------------------------------------------------------


def test_reciprocity(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
        "src string, dst string",
    )
    got = {r["node"]: r for r in reciprocity(e).collect()}
    # self-loop dropped, duplicate edge deduped
    assert got["a"]["out_deg"] == 2 and got["a"]["n_recip"] == 1
    assert abs(got["a"]["reciprocity"] - 0.5) < 1e-9
    assert got["b"]["out_deg"] == 1 and got["b"]["reciprocity"] == 1.0
    assert "c" not in got or got["c"]["out_deg"] == 0
