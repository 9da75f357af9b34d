"""Row-level table changes: Iceberg-style copy-on-write MERGE / DELETE.

Covers `Table.merge_upsert` / `Table.delete_where` (file-SET-level
pruning: only sets containing matched rows are rewritten) and
`BucketedLog.merge_upsert` (BUCKET-level pruning: affected buckets are
computed from the source keys' murmur3 hash, no probe scan at all).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from legislation_scraper_spark.tables import (
    BucketedLog,
    ConcurrentCommitError,
    Snapshot,
    Table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = Table(spark, str(tmp_path), "docs")
    t.append(spark.createDataFrame(
        [(1, "a", "old1"), (2, "b", "old2")], "id int, k string, v string"))
    t.append(spark.createDataFrame(
        [(3, "c", "old3"), (4, "d", "old4")], "id int, k string, v string"))
    t.append(spark.createDataFrame(
        [(5, "e", "old5")], "id int, k string, v string"))
    return t


def test_merge_updates_and_inserts(spark, table):
    src = spark.createDataFrame(
        [(3, "c", "NEW3"), (9, "z", "NEW9")], "id int, k string, v string")
    v0 = table.current_version()
    v = table.merge_upsert(src, ["id"])
    assert v == v0 + 1
    got = _rows(table.read())
    assert got == [
        (1, "a", "old1"), (2, "b", "old2"), (3, "c", "NEW3"),
        (4, "d", "old4"), (5, "e", "old5"), (9, "z", "NEW9"),
    ]
    assert table.approx_rows() == 6 == table.read().count()


def test_merge_rewrites_only_touched_sets(spark, table):
    before = table.snapshot()
    src = spark.createDataFrame([(3, "c", "NEW3")],
                                "id int, k string, v string")
    table.merge_upsert(src, ["id"])
    after = table.snapshot()
    carried = set(before.file_sets) & set(after.file_sets)
    # id=3 lives only in the second set: sets 1 and 3 must carry over
    # as the SAME directories (zero data movement), set 2 is replaced
    assert len(carried) == 2
    assert len(after.file_sets) == 3
    replaced = set(before.file_sets) - carried
    assert len(replaced) == 1
    # the replaced set held ids 3,4 — survivor 4 must still be present
    assert (4, "d", "old4") in _rows(table.read())


def test_merge_pure_insert_is_append_shaped(spark, table):
    before = table.snapshot()
    src = spark.createDataFrame([(100, "q", "new")],
                                "id int, k string, v string")
    table.merge_upsert(src, ["id"])
    after = table.snapshot()
    # no matched keys → every old set carries over, one new set appended
    assert set(before.file_sets) <= set(after.file_sets)
    assert len(after.file_sets) == len(before.file_sets) + 1
    assert table.approx_rows() == 6


def test_merge_time_travel_preserved(spark, table):
    v0 = table.current_version()
    src = spark.createDataFrame([(1, "a", "NEW1")],
                                "id int, k string, v string")
    table.merge_upsert(src, ["id"])
    old = _rows(table.read(version=v0))
    assert (1, "a", "old1") in old and len(old) == 5


def test_merge_schema_evolution(spark, table):
    src = spark.createDataFrame([(1, "a", "NEW1", 7)],
                                "id int, k string, v string, extra int")
    table.merge_upsert(src, ["id"])
    df = table.read()
    assert "extra" in df.columns
    got = {r["id"]: r["extra"] for r in df.collect()}
    assert got[1] == 7 and got[2] is None


def test_merge_conflict_detected(spark, table):
    stale = table.snapshot()
    table.append(spark.createDataFrame([(50, "x", "late")],
                                       "id int, k string, v string"))
    merged = table.read(version=stale.version).limit(1)
    with pytest.raises(ConcurrentCommitError):
        table._swap_sets(stale, [stale.file_sets[0]], merged, None)
    # failed swap must not leave a stray set claimable by later commits
    live = {s for v in table.versions()
            for s in table.snapshot(v).file_sets}
    on_disk = {os.path.join(table.data_dir, d)
               for d in os.listdir(table.data_dir)}
    assert on_disk == live


def test_delete_where(spark, table):
    v = table.delete_where(F.col("id").isin(3, 5))
    assert v is not None
    got = _rows(table.read())
    assert [r[0] for r in got] == [1, 2, 4]
    assert table.approx_rows() == 3 == table.read().count()


def test_delete_prunes_untouched_sets(spark, table):
    before = table.snapshot()
    table.delete_where("id = 5")  # third set only
    after = table.snapshot()
    carried = set(before.file_sets) & set(after.file_sets)
    assert len(carried) == 2
    # set 3 held only id=5 → its replacement is empty: zero-row parquet
    # dirs are dropped by footer lineage, so file_sets may be 2 or 3
    assert table.read().count() == 4


def test_delete_no_match_is_noop(spark, table):
    v0 = table.current_version()
    assert table.delete_where("id = 999") is None
    assert table.current_version() == v0


def test_delete_null_predicate_rows_kept(spark, tmp_path):
    t = Table(spark, str(tmp_path), "nulls")
    t.append(spark.createDataFrame(
        [(1, "x"), (2, None), (3, "kill")], "id int, tag string"))
    t.delete_where(F.col("tag") == "kill")
    got = _rows(t.read())
    assert [r[0] for r in got] == [1, 2]  # NULL-tag row survives


# -- BucketedLog ------------------------------------------------------------


@pytest.fixture()
def blog(spark, tmp_path):
    lg = BucketedLog(spark, str(tmp_path), "state",
                     bucket_col="url", n_buckets=8)
    urls = [(f"https://h{i % 5}.leg.br/doc/{i}", i, "seen")
            for i in range(64)]
    lg.append(spark.createDataFrame(urls, "url string, n int, st string"))
    return lg


def test_blog_merge_updates_and_inserts(spark, blog):
    src = spark.createDataFrame(
        [("https://h0.leg.br/doc/0", 0, "FETCHED"),
         ("https://hx.leg.br/new", 999, "NEW")],
        "url string, n int, st string")
    total0 = blog.approx_rows()
    blog.merge_upsert(src)
    d = {r["url"]: r["st"] for r in blog.read().collect()}
    assert d["https://h0.leg.br/doc/0"] == "FETCHED"
    assert d["https://hx.leg.br/new"] == "NEW"
    assert d["https://h1.leg.br/doc/1"] == "seen"
    assert blog.approx_rows() == total0 + 1 == blog.read().count()


def test_blog_merge_rewrites_only_affected_buckets(spark, blog):
    src = spark.createDataFrame([("https://h0.leg.br/doc/0", 0, "F")],
                                "url string, n int, st string")
    n_bucket = spark.createDataFrame([("https://h0.leg.br/doc/0",)],
                                     "url string").select(
        F.pmod(F.hash("url"), F.lit(8)).alias("b")).collect()[0]["b"]
    before = set(blog.snapshot().file_sets)
    blog.merge_upsert(src)
    after = set(blog.snapshot().file_sets)
    replaced, added = before - after, after - before
    # exactly the one affected bucket's file is rewritten
    assert len(replaced) == 1 and len(added) == 1

    def bucket_of(f):
        return int(f.partition(".")[0].rsplit("_", 1)[1])

    assert {bucket_of(f) for f in replaced} == {n_bucket}
    assert {bucket_of(f) for f in added} == {n_bucket}
    # replaced files are gone from disk (bucketed-read contract)
    assert after == blog._data_files()


def test_blog_merge_read_stays_bucketed(spark, blog):
    src = spark.createDataFrame([("https://h1.leg.br/doc/1", 1, "F")],
                                "url string, n int, st string")
    blog.merge_upsert(src)
    plan = (blog.read().groupBy("url").count()
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_randomized_merge_delete_matches_model(spark, tmp_path):
    """Randomized op-sequence equivalence: a seeded stream of
    append / merge_upsert / delete_where calls against `Table` must
    match a straight-line dict model (key → row) applying the same
    SQL semantics (MERGE = upsert by key; DELETE drops rows where the
    predicate is TRUE, keeps NULL/false).  Exercises set pruning,
    pure-insert append shape, all-matched deletes, and version
    monotonicity across 12 mixed commits."""
    import random

    rng = random.Random(0xC0FFEE)
    t = Table(spark, str(tmp_path), "rand")
    model: dict[int, tuple[int, str, int]] = {}
    versions = [0]

    def mk(ids):
        rows = []
        for i in ids:
            v = rng.randrange(1000)
            rows.append((i, f"s{v % 7}", v))
        return rows

    # seed
    first = mk(range(0, 12))
    t.append(spark.createDataFrame(first, "id int, k string, v int"))
    model.update({r[0]: r for r in first})
    for step in range(12):
        op = rng.choice(["append", "merge", "merge", "delete"])
        if op == "append":
            ids = [rng.randrange(100, 200) + 200 * step for _ in range(3)]
            rows = mk(set(ids))
            t.append(spark.createDataFrame(rows, "id int, k string, v int"))
            model.update({r[0]: r for r in rows})
        elif op == "merge":
            pool = list(model) or [0]
            ids = {rng.choice(pool) for _ in range(4)}
            ids |= {rng.randrange(1000, 2000)}  # at least one insert
            rows = mk(ids)
            t.merge_upsert(
                spark.createDataFrame(rows, "id int, k string, v int"),
                ["id"],
            )
            model.update({r[0]: r for r in rows})
        else:
            cut = rng.randrange(1000)
            committed = t.delete_where(F.col("v") < cut)
            survivors = {
                i: r for i, r in model.items() if not (r[2] < cut)
            }
            # no matching row → no commit (documented no-op contract)
            assert (committed is None) == (survivors == model)
            model = survivors
        got = _rows(t.read()) if model else []
        assert got == sorted(model.values()), f"step {step} ({op})"
        assert t.current_version() >= versions[-1]
        versions.append(t.current_version())


def test_blog_rewrites_keep_rollback_and_time_travel(spark, tmp_path):
    """Crash-resume across a rewrite (round-4 fix): BucketedLog
    overwrite/compaction/merge RETIRE replaced files instead of
    deleting them, so (a) a historical read below the rewrite still
    works, (b) rollback to a checkpointed version restores the retired
    files, and (c) expire_snapshots reclaims them once no surviving
    manifest references them.  Before the fix, a crash between a
    round's compaction and its checkpoint left resume pointing at
    deleted files (PATH_NOT_FOUND) — reproduced directly."""
    log = BucketedLog(spark, str(tmp_path), "log", "k", 4)
    for i in range(3):
        log.append(spark.createDataFrame(
            [(f"u{i}-{j}", i) for j in range(10)], "k string, r int"))
    pre = log.current_version()
    log.compact()
    # (a) time travel below the compaction
    assert log.read(version=pre).count() == 30
    # (b) rollback below the compaction (crash-resume path)
    log.rollback(pre)
    assert log.read().count() == 30
    # merge then rollback below the merge: replaced bucket restored
    v2 = log.current_version()
    log.merge_upsert(spark.createDataFrame([("u0-0", 99)], "k string, r int"))
    assert {r["r"] for r in log.read().filter("k = 'u0-0'").collect()} == {99}
    log.rollback(v2)
    assert {r["r"] for r in log.read().filter("k = 'u0-0'").collect()} == {0}
    # (c) a fresh rewrite boundary lets expiry drop old manifests AND
    # the retired files they referenced
    log.compact()
    import os as _os
    retired = set(_os.listdir(log.retired_dir))
    assert retired, "compaction should retire the replaced files"
    log.expire_snapshots(keep_last=1)
    left = set(_os.listdir(log.retired_dir))
    assert left < retired  # unreferenced retired files reclaimed
    assert log.read().count() == 30
