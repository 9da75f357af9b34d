"""URL canonicalization semantics + seen-set correctness properties
(SURVEY.md §5 item 4: bloom false positives must never drop unseen
URLs; no false negatives by construction)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.functions.urls import (
    canonicalize_url,
    salted_host,
    url_host,
)
from legislation_scraper_spark.operators.seen import SeenSet, with_url_key
from legislation_scraper_spark.tables import Catalog


CANON_CASES = [
    ("  https://WWW.Planalto.LEG.br/norma/1  ", "https://www.planalto.leg.br/norma/1"),
    ("https://a.br:443/x", "https://a.br/x"),
    ("http://a.br:80/x", "http://a.br/x"),
    ("https://a.br:8443/x", "https://a.br:8443/x"),
    ("https://a.br/x#frag", "https://a.br/x"),
    ("https://a.br/x/", "https://a.br/x"),
    # root with and without trailing slash unify to the same canon form
    ("https://a.br/", "https://a.br"),
    ("https://a.br", "https://a.br"),
    ("https://a.br/Path/CASE", "https://a.br/Path/CASE"),
]


def test_canonicalize(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    want = [w for _, w in CANON_CASES]
    assert got == want


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.X.br:8443/a?b#c",), ("http://y.br/z",)], "url string"
    )
    assert [r[0] for r in df.select(url_host(F.col("url"))).collect()] == [
        "www.x.br", "y.br",
    ]


def test_salted_host_preserves_host_prefix(spark):
    df = spark.createDataFrame(
        [(f"https://h{i%3}.br/{i}",) for i in range(100)], "url string"
    )
    out = df.select(
        url_host(F.col("url")).alias("h"),
        salted_host(url_host(F.col("url")), F.col("url"), 4).alias("s"),
    )
    rows = out.collect()
    assert all(r["s"].startswith(r["h"] + "#") for r in rows)
    # salt actually spreads each host over >1 bucket
    n_buckets = out.select("s").distinct().count()
    assert n_buckets > 3


@pytest.mark.parametrize("fpp", [0.01, 0.5])
def test_seen_set_exactness_under_bloom_fp(spark, tmp_path, fpp):
    """fpp=0.5 forces many bloom false positives → the exact anti-join
    backstop must still pass every truly-unseen URL through."""
    cat = Catalog(spark, str(tmp_path / f"s{fpp}"))
    seen = SeenSet(cat.table("seen"), n_shards=4, fpp=fpp)
    seen_urls = spark.createDataFrame(
        [(f"https://a.br/doc/{i}",) for i in range(0, 1000, 2)], "url string"
    )
    seen.add(seen_urls)
    cand = spark.createDataFrame(
        [(f"https://a.br/doc/{i}",) for i in range(1000)], "url string"
    )
    out = seen.filter_unseen(cand)
    got = sorted(r["url"] for r in out.collect())
    want = sorted(f"https://a.br/doc/{i}" for i in range(1, 1000, 2))
    assert got == want


def test_seen_add_idempotent(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "idem"))
    seen = SeenSet(cat.table("seen"), n_shards=4)
    urls = spark.createDataFrame(
        [(f"https://a.br/{i}",) for i in range(50)], "url string"
    )
    seen.add(urls)
    seen.add(urls)  # re-adding must not resurrect them as unseen
    out = seen.filter_unseen(urls)
    assert out.count() == 0


def test_with_url_key_shards_stable(spark):
    df = with_url_key(
        spark.createDataFrame([("https://a.br/1",)], "url string"),
        n_shards=8,
    )
    r1 = df.collect()[0]
    r2 = df.collect()[0]
    assert r1["shard"] == r2["shard"] and 0 <= r1["shard"] < 8
    assert r1["url_hash"] == r2["url_hash"]


def test_incremental_filter_state_equivalent(spark, tmp_path):
    """Incremental delta-bitmap path: multiple adds, probe from the
    OR-merged filter log, never rescanning the seen table — results
    identical to the stateless rebuild path, before and after folding
    the delta log."""
    from pyspark.sql import functions as F

    from legislation_scraper_spark.operators.seen import SeenSet
    from legislation_scraper_spark.tables import Catalog

    urls = [(f"https://h{i % 5}.example/p{i}",) for i in range(400)]
    df = spark.createDataFrame(urls, "url string")

    cat = Catalog(spark, str(tmp_path / "inc"))
    inc = SeenSet(
        cat.table("seen"), n_shards=8,
        filters_table=cat.table("seen_filters"), keys_per_shard=1024,
    )
    cat2 = Catalog(spark, str(tmp_path / "stateless"))
    ref = SeenSet(cat2.table("seen"), n_shards=8)

    # three incremental batches
    for mod in (0, 1, 2):
        batch = df.filter(F.xxhash64("url") % 7 == mod)
        inc.add(batch, "url")
        ref.add(batch, "url")
    assert inc.filters_table.read().count() > 8  # true delta log

    def unseen(ss):
        return sorted(
            r["url"] for r in ss.filter_unseen(df, "url").select("url").collect()
        )

    expect = unseen(ref)
    assert unseen(inc) == expect
    # fold the delta log; results must not change
    inc.compact_filters()
    assert inc.filters_table.read().count() <= 8
    assert unseen(inc) == expect


def test_empty_filter_log_falls_back_to_rebuild(spark, tmp_path):
    """filters_table configured but its delta log empty while the exact
    seen table is NOT (store predates the incremental path, or rows were
    appended bypassing add()): filter_unseen must fall back to the
    stateless Bloom rebuild, not return every candidate as unseen."""
    from pyspark.sql import functions as F

    from legislation_scraper_spark.operators.seen import (
        SeenSet, with_url_key,
    )
    from legislation_scraper_spark.tables import Catalog

    urls = [(f"https://h{i % 5}.example/p{i}",) for i in range(200)]
    df = spark.createDataFrame(urls, "url string")
    seen_urls = df.filter(F.xxhash64("url") % 3 == 0)

    cat = Catalog(spark, str(tmp_path / "legacy"))
    # seed the exact table directly (the "legacy store" path — no deltas)
    legacy = SeenSet(cat.table("seen"), n_shards=8)
    legacy.add(seen_urls, "url")

    # resume with the incremental engine over the same store
    inc = SeenSet(
        cat.table("seen"), n_shards=8,
        filters_table=cat.table("seen_filters"), keys_per_shard=1024,
    )
    got = sorted(
        r["url"] for r in inc.filter_unseen(df, "url").select("url").collect()
    )
    expect = sorted(
        r["url"] for r in legacy.filter_unseen(df, "url").select("url").collect()
    )
    assert got == expect
    assert len(got) < 200  # seen URLs actually filtered out


def test_incremental_cuckoo_filter_state_equivalent(spark, tmp_path):
    """Cuckoo incremental delta log (VERDICT r1 item 7): multiple adds
    append fixed-geometry delta tables; the probe folds them via
    fingerprint re-insertion (cuckoo.merge_tables), never rescanning
    the seen table — results identical to the stateless rebuild path,
    before and after compaction, and a saturated shard (forced with a
    tiny keys_per_shard) degrades to the exact anti-join, never to a
    false negative."""
    from pyspark.sql import functions as F

    from legislation_scraper_spark.operators.seen import SeenSet
    from legislation_scraper_spark.tables import Catalog

    urls = [(f"https://h{i % 5}.example/p{i}",) for i in range(400)]
    df = spark.createDataFrame(urls, "url string")

    def unseen(ss):
        return sorted(
            r["url"]
            for r in ss.filter_unseen(df, "url").select("url").collect()
        )

    for kps in (1024, 8):  # roomy geometry, then forced saturation
        cat = Catalog(spark, str(tmp_path / f"ck{kps}"))
        inc = SeenSet(
            cat.table("seen"), n_shards=8, filter_kind="cuckoo",
            filters_table=cat.table("seen_filters"), keys_per_shard=kps,
        )
        cat2 = Catalog(spark, str(tmp_path / f"ref{kps}"))
        ref = SeenSet(cat2.table("seen"), n_shards=8, filter_kind="cuckoo")
        for mod in (0, 1, 2):
            batch = df.filter(F.xxhash64("url") % 7 == mod)
            inc.add(batch, "url")
            ref.add(batch, "url")
        assert inc.filters_table.read().count() > 8  # true delta log
        expect = unseen(ref)
        assert unseen(inc) == expect, f"kps={kps}"
        inc.compact_filters()
        assert inc.filters_table.read().count() <= 8
        assert unseen(inc) == expect, f"kps={kps} post-compact"


def test_registered_domain_psl_subset(spark):
    from legislation_scraper_spark.functions.urls import registered_domain

    cases = {
        "portal.camara.leg.br": "camara.leg.br",
        "www.planalto.gov.br": "planalto.gov.br",
        "a.b.c.com": "c.com",
        "x.br": "x.br",          # 'br' alone is a 1-label suffix
        "leg.br": "leg.br",      # host AT suffix depth returns itself
        "WWW.Senado.LEG.BR": "senado.leg.br",  # case-folded
        "localhost": "localhost",
        "deep.sub.tree.gov.uk": "tree.gov.uk",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases


def test_robots_policy_table_feeds_engine_schema(spark):
    from legislation_scraper_spark.sources.sitemap import (
        robots_policy_table,
    )

    bodies = spark.createDataFrame(
        [
            ("open.org", "User-agent: *\nDisallow: /admin\n"),
            ("slow.org", "User-agent: *\nDisallow: /x\nCrawl-delay: 3\n"),
            ("closed.org", "User-agent: *\nDisallow: /\n"),
            ("empty.org", ""),
        ],
        "host string, body string",
    )
    rows = {
        r["host"]: r
        for r in robots_policy_table(
            bodies, agent="*", default_delay_ms=500, max_parallel=2
        ).collect()
    }
    tbl = robots_policy_table(bodies)
    assert [f.name for f in tbl.schema.fields] == [
        "host", "allow", "crawl_delay_ms", "max_parallel"
    ]
    assert rows["open.org"]["allow"] is True
    assert rows["closed.org"]["allow"] is False
    assert rows["empty.org"]["allow"] is True      # no rules -> allowed
    assert rows["slow.org"]["crawl_delay_ms"] == 3000
    assert rows["open.org"]["crawl_delay_ms"] == 500   # default fallback
    assert all(r["max_parallel"] == 2 for r in rows.values())
