"""Transport-policy parity: the JVM column-expression simulation must
produce identical outcomes to the mapInPandas executor and to the pure-
Python md5_64 rule used by the ordering simulator."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.operators.fetch import (
    FetchPolicy,
    md5_64,
    simulate_transport,
    transport_columns,
)
from legislation_scraper_spark.operators.seen import with_url_key


@pytest.fixture(scope="module")
def resolved(spark):
    urls = [(f"https://www.h{i % 7}.leg.br/norma/{i}",) for i in range(500)]
    df = with_url_key(spark.createDataFrame(urls, "url string"))
    # body present for ~90% of urls
    return df.withColumn(
        "body",
        F.when(
            F.col("url_hash") % 10 != 0, F.encode(F.col("url"), "utf-8")
        ),
    )


COLS = ["canon_url", "status", "attempts", "fetched", "fetch_error"]


def _rows(df):
    return sorted(tuple(r[c] for c in COLS) for r in df.select(*COLS).collect())


def test_jvm_equals_python_transport(resolved):
    p = FetchPolicy()
    jvm = _rows(transport_columns(resolved, p))
    py = _rows(simulate_transport(resolved, p))
    assert jvm == py


def test_matches_md5_rule(resolved):
    p = FetchPolicy()
    rows = transport_columns(resolved, p).select(
        "canon_url", "fetched", F.col("body").isNotNull().alias("has_body")
    ).collect()
    n_perm = 0
    for r in rows:
        h = md5_64(r["canon_url"])
        want = r["has_body"] and h % p.permanent_mod != 3
        assert r["fetched"] == want, r["canon_url"]
        n_perm += int(r["has_body"] and h % p.permanent_mod == 3)
    assert n_perm > 0, "test data should include permanent failures"


def test_viewstate_two_request_fetch_parity(spark):
    """S5 stateful fetch (VERDICT r1 item 8): the two-hop
    harvest-then-POST plan reproduces the reference's session loop
    (espirito_santo.py:69-127) bit-for-bit on a synthetic postback web,
    covering success, missing-token, and missing-postback paths."""
    from legislation_scraper_spark.operators.viewstate import (
        fetch_paged, simulate_viewstate_fetch,
    )
    from legislation_scraper_spark.synth import synth_viewstate_world

    w = synth_viewstate_world(spark, n_hosts=3, pages_per_host=4)
    bases = sorted(u for u in w["web"] if "#postback" not in u)
    reqs = [(u, p) for u in bases for p in range(1, 5)]
    req_df = spark.createDataFrame(reqs, "url string, page int")
    got = {
        (r["url"], r["page"]): (
            bytes(r["body"]) if r["body"] is not None else None,
            r["fetch_error"],
        )
        for r in fetch_paged(req_df, w["pages_raw"]).collect()
    }
    assert len(got) == len(reqs)
    n_ok = n_err = 0
    for u, p in reqs:
        want = simulate_viewstate_fetch(w["web"], u, p)
        assert got[(u, p)] == want, (u, p, got[(u, p)], want)
        n_ok += want[0] is not None
        n_err += want[0] is None
    assert n_ok > 0 and n_err > 0  # both paths genuinely exercised
    errs = {e for b, e in got.values() if e}
    assert "missing __VIEWSTATE/__EVENTVALIDATION" in errs
    assert "404 postback" in errs
