"""Boilerplate strip + query-param canonicalization units."""

from __future__ import annotations

from pyspark.sql import functions as F

from legislation_scraper_spark.functions.urls import normalize_query
from legislation_scraper_spark.operators.boilerplate import (
    strip_boilerplate,
)

PROSE = (
    "Esta lei estabelece as normas gerais aplicaveis aos contratos"
    " administrativos no ambito da administracao publica."
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"]
        for r in df.select(normalize_query(F.col("url")).alias("c")).collect()
    ]


def test_normalize_query_branches(spark):
    got = _norm(
        spark,
        [
            "https://x.org/a",                          # no query
            "https://x.org/a?utm_source=n&gclid=1",     # all tracking
            "https://x.org/a?b=2&a=1",                  # sort only
            "https://x.org/a?b=2&utm_campaign=c&a=1",   # mixed
            "https://x.org/a?ref",                      # bare tracking name
            "https://x.org/a?refresh=1",                # NOT a tracking param
            "https://x.org/a?",                         # empty query
        ],
    )
    assert got == [
        "https://x.org/a",
        "https://x.org/a",
        "https://x.org/a?a=1&b=2",
        "https://x.org/a?a=1&b=2",
        "https://x.org/a",
        "https://x.org/a?refresh=1",
        "https://x.org/a",
    ]


def _strip(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    r = strip_boilerplate(df).collect()[0]
    return r["main_text"], r["kept_blocks"]


def test_strip_boilerplate_cases(spark):
    # pure prose survives
    text, kept = _strip(spark, f"<p>{PROSE}</p>")
    assert text == PROSE and kept == 1
    # link-dense nav of sufficient length is dropped by density
    nav = '<div><a href="/">Portal da Legislacao Brasileira completa</a></div>'
    text, kept = _strip(spark, nav + f"<p>{PROSE}</p>")
    assert text == PROSE and kept == 1
    # inline link under the density cap stays, with its anchor text
    text, kept = _strip(spark, f'<p>{PROSE} <a href="/v">veja</a></p>')
    assert text == f"{PROSE} veja" and kept == 1
    # short blocks drop; empty page yields empty text
    assert _strip(spark, "<div>curto</div>") == ("", 0)
    assert _strip(spark, "") == ("", 0)
    # block order is preserved across kept blocks
    text, kept = _strip(spark, f"<p>{PROSE}</p><p>{PROSE} B</p>")
    assert text == f"{PROSE} {PROSE} B" and kept == 2


def test_strip_boilerplate_has_no_exchange(spark):
    from tests.test_plans import _explain

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = _explain(strip_boilerplate(df))
    assert "Exchange" not in plan
