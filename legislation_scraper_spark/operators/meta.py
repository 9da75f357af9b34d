"""HTML head-metadata extraction + crawl-directive enforcement.

A polite crawler must honor page-level directives the reference never
needed (its 23 scrapers target sites it controls the etiquette for):
``<link rel="canonical">`` (the duplicate-cluster key search engines
and dedup pipelines prefer over the fetch URL), ``<meta name="robots"
content="noindex,nofollow">`` (RFC 9309's page-level counterpart —
noindex pages must not enter the dataset, nofollow pages must not
contribute outlinks to the frontier), plus title / description /
OpenGraph title for corpus metadata.

All extraction is JVM ``regexp_extract`` codegen over the html string
— ZERO Python, zero shuffle, fusing into the page scan.  The regex
subset is Java ∩ RE2 (case-insensitive via ``(?i)``, no lookarounds)
so the DuckDB oracle runs the same patterns.  Regex-over-HTML is exact
here because the patterns anchor on attribute order emitted by this
corpus's generators; a full spec parser would be the Arrow-UDF path of
``operators/extract.py`` — this operator is the cheap head-only tier
run on EVERY page, where a DOM parse per page would dominate the
pipeline (head metadata is ~1 KB of a ~100 KB page).

``apply_robots_meta`` consumes the directives: drops noindex pages
from dataset-bound output and anti-joins frontier candidates against
links contributed by nofollow pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TITLE = r"(?is)<title[^>]*>\s*(.*?)\s*</title>"
_CANONICAL = r'(?is)<link\s+rel="canonical"\s+href="([^"]*)"'
_DESCRIPTION = r'(?is)<meta\s+name="description"\s+content="([^"]*)"'
_OG_TITLE = r'(?is)<meta\s+property="og:title"\s+content="([^"]*)"'
_ROBOTS = r'(?is)<meta\s+name="robots"\s+content="([^"]*)"'


def _clause(directives: Column, word: str) -> Column:
    toks = F.transform(
        F.split(F.lower(directives), ","), lambda x: F.trim(x)
    )
    return F.array_contains(toks, word)


def parse_head_meta(
    pages: DataFrame, html_col: str = "html_text"
) -> DataFrame:
    """Append (title, canonical, description, og_title, noindex,
    nofollow) extracted from the html string column.  Absent fields are
    NULL; absent robots meta means index,follow (both false).  A
    ``none`` directive implies both noindex and nofollow (robots-meta
    spec)."""
    h = F.col(html_col)
    robots = F.nullif(F.regexp_extract(h, _ROBOTS, 1), F.lit(""))
    has = robots.isNotNull()
    none = has & _clause(robots, "none")
    return pages.select(
        *pages.columns,
        F.nullif(F.regexp_extract(h, _TITLE, 1), F.lit("")).alias("title"),
        F.nullif(F.regexp_extract(h, _CANONICAL, 1), F.lit("")).alias(
            "canonical"
        ),
        F.nullif(F.regexp_extract(h, _DESCRIPTION, 1), F.lit("")).alias(
            "description"
        ),
        F.nullif(F.regexp_extract(h, _OG_TITLE, 1), F.lit("")).alias(
            "og_title"
        ),
        F.when(has, _clause(robots, "noindex") | none)
        .otherwise(F.lit(False))
        .alias("noindex"),
        F.when(has, _clause(robots, "nofollow") | none)
        .otherwise(F.lit(False))
        .alias("nofollow"),
    )


def apply_robots_meta(
    meta: DataFrame,
    outlinks: DataFrame,
    url_col: str = "url",
    src_col: str = "src",
) -> tuple[DataFrame, DataFrame]:
    """Enforce the directives: returns (indexable_pages,
    followable_outlinks).

    - ``indexable_pages``: meta rows with ``noindex`` pages dropped —
      a plain filter, no shuffle.
    - ``followable_outlinks``: outlink rows whose SOURCE page is
      nofollow are dropped via a broadcast anti-join on the (small by
      construction — sites gate sections, not whole corpora) nofollow
      page set; the outlink stream itself never shuffles.
    """
    indexable = meta.filter(~F.col("noindex"))
    nofollow_srcs = meta.filter(F.col("nofollow")).select(
        F.col(url_col).alias(src_col)
    )
    followable = outlinks.join(
        F.broadcast(nofollow_srcs), src_col, "left_anti"
    )
    return indexable, followable


def robots_directive_flags(value: Column) -> list[Column]:
    """(noindex, nofollow) booleans from a robots directive STRING —
    shared by the two delivery channels a crawler must honor: the
    ``<meta name="robots">`` content attribute (parse_head_meta) and
    the ``X-Robots-Tag`` HTTP response header (RFC 9309's page-level
    companion; reachable for non-HTML payloads like PDFs where no meta
    tag can exist).  NULL input means no directive (both false);
    ``none`` implies both."""
    has = value.isNotNull()
    none = has & _clause(value, "none")
    return [
        (has & (_clause(value, "noindex") | none)).alias("noindex"),
        (has & (_clause(value, "nofollow") | none)).alias("nofollow"),
    ]


def effective_robots(
    meta_noindex: Column,
    meta_nofollow: Column,
    header_value: Column,
) -> list[Column]:
    """Most-restrictive-wins combination of the meta-tag flags and the
    X-Robots-Tag header (the rule search engines document: any channel
    saying noindex/nofollow makes it so)."""
    h_noindex, h_nofollow = robots_directive_flags(header_value)
    return [
        (meta_noindex | h_noindex).alias("noindex"),
        (meta_nofollow | h_nofollow).alias("nofollow"),
    ]
