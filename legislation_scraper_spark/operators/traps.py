"""Crawler-trap detection: per-(host, template) URL-vs-content ratios.

An open 10^10-URL frontier dies on traps the reference's fixed scrapers
never meet (its 23 site classes each walk a known-finite search listing,
e.g. /root/reference/src/scraper/base/scraper.py enumerating result
pages by count): calendar grids that mint a URL per day forever,
session-id echoes, faceted-search cross-products.  The classic signal
(Heritrix's path-repetition + content-digest heuristics) is structural:
a URL *template* that accumulates many URLs but few distinct contents
is a trap; a template with ~1 content per URL is a real page type.

``template_stats`` groups fetched pages by
(host, functions.urls.url_template) and scores

    trap_score = n_urls / n_contents

with contents counted as distinct ``xxhash64`` fingerprints (64-bit
collisions are negligible against a >2 threshold).  Downstream, the
frontier joins candidate URLs to high-score templates (broadcast — the
flagged-template set is tiny) and demotes or caps them.

Plan shape / scale:
- TWO exchanges, both partial-aggregated and body-free: Spark plans
  ``count(DISTINCT hash)`` as a pre-aggregation keyed by
  (host, template, chash) — each partition emits one row per distinct
  (template, content) it saw — then the final (host, template) agg.
  Page BODIES never shuffle at all: the 8-byte hash is computed in the
  scan stage projection.
- Template cardinality ≈ page-type count (10^5–10^6 at web scale),
  orders of magnitude below URL count, so the result is frontier
  metadata, not data.
- Skew: a mega-template (one host's trap with 10^8 URLs) is exactly
  what partial aggregation absorbs — per-partition (key, count,
  distinct-sketch) partials are O(templates per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import registered_domain, url_host, url_template


def template_stats(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    min_urls: int = 1,
) -> DataFrame:
    """(host, template, n_urls, n_contents, trap_score) per structural
    URL template; ``trap_score`` ≈ 1 for real page types, ≫ 1 for
    traps.  ``min_urls`` prunes the long tail of singleton templates
    (a template seen once cannot be judged)."""
    keyed = pages.select(
        url_host(F.col(url_col)).alias("host"),
        url_template(F.col(url_col)).alias("template"),
        F.xxhash64(F.col(content_col)).alias("chash"),
    )
    return (
        keyed.groupBy("host", "template")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.count_distinct(F.col("chash")).cast("bigint").alias(
                "n_contents"
            ),
        )
        .filter(F.col("n_urls") >= min_urls)
        .withColumn(
            "trap_score",
            F.round(
                F.col("n_urls").cast("double") / F.col("n_contents"), 6
            ),
        )
    )


def flag_trap_urls(
    candidates: DataFrame,
    stats: DataFrame,
    threshold: float = 4.0,
    url_col: str = "url",
) -> DataFrame:
    """Annotate frontier candidates with ``is_trap`` by joining their
    (host, template) key to flagged templates.  The flagged set is
    broadcast — it is bounded by the count of TEMPLATES over the
    threshold, not by URL volume — so candidates never shuffle."""
    flagged = (
        stats.filter(F.col("trap_score") >= threshold)
        .select("host", "template")
        .withColumn("is_trap", F.lit(True))
    )
    keyed = candidates.withColumn(
        "host", url_host(F.col(url_col))
    ).withColumn("template", url_template(F.col(url_col)))
    return (
        keyed.join(F.broadcast(flagged), ["host", "template"], "left")
        .withColumn("is_trap", F.coalesce("is_trap", F.lit(False)))
        .drop("template")
    )


# --- soft-404 detection ----------------------------------------------
# Phrase patterns a "200 OK but actually missing" page carries.  The
# "404" token alone is deliberately absent (a legal text citing
# "Lei 404" must not match); phrases only, plus the tiny-body rule.
SOFT404_PHRASES = (
    "página não encontrada",
    "pagina nao encontrada",
    "page not found",
    "404 not found",
    "erro 404",
    "nenhum registro encontrado",
    "no documents found",
    "documento não disponível",
    "the requested url was not found",
)


def soft404_flags(
    pages: DataFrame,
    status_col: str = "status",
    text_col: str = "text",
    min_chars: int = 40,
    repair_encoding: bool = True,
) -> DataFrame:
    """Flag soft 404s: HTTP 200 whose body says (or implies) "not
    found" — the single biggest source of junk rows in an open crawl,
    because every downstream tier (extract, dedup, index) treats a 200
    as content.  Hard 404s are already routed by status; this is the
    content-layer backstop the reference never needs (its fixed site
    classes return real listings; an open frontier meets millions of
    parked/moved pages).

    Signal = phrase match (on the lowercased, optionally
    mojibake-repaired body — crawled Brazilian pages frequently serve
    "PÃ¡gina nÃ£o encontrada") OR a sub-``min_chars`` body.  Adds a
    ``soft404`` boolean; pure in-row codegen, zero shuffle, no Python.
    """
    from ..functions.text import fix_mojibake

    body = F.col(text_col)
    if repair_encoding:
        body = fix_mojibake(body)
    low = F.lower(body)
    pat = "|".join(SOFT404_PHRASES)
    hit = low.rlike(pat) | (F.length(F.trim(body)) < min_chars)
    return pages.withColumn(
        "soft404", (F.col(status_col) == 200) & hit
    )


def blocklist_verdicts(
    urls: DataFrame,
    blocked_domains: DataFrame,
    patterns: tuple[str, ...],
    url_col: str = "url",
) -> DataFrame:
    """UT1/URLhaus-style blocklist filtering — the policy tier of a
    web-corpus URL pipeline (RefinedWeb §3.1 and FineWeb both gate the
    frontier on the UT1 category lists before any fetch).  Two tiers:

    1. **domain tier** — the URL's registered (pay-level) domain is
       looked up in ``blocked_domains(domain, category)``; a hit marks
       the URL ``blocked`` with reason ``domain:<category>``.  Matching
       at the REGISTERED domain absorbs subdomain evasion
       (``a.b.bad.com`` still hits ``bad.com``), which host-exact lists
       miss.
    2. **pattern tier** — the first of ``patterns`` found in the
       lowercased URL marks it ``pattern:<keyword>`` (UT1 ships keyword
       lists beside domain lists for exactly the URLs whose domain is
       clean but whose path is not).

    Domain beats pattern when both hit (the domain lists are curated;
    keywords are heuristic).  Clean URLs pass through with
    ``blocked = false, reason = NULL``.

    Scale/plan: the blocklist is config-sized (UT1's adult list, the
    largest, is ~4M rows ≈ tens of MB) → ``F.broadcast`` hash join, no
    shuffle of the URL table; the keyword tier is an in-row
    ``filter`` over a literal array — pure codegen.  One map-side
    stage end to end.
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    pat_arr = F.array(*[F.lit(p) for p in patterns])
    # F.get (not element_at): NULL on empty match list under ANSI mode
    pat_hit = F.get(
        F.filter(
            pat_arr, lambda p: F.contains(F.lower(F.col(url_col)), p)
        ),
        0,
    )
    dom = blocked_domains.select(
        F.col("domain").alias("_bl_domain"),
        F.col("category").alias("_bl_category"),
    )
    out = urls.withColumn(
        "_reg_domain", registered_domain(host)
    ).join(
        F.broadcast(dom),
        F.col("_reg_domain") == F.col("_bl_domain"),
        "left",
    )
    reason = F.when(
        F.col("_bl_category").isNotNull(),
        F.concat(F.lit("domain:"), F.col("_bl_category")),
    ).when(
        pat_hit.isNotNull(), F.concat(F.lit("pattern:"), pat_hit)
    )
    return (
        out.withColumn("blocked", reason.isNotNull())
        .withColumn("reason", reason)
        .drop("_reg_domain", "_bl_domain", "_bl_category")
    )
