"""XML sitemap and robots.txt parsing — the crawl's seed discovery
surface, kept entirely JVM-side.

The reference seeds its frontier from hand-coded per-site search URLs;
a tier-style web crawl seeds from robots.txt → sitemap indexes →
urlsets.  Both formats parse with built-ins here (``from_xml`` for
sitemaps, split/regexp column algebra for robots), so discovery fuses
into whole-stage codegen with no Python anywhere.

Scale notes:
- ``parse_sitemap`` is a per-row ``from_xml`` + ``explode`` — no
  shuffle; a sitemap index simply feeds discovered child-sitemap URLs
  back into the fetch frontier (same BFS loop as S9 speculative
  pagination).
- ``parse_robots`` explodes robots lines per host (≤ a few thousand
  rows per host); ``robots_allows`` evaluates the agent's rules with
  the standard longest-match-wins semantics via one window over
  (host, url) candidates — rule dims are tiny and broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: <urlset><url><loc/><lastmod/><priority/></url>...</urlset>
SITEMAP_SCHEMA = (
    "STRUCT<url: ARRAY<STRUCT<loc: STRING, lastmod: STRING, "
    "priority: DOUBLE>>>"
)

#: <sitemapindex><sitemap><loc/></sitemap>...</sitemapindex>
SITEMAP_INDEX_SCHEMA = "STRUCT<sitemap: ARRAY<STRUCT<loc: STRING>>>"


def parse_sitemap(xml: Column) -> Column:
    """urlset XML → array<struct<loc, lastmod, priority>> (JVM
    ``from_xml``; malformed XML → NULL, the PERMISSIVE default)."""
    return F.from_xml(xml, SITEMAP_SCHEMA)["url"]


def parse_sitemap_index(xml: Column) -> Column:
    """sitemapindex XML → array of child sitemap locs."""
    return F.transform(
        F.from_xml(xml, SITEMAP_INDEX_SCHEMA)["sitemap"],
        lambda s: s["loc"],
    )


def parse_robots(df: DataFrame, host_col: str = "host",
                 body_col: str = "body",
                 directives: tuple[str, ...] | None = (
                     "allow", "disallow")) -> DataFrame:
    """robots.txt text → (host, agent, directive, path) rule rows.

    Line-based split + regexp column algebra (RFC 9309 §2.1 syntax:
    ``<field>:<value>`` with ``#`` comments; group lines belong to the
    most recent ``User-agent`` run).  The group association is an
    in-row fold over the line array — zero shuffle, same discipline as
    curation.repetition_scores.

    ``directives`` filters the emitted rows (default: the path rules).
    Pass ``None`` for everything the fold captures, including
    group-scoped ``crawl-delay`` lines (value carried in ``path``;
    feed those to ``crawl_delays`` for the politeness budget).
    """
    lines = F.split(F.col(body_col), "\n")
    # fold: (current agents array, emitted rules array); a Disallow/
    # Allow line emits one rule per agent in the current group; an
    # User-agent line either extends the group (consecutive UA lines)
    # or starts a new one (UA after rules)
    init = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(True).alias("ua_run"),
        F.array().cast(
            "array<struct<agent:string,directive:string,path:string>>"
        ).alias("rules"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        # RFC 9309 §2.1: lines without a ':' separator are ignored —
        # without this, a bare 'Disallow' line would emit a phantom
        # rule whose path is the line's own text
        has_colon = F.instr(line, ":") > 0
        field = F.lower(F.trim(F.substring_index(line, ":", 1)))
        value = F.trim(F.regexp_replace(line, r"^[^:]*:", ""))
        is_ua = has_colon & (field == F.lit("user-agent"))
        is_rule = (
            has_colon
            & field.isin("allow", "disallow", "crawl-delay")
            & (value != "")
        )
        new_agents = (
            F.when(is_ua & acc["ua_run"], F.array_union(
                acc["agents"], F.array(F.lower(value))))
            .when(is_ua, F.array(F.lower(value)))
            .otherwise(acc["agents"])
        )
        emitted = F.when(
            is_rule,
            F.concat(
                acc["rules"],
                F.transform(
                    acc["agents"],
                    lambda a: F.struct(
                        a.alias("agent"),
                        field.alias("directive"),
                        value.alias("path"),
                    ),
                ),
            ),
        ).otherwise(acc["rules"])
        return F.struct(
            new_agents.alias("agents"),
            (is_ua | ~(is_ua | is_rule) & acc["ua_run"]).alias("ua_run"),
            emitted.alias("rules"),
        )

    rules = F.aggregate(lines, init, step, lambda acc: acc["rules"])
    out = (
        df.select(F.col(host_col).alias("host"), F.explode(rules).alias("r"))
        .select("host", "r.agent", "r.directive", "r.path")
    )
    if directives is not None:
        out = out.filter(F.col("directive").isin(*directives))
    return out


def crawl_delays(rules: DataFrame, agent: str = "*") -> DataFrame:
    """Per-host crawl-delay budget from parsed robots rules (rows with
    ``directive = 'crawl-delay'``, i.e. ``parse_robots(...,
    directives=None)`` output): exact-agent group beats the ``*``
    group; several applicable lines keep the LARGEST delay (the polite
    reading); non-numeric values are ignored (``try_cast``).  Returns
    (host, crawl_delay_ms) — hosts with no delay line are absent
    (callers fall back to their default budget).  One
    partial-aggregatable groupBy, min-struct pick — no window."""
    d = rules.filter(
        (F.col("directive") == "crawl-delay")
        & F.col("agent").isin(agent.lower(), "*")
    ).withColumn("delay_ms", F.expr("try_cast(path as double) * 1000"))
    d = d.filter(F.col("delay_ms").isNotNull())
    best = F.min(
        F.struct(
            F.when(F.col("agent") == agent.lower(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("p"),
            (-F.col("delay_ms")).alias("nd"),
        )
    )
    return (
        d.groupBy("host")
        .agg(best.alias("b"))
        .select(
            "host", (-F.col("b.nd")).cast("bigint").alias("crawl_delay_ms")
        )
    )


def sitemap_locs(df: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies → one (host,
    sitemap_url) row each.  Per RFC 9309 §2.2.4 / sitemaps.org these
    are group-INDEPENDENT, so no fold is needed — a line-wise
    transform+filter (the value keeps its own ``:`` from the URL
    scheme; only the first field separator splits)."""
    no_comment = lambda l: F.regexp_replace(l, "#.*$", "")  # noqa: E731
    vals = F.transform(
        F.split(F.col(body_col), "\n"),
        lambda l: F.when(
            F.lower(F.trim(F.substring_index(no_comment(l), ":", 1)))
            == "sitemap",
            F.trim(F.regexp_replace(no_comment(l), r"^[^:]*:", "")),
        ),
    )
    return df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.filter(vals, lambda v: v.isNotNull() & (v != ""))
        ).alias("sitemap_url"),
    )


def rule_pattern(rule_path: Column) -> Column:
    """RFC 9309 §2.2.3 rule path → anchored Java regex (column expr):
    regex metachars are literal-escaped, ``*`` matches any span, a
    TRAILING ``$`` anchors end-of-URL; otherwise prefix match."""
    ends_anchor = rule_path.endswith("$")
    body = F.when(
        ends_anchor,
        rule_path.substr(F.lit(1), F.length(rule_path) - 1),
    ).otherwise(rule_path)
    # escape every regex metachar except '*' (handled below); '$' was
    # stripped above when terminal, mid-path '$' is literal
    escaped = F.regexp_replace(
        body, r"([.\^$+?(){}\[\]\\|])", r"\\$1"
    )
    wild = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def robots_allows(
    candidates: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "path",
    host_col: str = "host",
) -> DataFrame:
    """Evaluate (host, path) candidates against parsed rules for one
    agent: RFC 9309 longest-match-wins (match via §2.2.3 ``*``/``$``
    patterns, specificity = rule path length), Allow beats Disallow on
    ties, no matching rule → allowed.  Returns the candidate rows —
    all columns, original multiplicity — plus ``allowed``: the verdict
    is computed once per distinct (host, path) and joined back, so
    duplicate candidates and extra columns survive.  The rule dim is
    broadcast, so the pattern-match theta join is a map-side nested
    loop over a tiny side — no shuffle of candidates beyond the
    distinct+join pair."""
    r = rules.filter(F.col("agent") == agent.lower()).select(
        F.col("host").alias("r_host"),
        "directive",
        F.col("path").alias("rule_path"),
    ).withColumn("rule_re", rule_pattern(F.col("rule_path")))
    distinct_cand = candidates.select(host_col, url_col).distinct()
    j = distinct_cand.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("r_host"))
        & F.regexp_like(F.col(url_col), F.col("rule_re")),
        "left",
    )
    verdict = (
        j.groupBy(host_col, url_col)
        .agg(
            # longest-match-wins; tie → allow ('allow' < 'disallow'
            # lexicographically, so min(struct) with directive ASC after
            # length DESC picks allow); no matching rule → NULL → allowed
            F.min(
                F.struct(
                    (-F.length("rule_path")).alias("neg_len"),
                    F.col("directive").alias("directive"),
                )
            ).alias("best")
        )
        .select(
            host_col,
            url_col,
            F.coalesce(
                F.col("best.directive") != "disallow", F.lit(True)
            ).alias("allowed"),
        )
    )
    return candidates.join(verdict, [host_col, url_col], "left").fillna(
        True, subset=["allowed"]
    )


def robots_policy_table(
    bodies: DataFrame,
    agent: str = "*",
    default_delay_ms: int = 1000,
    max_parallel: int = 4,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Raw robots.txt bodies → the crawl engine's policy table
    ``(host, allow, crawl_delay_ms, max_parallel)`` (the schema
    ``plans/crawl.CrawlEngine`` consumes — synth.py:462 shapes the
    same table directly for tests).

    ``allow`` is the root-path verdict for ``agent`` (a host whose
    robots disallows ``/`` is skipped wholesale — the engine's
    per-host gate; finer per-URL rules stay available via
    ``robots_allows`` downstream).  ``crawl_delay_ms`` falls back to
    ``default_delay_ms`` when no numeric Crawl-delay line applies;
    ``max_parallel`` is an engine config knob (robots.txt has no such
    field), broadcast as a literal."""
    rules = parse_robots(
        bodies, host_col=host_col, body_col=body_col, directives=None
    )
    hosts = bodies.select(F.col(host_col).alias("host")).distinct()
    root = hosts.withColumn("path", F.lit("/"))
    verdict = robots_allows(
        root,
        rules.filter(F.col("directive").isin("allow", "disallow")),
        agent=agent,
    ).select("host", "allowed")
    delays = crawl_delays(rules, agent=agent)
    return (
        verdict.join(delays, "host", "left")
        .select(
            "host",
            F.col("allowed").alias("allow"),
            F.coalesce(
                F.col("crawl_delay_ms"), F.lit(int(default_delay_ms))
            ).alias("crawl_delay_ms"),
            F.lit(int(max_parallel)).alias("max_parallel"),
        )
    )


def sitemap_staleness(
    entries: DataFrame,
    visited: DataFrame,
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    fetched_col: str = "fetched_ts",
) -> DataFrame:
    """Recrawl planning from sitemap ``<lastmod>``: classify every
    sitemap URL against the visited log as ``unseen`` (never fetched),
    ``stale`` (published lastmod newer than our fetch), ``fresh``
    (fetch at/after lastmod) or ``unknown`` (no lastmod — the entry
    gives no freshness signal; revisit falls back to the Poisson
    change-rate estimate, operators/revisit.change_rates).

    This closes the sitemap loop: robots.txt → Sitemap: directives
    (sitemap_locs) → urlset parse (parse_sitemap) → THIS view → the
    frontier, so publishers' freshness hints drive refetch priority
    instead of blind revisit cycles.

    Plan shape: ONE left equi-join on the URL key carrying (url,
    lastmod) vs (url, fetched_ts) — co-located (shuffle-free) under
    the repo's url-hash bucketing; classification is a per-row CASE.
    """
    v = visited.select(
        F.col(url_col).alias(url_col), F.col(fetched_col).alias("_f")
    )
    j = entries.join(v, url_col, "left")
    status = (
        F.when(F.col("_f").isNull(), F.lit("unseen"))
        .when(F.col(lastmod_col).isNull(), F.lit("unknown"))
        .when(F.col(lastmod_col) > F.col("_f"), F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        *entries.columns,
        F.col("_f").alias(fetched_col),
        status.alias("status"),
    )
