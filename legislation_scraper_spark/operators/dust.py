"""DUST rule mining — "Do not crawl in the DUST: different URLs with
similar text" (Bar-Yossef, Keidar, Schonfeld, WWW'07).

A large crawl wastes a material fraction of its fetch budget on URL
aliases: ``/story/17`` vs ``/story/17/index.html`` vs
``?mobile=true`` variants all serve the same bytes.  DUST mines
*rewrite rules* from the crawl's own evidence — pairs of URLs whose
fetched content hashed identically — so the frontier can canonicalize
candidate URLs BEFORE spending fetches on them.  (The reference
scraper sidesteps the problem by construction — its URLs are
synthesized from document ids, `reference
src/scraper/base/scraper.py` builds one URL per row — but a
web-scale frontier meets aliases constantly; this is the standard
published fix.)

This implementation mines the two token-level rule shapes that cover
the bulk of real DUST (the paper's substring rules, restricted to
whole path/query tokens so support aggregates cleanly):

- **substitution**: token lists equal except at ONE position →
  rule ``(tok_a ↔ tok_b)`` (``?mobile=true`` vs ``?mobile=false``);
- **deletion**: one list is the other plus ONE extra token whose
  removal makes them equal → rule ``(tok ↔ ε)`` (trailing
  ``index.html``, a ``sessionid`` path segment).

Rules are undirected (the pair proves equivalence, not direction), so
each is normalized to ``(greatest, least)`` as ``(rule_from,
rule_to)`` before support counting — greatest first, so deletion
rules keep the shape ``(token, '')``.

Scale shape — the dedup-family discipline (`operators/dedup.py`):
group by content digest, capped ``collect_set`` of member URLs,
**in-array pair expansion** (never a digest self-join), then pure
in-row token algebra per pair and one rule-keyed agg.  Two shuffles
total (digest group, rule group) regardless of corpus size; a digest
bucket larger than ``max_bucket`` is a mirror-farm artifact that
contributes quadratic pairs and no new rules — capped, same recall
contract as the LSH buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import pair_expansion

# Token separators: path segments plus query-string structure.  Kept
# deliberately identical in the DuckDB oracle (string_split_regex).
TOKEN_SEP = "[/?&=]"


def url_tokens(url: Column) -> Column:
    """URL → token array split on path/query separators (empties kept —
    positions must stay aligned between the two URLs of a pair)."""
    return F.split(url, TOKEN_SEP)


def _mismatches(ta: Column, tb: Column) -> Column:
    """1-based positions where ``ta``/``tb`` differ, scanned over the
    SHORTER length only — never indexes past either array (ANSI mode
    makes an out-of-bounds ``element_at`` a hard error, and Spark's
    ``And`` does not short-circuit, so the caller's length guard
    cannot protect this expression)."""
    return F.filter(
        F.sequence(F.lit(1), F.least(F.size(ta), F.size(tb))),
        lambda i: F.element_at(ta, i) != F.element_at(tb, i),
    )


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """Mine token-level DUST rules from same-content URL pairs.

    Input: one row per fetched page with its canonical content digest
    (the crawl ledger's ``content_md5`` — `operators/fetch.py` emits
    it every round).  Output: ``(rule_from, rule_to, support)`` where
    ``rule_to = ''`` marks a deletion rule and ``support`` counts the
    distinct same-content pairs exhibiting the rule (the paper's
    support metric; filter ``support >= min_support`` to keep only
    rules with real evidence).
    """
    buckets = (
        pages.select(
            F.col(digest_col).alias("digest"), F.col(url_col).alias("url")
        )
        .groupBy("digest")
        .agg(F.slice(
            F.array_sort(F.collect_set("url")), 1, max_bucket
        ).alias("us"))
        .filter(F.size("us") >= 2)
    )
    pairs = buckets.select(
        F.explode(pair_expansion(F.col("us"))).alias("p")
    ).select(
        url_tokens(F.col("p.a_id")).alias("ta"),
        url_tokens(F.col("p.b_id")).alias("tb"),
    )
    na, nb = F.size("ta"), F.size("tb")
    mism = _mismatches(F.col("ta"), F.col("tb"))
    # --- substitution: equal length, exactly one mismatching position
    sub_rule = F.when(
        (na == nb) & (F.size(mism) == 1),
        F.struct(
            F.element_at(F.col("ta"), F.element_at(mism, 1)).alias("a"),
            F.element_at(F.col("tb"), F.element_at(mism, 1)).alias("b"),
        ),
    )

    # --- deletion: |long| == |short| + 1 and dropping the first
    # mismatching token of the long side yields the short side (no
    # mismatch within the short length => the extra token is the last)
    def _deletion(tl: Column, ts: Column, nl: Column, ns: Column) -> Column:
        d = F.coalesce(F.array_min(mism), ns + 1)
        # slice start is always >= 1 and may exceed the array end
        # (returns empty) — safe under ANSI, unlike element_at
        rest_ok = F.slice(tl, d + 1, nl) == F.slice(ts, d, ns)
        return F.when(
            (nl == ns + 1) & rest_ok,
            F.struct(F.element_at(tl, d).alias("a"), F.lit("").alias("b")),
        )

    rule = F.coalesce(
        sub_rule,
        _deletion(F.col("ta"), F.col("tb"), na, nb),
        _deletion(F.col("tb"), F.col("ta"), nb, na),
    )
    # undirected: normalize to (greatest, least) so a deletion rule is
    # always (token, '') and a substitution pair counts once
    return (
        pairs.select(rule.alias("r"))
        .filter(F.col("r").isNotNull())
        .select(
            F.greatest("r.a", "r.b").alias("rule_from"),
            F.least("r.a", "r.b").alias("rule_to"),
        )
        .groupBy("rule_from", "rule_to")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def apply_dust_rules(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Canonicalize frontier URLs through mined DELETION rules: drop
    any token a deletion rule covers, rejoin with ``/``-style
    separators erased to the token skeleton, and expose the rewritten
    key for the seen-set probe.

    Substitution rules need a direction policy (the paper picks the
    canonically smaller side) — applied here the same way: tokens
    equal to ``rule_from`` (the greater side) rewrite to ``rule_to``.
    The rules dim is tiny relative to the frontier (thousands of rules
    vs 10^10 URLs) → broadcast 1-row dims, zero shuffle on the
    frontier side.
    """
    dels = rules.filter(F.col("rule_to") == "").select(
        F.col("rule_from").alias("tok")
    )
    subs = rules.filter(F.col("rule_to") != "")
    del_arr = F.broadcast(
        dels.agg(
            F.coalesce(
                F.array_sort(F.collect_set("tok")),
                F.array().cast("array<string>"),
            ).alias("del_toks")
        )
    )
    sub_map = F.broadcast(
        subs.agg(
            F.map_from_arrays(
                F.coalesce(
                    F.collect_list("rule_from"),
                    F.array().cast("array<string>"),
                ),
                F.coalesce(
                    F.collect_list("rule_to"),
                    F.array().cast("array<string>"),
                ),
            ).alias("sub_map")
        )
    )
    toks = url_tokens(F.col(url_col))
    return (
        frontier.crossJoin(del_arr)
        .crossJoin(sub_map)
        .withColumn(
            "canon_key",
            F.array_join(
                F.transform(
                    F.filter(
                        toks,
                        lambda t: ~F.array_contains(F.col("del_toks"), t),
                    ),
                    # try_: ANSI element_at throws on a missing map key
                    lambda t: F.coalesce(
                        F.try_element_at(F.col("sub_map"), t), t
                    ),
                ),
                "/",
            ),
        )
        .drop("del_toks", "sub_map")
    )
