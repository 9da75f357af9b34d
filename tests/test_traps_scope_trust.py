"""Round-3 frontier-hygiene operators: TrustRank, crawler-trap
templates, SURT-prefix scope rules."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.graph import trustrank
from legislation_scraper_spark.operators.traps import (
    flag_trap_urls,
    template_stats,
)
from legislation_scraper_spark.functions.urls import url_template
from legislation_scraper_spark.sources.cdx import scope_filter


def _py_trustrank(edges, seeds, iters=2, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    od = Counter(s for s, _ in edges)
    live = sorted(set(seeds) & set(nodes))
    tele = {v: (1.0 / len(live) if v in live else 0.0) for v in nodes}
    rank = dict(tele)
    for _ in range(iters):
        contrib = defaultdict(float)
        for s, t in edges:
            contrib[t] += rank[s] / od[s]
        rank = {
            v: (1 - d) * tele[v] + d * contrib.get(v, 0.0) for v in nodes
        }
    return rank


def test_trustrank_matches_straight_line(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("spam1", "spam2"), ("spam2", "spam1"), ("c", "spam1"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("ghost",)], "node string")
    tr = {
        r["node"]: round(r["rank"], 9)
        for r in trustrank(df, seeds, iters=3).collect()
    }
    expect = {
        v: round(r, 9)
        for v, r in _py_trustrank(edges, {"a", "ghost"}, iters=3).items()
    }
    assert tr == expect
    # the disconnected spam cycle holds no trust beyond what c leaks in;
    # spam2 (two hops from the nearest trusted page at iter 3) ranks
    # strictly below every trusted-component node
    assert tr["spam2"] < min(tr["a"], tr["b"], tr["c"])


def test_trustrank_no_live_seeds_is_all_zero(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("zz",)], "node string")
    assert {
        r["rank"] for r in trustrank(df, seeds, iters=2).collect()
    } == {0.0}


def test_url_template_examples(spark):
    rows = spark.range(1).select(
        url_template(
            F.lit("https://www.x.leg.br/norma/12345?sid=9&lang=pt")
        ).alias("a"),
        url_template(F.lit("http://h.com/cal/2020/07")).alias("b"),
        url_template(F.lit("https://h.com/s/deadbeefcafe1234/v")).alias(
            "c"
        ),
        url_template(F.lit("https://h.com/")).alias("d"),
    ).first()
    assert rows["a"] == "/norma/~N?lang,sid"
    assert rows["b"] == "/cal/~N/~N?"
    # hex run collapses as one token, not shredded by its digits
    assert rows["c"] == "/s/~H/v?"
    assert rows["d"] == "/?"


def test_template_stats_flags_calendar_trap(spark):
    pages = spark.createDataFrame(
        [
            ("https://www.x.leg.br/norma/1?sid=5", "doc one"),
            ("https://www.x.leg.br/norma/2?sid=9", "doc two"),
            ("https://www.x.leg.br/cal/2020/1?view=month", "cal"),
            ("https://www.x.leg.br/cal/2020/2?view=month", "cal"),
            ("https://www.x.leg.br/cal/2021/1?view=month", "cal"),
            ("https://www.x.leg.br/cal/2021/2?view=month", "cal"),
        ],
        "url string, text string",
    )
    st = {
        r["template"]: (r["n_urls"], r["n_contents"], r["trap_score"])
        for r in template_stats(pages).collect()
    }
    assert st["/cal/~N/~N?view"] == (4, 1, 4.0)
    assert st["/norma/~N?sid"] == (2, 2, 1.0)
    cand = spark.createDataFrame(
        [
            ("https://www.x.leg.br/cal/2022/3?view=month",),
            ("https://www.x.leg.br/norma/3?sid=1",),
        ],
        "url string",
    )
    flags = {
        r["url"]: r["is_trap"]
        for r in flag_trap_urls(
            cand, template_stats(pages), threshold=3.0
        ).collect()
    }
    assert flags == {
        "https://www.x.leg.br/cal/2022/3?view=month": True,
        "https://www.x.leg.br/norma/3?sid=1": False,
    }


def test_scope_filter_longest_prefix_and_tiebreak(spark):
    rules = spark.createDataFrame(
        [
            ("br,leg,", True),
            ("br,leg,src1", False),
            ("br,leg,src1)/norma", True),
            ("br,leg,src12)", True),
            # equal-length conflicting pair: deny must win the tie
            ("br,leg,src5)/x", True),
            ("br,leg,src5)/x", False),
        ],
        "surt_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [
            ("https://www.src1.leg.br/norma/5",),
            ("https://www.src1.leg.br/busca?q=1",),
            ("https://www.src10.leg.br/norma/5",),
            ("https://www.src12.leg.br/busca",),
            ("https://www.src2.leg.br/x",),
            ("https://www.src5.leg.br/x/1",),
            ("https://www.other.com/x",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in scope_filter(cands, rules).collect()
    }
    assert got == {
        "https://www.src1.leg.br/norma/5": True,
        "https://www.src1.leg.br/busca?q=1": False,
        # paren-less prefix covers host-label completions (Heritrix
        # SurtPrefixScope semantics)
        "https://www.src10.leg.br/norma/5": False,
        "https://www.src12.leg.br/busca": True,
        "https://www.src2.leg.br/x": True,
        "https://www.src5.leg.br/x/1": False,
        "https://www.other.com/x": False,
    }


def test_scope_filter_candidates_never_shuffle(spark):
    rules = spark.createDataFrame(
        [("br,leg,", True)], "surt_prefix string, allow boolean"
    )
    cands = spark.createDataFrame(
        [("https://www.a.leg.br/x",)], "url string"
    )
    plan = (
        scope_filter(cands, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rule table folds to one broadcast row; the candidate side has
    # no Exchange (scan → project only) — the single non-broadcast
    # Exchange in the plan is the rules side's 1-row collect_list agg
    assert "BroadcastNestedLoopJoin" in plan
    non_broadcast = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert non_broadcast == 1 and "Exchange SinglePartition" in plan


def test_assign_identities_rotates_per_block(spark):
    import hashlib

    import pytest

    from legislation_scraper_spark.operators.identity import (
        assign_identities,
    )

    pool = ["vpn0", "vpn1", "vpn2"]
    frontier = spark.createDataFrame(
        [("a.com",), ("b.com",), ("c.com",)], "host string"
    )
    # a.com blocked twice, b.com once, c.com never
    blocks = spark.createDataFrame(
        [("a.com",), ("a.com",), ("b.com",)], "host string"
    )
    got = {
        r["host"]: (r["n_blocks"], r["identity"])
        for r in assign_identities(frontier, blocks, pool).collect()
    }

    def expect(host, n):
        start = int(hashlib.md5(host.encode()).hexdigest()[:3], 16)
        return (n, pool[(start + n) % len(pool)])

    assert got == {
        "a.com": expect("a.com", 2),
        "b.com": expect("b.com", 1),
        "c.com": expect("c.com", 0),
    }
    # one more block advances exactly one slot (the LRU cycle)
    blocks2 = blocks.union(
        spark.createDataFrame([("c.com",)], "host string")
    )
    got2 = {
        r["host"]: r["identity"]
        for r in assign_identities(frontier, blocks2, pool).collect()
    }
    assert got2["c.com"] == expect("c.com", 1)[1]
    with pytest.raises(ValueError):
        assign_identities(frontier, blocks, [])


def test_snapshot_diff_classifies_all_four(spark):
    from legislation_scraper_spark.operators.revisit import snapshot_diff

    old = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d2"), ("u3", "d3")],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [("u1", "d1"), ("u2", "dX"), ("u4", "d4")],
        "url string, digest string",
    )
    got = {
        r["url"]: (r["change"], r["old_digest"], r["new_digest"])
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        "u1": ("unchanged", "d1", "d1"),
        "u2": ("changed", "d2", "dX"),
        "u3": ("removed", "d3", None),
        "u4": ("added", None, "d4"),
    }


def test_parse_head_meta_and_robots_directives(spark):
    from legislation_scraper_spark.operators.meta import (
        apply_robots_meta,
        parse_head_meta,
    )

    pages = spark.createDataFrame(
        [
            (
                "u1",
                '<html><head><TITLE> Lei Um </TITLE>'
                '<link rel="canonical" href="https://x/norma/1">'
                '<meta name="robots" content="NOINDEX , nofollow">'
                "</head></html>",
            ),
            (
                "u2",
                '<html><head><title>Dois</title>'
                '<meta property="og:title" content="OG Dois">'
                '<meta name="robots" content="none"></head></html>',
            ),
            ("u3", "<html><head><title>Tres</title></head></html>"),
            ("u4", "<html><head></head><body>sem titulo</body></html>"),
        ],
        "url string, html_text string",
    )
    m = parse_head_meta(pages)
    got = {
        r["url"]: (
            r["title"], r["canonical"], r["og_title"],
            r["noindex"], r["nofollow"],
        )
        for r in m.collect()
    }
    assert got["u1"] == (
        "Lei Um", "https://x/norma/1", None, True, True,
    )
    # 'none' implies both directives
    assert got["u2"] == ("Dois", None, "OG Dois", True, True)
    assert got["u3"] == ("Tres", None, None, False, False)
    assert got["u4"] == (None, None, None, False, False)

    outlinks = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2"), ("u3", "t3")],
        "src string, dst string",
    )
    indexable, followable = apply_robots_meta(m, outlinks)
    assert {r["url"] for r in indexable.collect()} == {"u3", "u4"}
    assert {r["dst"] for r in followable.collect()} == {"t3"}


def test_script_profile_mixed_and_empty(spark):
    from legislation_scraper_spark.functions.text import script_profile

    rows = [
        (1, "lei ordinária"),            # pure latin (incl. accents)
        (2, "закон и kodex"),            # cyrillic-majority mix
        (3, "法律 の 条文"),               # cjk (han + kana)
        (4, "123 .,;"),                  # no letters at all
        (5, "ab яз"),                    # 2 vs 2 tie → latin (decl order)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (
            r["dominant_script"], r["n_latin"], r["n_cyrillic"], r["n_cjk"],
        )
        for r in df.select("doc_id", *script_profile(F.col("text"))).collect()
    }
    assert got[1] == ("latin", 12, 0, 0)
    assert got[2][0] == "cyrillic" and got[2][1] == 5  # 'kodex' letters
    assert got[3][0] == "cjk" and got[3][3] == 5
    assert got[4] == ("unk", 0, 0, 0)
    assert got[5] == ("latin", 2, 2, 0)


def test_url_template_matches_python_twin_on_adversarial_urls(spark):
    """Column-expression url_template vs an independent straight-line
    Python twin over adversarial shapes: no path, no query, empty query,
    repeated params, valueless params, '=' in values, ports, fragments
    riding the query, hex-vs-digit boundaries, '?' in the first path
    position."""
    import re as _re

    def template_py(url: str) -> str:
        pq = _re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", url)
        qpos = pq.find("?")
        path = pq if qpos < 0 else pq[:qpos]
        query = "" if qpos < 0 else pq[qpos + 1 :]
        norm = _re.sub("[0-9]+", "~N", _re.sub("[0-9a-f]{8,}", "~H", path))
        if query == "":
            keys = ""
        else:
            keys = ",".join(sorted(kv.split("=", 1)[0] for kv in query.split("&")))
        return norm + "?" + keys

    urls = [
        "https://example.org",
        "https://example.org/",
        "https://example.org/a/b",
        "https://example.org/a?",
        "https://example.org/a?x",
        "https://example.org/a?x=1&x=2",
        "https://example.org/a?b=c=d&a",
        "https://example.org:8443/v2/items007",
        "https://example.org/deadbeef12345678/x",
        "https://example.org/dead/beef",
        "https://example.org/?q=1#frag",
        "https://example.org/abc123def456",
        "HTTP://EXAMPLE.ORG/CAPS/09",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["t"]
        for r in df.select(url_template(F.col("url")).alias("t")).collect()
    ]
    assert got == [template_py(u) for u in urls]


def test_template_stats_single_shuffle_plan(spark):
    pages = spark.createDataFrame(
        [("https://www.x.leg.br/a/1", "t")], "url string, text string"
    )
    plan = (
        template_stats(pages)._jdf.queryExecution().executedPlan().toString()
    )
    # two exchanges, both partial-aggregated: the distinct-count
    # pre-agg keyed by (host, template, chash) and the final
    # (host, template) agg; every exchange is preceded by a partial
    # HashAggregate and page bodies never shuffle
    non_broadcast = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert non_broadcast == 2
    assert "partial_count" in plan and "chash" in plan


def test_assign_identities_frontier_never_shuffles(spark):
    from legislation_scraper_spark.operators.identity import (
        assign_identities,
    )

    frontier = spark.createDataFrame([("a.com",)], "host string")
    blocks = spark.createDataFrame([("a.com",)], "host string")
    plan = (
        assign_identities(frontier, blocks, ["i0", "i1"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchanges are the block-count aggregation (host-bounded)
    # and its broadcast; the frontier side joins map-side
    assert "BroadcastHashJoin" in plan
    non_broadcast = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert non_broadcast == 1


def test_homoglyph_fold_and_count(spark):
    from legislation_scraper_spark.functions.text import (
        fold_homoglyphs,
        homoglyph_count,
    )

    rows = [
        (1, "рауРal.com"),       # Cyrillic р,а,у,Р → paypal skeleton
        (2, "normal latin"),
        (3, "Ελλάδα"),            # Greek: only confusable caps/ο/ν fold
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["f"], r["n"])
        for r in df.select(
            "doc_id",
            fold_homoglyphs(F.col("text")).alias("f"),
            homoglyph_count(F.col("text")).alias("n"),
        ).collect()
    }
    assert got[1] == ("payPal.com", 4)
    assert got[2] == ("normal latin", 0)
    # 'Ε' folds to 'E'; lowercase ε/λ/δ are NOT confusables and stay
    assert got[3][0].startswith("E") and got[3][1] == 1
    # fold ∘ swap = identity on mapped chars: dedup fingerprints collide
    a = spark.createDataFrame(
        [("texto de lei",), ("tеxto dе lеi",)], "t string"  # Cyrillic е
    )
    fps = {
        r["fp"]
        for r in a.select(
            F.md5(fold_homoglyphs(F.col("t"))).alias("fp")
        ).collect()
    }
    assert len(fps) == 1


def test_robots_directive_flags_and_effective_combination(spark):
    from legislation_scraper_spark.operators.meta import (
        effective_robots,
        robots_directive_flags,
    )

    rows = [
        (1, "NOINDEX , nofollow", False, False),
        (2, "none", False, False),
        (3, None, True, False),     # meta says noindex, header silent
        (4, None, False, False),
        (5, "nofollow", False, True),
    ]
    df = spark.createDataFrame(
        rows, "id int, header string, m_ni boolean, m_nf boolean"
    )
    flags = df.select(
        "id", *robots_directive_flags(F.col("header"))
    )
    got = {r["id"]: (r["noindex"], r["nofollow"]) for r in flags.collect()}
    assert got[1] == (True, True)
    assert got[2] == (True, True)    # 'none' implies both
    assert got[3] == (False, False)  # header silent
    eff = df.select(
        "id",
        *effective_robots(F.col("m_ni"), F.col("m_nf"), F.col("header")),
    )
    g2 = {r["id"]: (r["noindex"], r["nofollow"]) for r in eff.collect()}
    assert g2[3] == (True, False)    # meta channel alone suffices
    assert g2[5] == (False, True)    # header alone suffices
    assert g2[1] == (True, True)     # union of channels


def test_seed_hops_bfs_levels_and_unreached(spark):
    from legislation_scraper_spark.operators.graph import seed_hops

    edges = [
        ("s", "a"), ("a", "b"), ("b", "c"), ("c", "d"),
        ("x", "y"),                       # island, unreachable
        ("b", "a"),                       # back edge must not lower a
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("s",), ("ghost",)], "node string")
    got = {
        r["node"]: r["hops"]
        for r in seed_hops(df, seeds, max_hops=3).collect()
    }
    assert got == {
        "s": 0, "a": 1, "b": 2, "c": 3,
        "d": None,                        # 4 hops > max_hops
        "x": None, "y": None,             # disconnected island
    }


def test_percent_normalize_rfc3986(spark):
    from legislation_scraper_spark.functions.urls import percent_normalize

    cases = {
        "https://h/%41bc": "https://h/Abc",
        "https://h/a%3ab": "https://h/a%3Ab",
        "https://h/%7Euser": "https://h/~user",
        "https://h/a%2Fb": "https://h/a%2Fb",        # reserved stays
        "https://h/100%25off": "https://h/100%25off",  # escaped % stays
        "https://h/bad%G1x": "https://h/bad%G1x",    # malformed intact
        "https://h/trail%": "https://h/trail%",
        "no-escapes": "no-escapes",
        "https://h/%e7%81%af": "https://h/%E7%81%AF",  # utf-8 bytes upper
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["n"]
        for r in df.select(
            "u", percent_normalize(F.col("u")).alias("n")
        ).collect()
    }
    assert got == cases


def test_percent_normalize_matches_python_twin_on_random_strings(spark):
    """Seeded adversarial generator: random ASCII with dense '%'
    clusters, compared against an independent straight-line twin."""
    import random
    import re as _re

    rng = random.Random(20240817)
    alphabet = list("abzAZ09-._~%253AfFgG/ ?&=")

    def gen():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))

    def twin(u: str) -> str:
        parts = u.split("%")
        out = [parts[0]]
        for f in parts[1:]:
            if _re.match(r"^[0-9A-Fa-f]{2}", f):
                h = f[:2].upper()
                ch = chr(int(h, 16))
                if _re.match(r"^[A-Za-z0-9._~-]$", ch):
                    out.append(ch + f[2:])
                else:
                    out.append("%" + h + f[2:])
            else:
                out.append("%" + f)
        return "".join(out)

    from legislation_scraper_spark.functions.urls import percent_normalize

    cases = [gen() for _ in range(300)]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = {
        r["u"]: r["n"]
        for r in df.select(
            "u", percent_normalize(F.col("u")).alias("n")
        ).collect()
    }
    for c in cases:
        assert got[c] == twin(c), repr(c)


def test_mojibake_roundtrip_full_charset(spark):
    """Every char in the repair table roundtrips: corrupt via the
    Unicode identity (utf-8 bytes read as latin-1), repair, compare."""
    from legislation_scraper_spark.functions.text import (
        MOJIBAKE_PAIRS,
        fix_mojibake,
        mojibake_count,
    )

    rows = [
        (i, f"x{good}y", f"x{bad}y")
        for i, (bad, good) in enumerate(MOJIBAKE_PAIRS)
    ]
    df = spark.createDataFrame(rows, "i int, clean string, dirty string")
    out = df.select(
        "i",
        "clean",
        fix_mojibake(F.col("dirty")).alias("fixed"),
        mojibake_count(F.col("dirty")).alias("n"),
    ).collect()
    for r in out:
        assert r["fixed"] == r["clean"], r
        assert r["n"] == 1, r


def test_mojibake_double_corruption_two_passes(spark):
    from legislation_scraper_spark.functions.text import fix_mojibake

    double = "não".encode("utf-8").decode("latin-1")
    double = double.encode("utf-8").decode("latin-1")  # twice-corrupted
    df = spark.createDataFrame([(double,)], "t string")
    once = df.select(fix_mojibake(F.col("t")).alias("f"))
    assert once.first()["f"] != "não"  # one pass peels one level
    twice = once.select(fix_mojibake(F.col("f")).alias("f"))
    assert twice.first()["f"] == "não"


def test_mojibake_clean_text_untouched(spark):
    from legislation_scraper_spark.functions.text import (
        fix_mojibake,
        mojibake_count,
    )

    df = spark.createDataFrame(
        [("plain ascii",), ("já ação nº 1º §2º coração",)], "t string"
    )
    out = df.select(
        "t",
        fix_mojibake(F.col("t")).alias("f"),
        mojibake_count(F.col("t")).alias("n"),
    ).collect()
    for r in out:
        assert r["f"] == r["t"]
        assert r["n"] == 0


def test_soft404_flags(spark):
    from legislation_scraper_spark.operators.traps import soft404_flags

    long_pad = " conteúdo real da norma estadual" * 5
    rows = [
        (1, 200, "Página não encontrada" + long_pad),   # phrase hit
        (2, 200, "PÃ¡gina nÃ£o encontrada" + long_pad),  # mojibake hit
        (3, 404, "Página não encontrada"),               # hard 404: not soft
        (4, 200, "A Lei 404 de 1990 dispõe sobre" + long_pad),  # legit
        (5, 200, "ok"),                                  # stub body
        (6, 200, ""),                                    # empty body
    ]
    df = spark.createDataFrame(rows, "id int, status int, text string")
    got = {
        r["id"]: r["soft404"] for r in soft404_flags(df).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True, 6: True}


def test_soft404_no_repair_misses_mojibake(spark):
    from legislation_scraper_spark.operators.traps import soft404_flags

    body = "PÃ¡gina nÃ£o encontrada" + " x" * 40
    df = spark.createDataFrame([(1, 200, body)], "id int, status int, text string")
    assert soft404_flags(df, repair_encoding=False).first()["soft404"] is False
    assert soft404_flags(df).first()["soft404"] is True
