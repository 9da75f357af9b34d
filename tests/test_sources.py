"""Source-format readers: WARC framing, sitemap XML, robots.txt."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from legislation_scraper_spark.sources.sitemap import (
    parse_robots,
    parse_sitemap,
    parse_sitemap_index,
    robots_allows,
)
from legislation_scraper_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_stream,
    read_warc,
)

# hand-written WARC bytes — NOT produced by build_warc_bytes — with a
# payload that embeds the record-start delimiter: only Content-Length
# framing parses this correctly
TRICKY_PAYLOAD = b"<html>\r\n\r\nWARC/1.0\r\nfake: x\r\n\r\n</html>"
RAW = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: http://a.example/1\r\n"
    b"Content-Length: " + str(len(TRICKY_PAYLOAD)).encode() + b"\r\n"
    b"\r\n" + TRICKY_PAYLOAD + b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: request\r\n"
    b"WARC-Target-URI: http://a.example/1\r\n"
    b"Content-Length: 2\r\n"
    b"\r\nhi\r\n\r\n"
)


def test_content_length_framing_beats_delimiters():
    recs = list(parse_warc_stream(RAW))
    assert len(recs) == 2
    assert recs[0]["payload"] == TRICKY_PAYLOAD
    assert recs[0]["headers"]["warc-type"] == "response"
    assert recs[1]["payload"] == b"hi"


def test_truncated_tail_is_dropped():
    recs = list(parse_warc_stream(RAW + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"))
    assert len(recs) == 2


def test_read_warc_files(spark, tmp_path):
    plain = build_warc_bytes(
        [
            ("response", "http://h/1", b"body-one"),
            ("request", "http://h/1", b"GET /1"),
            ("response", "http://h/2", TRICKY_PAYLOAD),
        ]
    )
    (tmp_path / "a.warc").write_bytes(plain)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(plain))
    df = read_warc(spark, str(tmp_path), response_only=True)
    rows = df.select("path", "target_uri", "content_length").collect()
    # 2 response records per file, request filtered inside the parser
    assert len(rows) == 4
    by_uri = sorted((os.path.basename(r["path"]), r["target_uri"],
                     r["content_length"]) for r in rows)
    assert by_uri == [
        ("a.warc", "http://h/1", 8),
        ("a.warc", "http://h/2", len(TRICKY_PAYLOAD)),
        ("b.warc.gz", "http://h/1", 8),
        ("b.warc.gz", "http://h/2", len(TRICKY_PAYLOAD)),
    ]


SITEMAP = """<?xml version="1.0"?>
<urlset><url><loc>http://h/a</loc><lastmod>2024-01-02</lastmod>
<priority>0.8</priority></url>
<url><loc>http://h/b</loc></url></urlset>"""

SITEMAP_INDEX = """<sitemapindex>
<sitemap><loc>http://h/s1.xml</loc></sitemap>
<sitemap><loc>http://h/s2.xml</loc></sitemap></sitemapindex>"""


def test_parse_sitemap_and_index(spark):
    df = spark.createDataFrame(
        [(1, SITEMAP), (2, "<not-xml"), (3, SITEMAP_INDEX)], "i int, x string"
    )
    urls = {
        r["i"]: r["u"]
        for r in df.select("i", parse_sitemap(F.col("x")).alias("u")).collect()
    }
    assert [(u["loc"], u["lastmod"], u["priority"]) for u in urls[1]] == [
        ("http://h/a", "2024-01-02", 0.8),
        ("http://h/b", None, None),
    ]
    assert urls[2] is None  # malformed → NULL, row not lost
    idx = df.filter("i = 3").select(
        parse_sitemap_index(F.col("x")).alias("locs")
    ).collect()[0]["locs"]
    assert idx == ["http://h/s1.xml", "http://h/s2.xml"]


ROBOTS = """# comment line
User-agent: *
User-agent: GoodBot
Disallow: /admin
Allow: /admin/public

User-agent: BadBot
Disallow: /
Crawl-delay: 10
"""


def test_parse_robots_groups(spark):
    df = spark.createDataFrame([("h1", ROBOTS)], "host string, body string")
    rows = sorted(
        (r["agent"], r["directive"], r["path"])
        for r in parse_robots(df).collect()
    )
    assert rows == [
        ("*", "allow", "/admin/public"),
        ("*", "disallow", "/admin"),
        ("badbot", "disallow", "/"),
        ("goodbot", "allow", "/admin/public"),
        ("goodbot", "disallow", "/admin"),
    ]


def test_robots_allows_longest_match(spark):
    rules = parse_robots(
        spark.createDataFrame([("h1", ROBOTS)], "host string, body string")
    )
    cand = spark.createDataFrame(
        [
            ("h1", "/admin/secret"),   # matches Disallow /admin only
            ("h1", "/admin/public/x"), # longer Allow wins
            ("h1", "/open"),           # no rule → allowed
            ("h2", "/admin/secret"),   # unknown host → allowed
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_allows(cand, rules, agent="*").collect()
    }
    assert got == {
        ("h1", "/admin/secret"): False,
        ("h1", "/admin/public/x"): True,
        ("h1", "/open"): True,
        ("h2", "/admin/secret"): True,
    }


WILD_ROBOTS = """User-agent: *
Disallow: /*.pdf$
Disallow: /tmp*
Allow: /tmp/ok
Disallow
Allow:
"""


def test_robots_wildcard_and_anchor_rules(spark):
    rules = parse_robots(
        spark.createDataFrame([("h", WILD_ROBOTS)], "host string, body string")
    )
    got = sorted((r["directive"], r["path"]) for r in rules.collect())
    # the colon-less 'Disallow' line and the empty 'Allow:' are ignored
    assert got == [
        ("allow", "/tmp/ok"),
        ("disallow", "/*.pdf$"),
        ("disallow", "/tmp*"),
    ]
    cand = spark.createDataFrame(
        [("h", "/docs/a.pdf"),      # *.pdf$ → disallowed
         ("h", "/docs/a.pdfx"),     # $ anchor: NOT matched → allowed
         ("h", "/tmp/zzz"),         # /tmp* → disallowed
         ("h", "/tmp/ok/sub"),      # longer Allow wins over /tmp*
         ("h", "/a+b(c)"),          # regex metachars in path are safe
         ],
        "host string, path string",
    )
    got = {
        r["path"]: r["allowed"]
        for r in robots_allows(cand, rules, agent="*").collect()
    }
    assert got == {
        "/docs/a.pdf": False,
        "/docs/a.pdfx": True,
        "/tmp/zzz": False,
        "/tmp/ok/sub": True,
        "/a+b(c)": True,
    }


def test_wet_record_octet_framing_roundtrips(spark):
    # Multi-byte text: octet length (framing) must differ from the
    # character count, and the REAL parser kernel must recover the
    # exact utf-8 payload from the emitted bytes.
    from pyspark.sql import functions as F

    from legislation_scraper_spark.sources.warc import wet_record

    texts = ["ação nº 12/2024 — artigo 5º", "plain ascii", "ß∂ƒ©"]
    df = spark.createDataFrame(
        [(f"http://h/{i}", t) for i, t in enumerate(texts)],
        "uri string, text string",
    )
    rows = df.select(
        "uri", "text",
        wet_record(F.col("uri"), F.col("text")).alias("rec"),
    ).collect()
    assert any(
        len(r.text.encode()) != len(r.text) for r in rows
    )  # the invariant is actually exercised
    stream = b"".join(bytes(r.rec) for r in rows)
    recs = list(parse_warc_stream(stream))
    assert [r["payload"].decode() for r in recs] == texts
    assert [r["headers"]["warc-target-uri"] for r in recs] == [
        r.uri for r in rows
    ]
    assert all(
        r["headers"]["warc-type"] == "conversion" for r in recs
    )
    assert [int(r["headers"]["content-length"]) for r in recs] == [
        len(t.encode()) for t in texts
    ]


def test_warc_negative_content_length_rejected():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -33\r\n\r\npayload")
    assert list(parse_warc_stream(bad)) == []
    good_then_bad = RAW + bad
    assert len(list(parse_warc_stream(good_then_bad))) == 2


def test_surt_key_examples(spark):
    from legislation_scraper_spark.sources.cdx import surt_key

    df = spark.createDataFrame(
        [
            ("https://WWW.Planalto.Gov.BR/ccivil_03/leis",),
            ("http://example.org",),
            ("https://sub.a.example.org/x?q=1",),
        ],
        "url string",
    )
    got = [r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [
        "br,gov,planalto)/ccivil_03/leis",
        "org,example)/",
        "org,example,a,sub)/x?q=1",
    ]


def test_cdxj_parse_and_latest(spark):
    from legislation_scraper_spark.sources.cdx import (
        latest_captures,
        parse_cdxj,
    )

    lines = spark.createDataFrame(
        [
            ('org,example)/a 20240101000000 {"url": "https://example.org/a",'
             ' "mime": "text/html", "status": "200", "digest": "sha1:x1",'
             ' "length": "10", "offset": "0", "filename": "w0.warc.gz"}',),
            ('org,example)/a 20240301000000 {"url": "https://example.org/a",'
             ' "mime": "text/html", "status": "200", "digest": "sha1:x2",'
             ' "length": "11", "offset": "5", "filename": "w1.warc.gz"}',),
            ('org,example)/b 20240201000000 {"url": "https://example.org/b",'
             ' "mime": "text/html", "status": "404", "digest": "sha1:y",'
             ' "length": "9", "offset": "7", "filename": "w0.warc.gz"}',),
            ("org,example)/c 20240401000000 {broken",),
        ],
        "line string",
    )
    parsed = parse_cdxj(lines)
    rows = {(r["urlkey"], str(r["ts"])): r for r in parsed.collect()}
    assert len(rows) == 4
    assert rows[("org,example)/c", "2024-04-01 00:00:00")]["url"] is None
    assert rows[("org,example)/a", "2024-03-01 00:00:00")]["digest"] == "sha1:x2"
    assert rows[("org,example)/b", "2024-02-01 00:00:00")]["status"] == 404

    latest = {r["urlkey"]: r for r in latest_captures(parsed).collect()}
    # only the 200-status urlkey survives; newest capture wins
    assert set(latest) == {"org,example)/a"}
    assert latest["org,example)/a"]["digest"] == "sha1:x2"
    assert latest["org,example)/a"]["offset"] == 5


def test_surt_key_matches_python_twin_on_adversarial_urls(spark):
    """Column-expression SURT vs an independent straight-line Python
    twin over adversarial URL shapes (ports, queries, fragments,
    uppercase schemes, www variants, deep subdomains, trailing
    slashes)."""
    import re as _re

    def surt_py(url: str) -> str:
        u = url.lower()
        u = _re.sub(r"^[a-z][a-z0-9+.-]*://", "", u)
        u = _re.sub(r"^www\d*\.", "", u)
        host, sep, rest = u.partition("/")
        path = sep + rest
        rev = ",".join(reversed(host.split(".")))
        return rev + ")" + (path if path else "/")

    urls = [
        "https://example.org",
        "https://example.org/",
        "HTTPS://EXAMPLE.ORG/A/B?C=1#frag",
        "http://www.example.org/x",
        "http://www2.example.org/x",
        "http://wwwx.example.org/x",       # not a www prefix
        "https://a.b.c.d.example.co.uk/deep/path/",
        "ftp://files.example.org/pub",
        "https://example.org:8443/port/kept",
        "https://example.org/a//b///c",
        "https://xn--caf-dma.example/menu",
        "https://example.org/%2Fencoded?x=%20y",
    ]
    from legislation_scraper_spark.sources.cdx import surt_key

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()
    ]
    assert got == [surt_py(u) for u in urls]


def test_crawl_delays_precedence_and_parsing(spark):
    body = (
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n\n"
        "User-agent: legisbot\nDisallow: /y\nCrawl-delay: 10\n"
        "Crawl-delay: 4\n"
    )
    from legislation_scraper_spark.sources.sitemap import (
        crawl_delays,
        parse_robots,
    )

    df = spark.createDataFrame(
        [("h1", body),
         ("h2", "User-agent: *\nCrawl-delay: 1\n"),
         ("h3", "User-agent: *\nCrawl-delay: fast\n"),   # non-numeric
         ("h4", "User-agent: *\nDisallow: /\n")],         # no delay line
        "host string, body string",
    )
    rules = parse_robots(df, directives=None)
    # default parse_robots output excludes crawl-delay rows (contract
    # unchanged for existing callers)
    assert all(
        r["directive"] in ("allow", "disallow")
        for r in parse_robots(df).collect()
    )
    got = {
        r["host"]: r["crawl_delay_ms"]
        for r in crawl_delays(rules, agent="legisbot").collect()
    }
    # exact agent group (max of its two lines) beats '*'; h3/h4 absent
    assert got == {"h1": 10000, "h2": 1000}
    got_star = {
        r["host"]: r["crawl_delay_ms"]
        for r in crawl_delays(rules, agent="otherbot").collect()
    }
    assert got_star == {"h1": 2500, "h2": 1000}


def test_sitemap_locs_comment_and_scheme(spark):
    from legislation_scraper_spark.sources.sitemap import sitemap_locs

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://h1.org/a.xml  # primary\n"
        "sitemap: https://h1.org/b.xml\n"
        "# Sitemap: https://h1.org/commented.xml\n"
        "Sitemap:\n"  # empty value ignored
    )
    df = spark.createDataFrame([("h1", body)], "host string, body string")
    got = sorted(r["sitemap_url"] for r in sitemap_locs(df).collect())
    assert got == ["https://h1.org/a.xml", "https://h1.org/b.xml"]


def test_revisit_records_digest_dedup(spark):
    from datetime import datetime

    from legislation_scraper_spark.sources.warc import plan_revisit_records

    t = datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        # digest A: original at t on site a; later captures revisit it
        ("https://a.com/x", t, "A"),
        ("https://b.com/mirror", t2, "A"),
        ("https://a.com/x", t2, "A"),
        # ts tie at the front → lexicographically smaller url wins
        ("https://c.com/z", t, "B"),
        ("https://c.com/a", t, "B"),
        # exact-duplicate capture rows: both stay response
        ("https://d.com/d", t, "C"),
        ("https://d.com/d", t, "C"),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, digest string")
    got = {
        (r["url"], r["ts"], r["digest"]): (
            r["warc_type"], r["refers_to_uri"], r["refers_to_ts"],
        )
        for r in plan_revisit_records(df).collect()
    }
    assert got[("https://a.com/x", t, "A")] == ("response", None, None)
    assert got[("https://b.com/mirror", t2, "A")] == (
        "revisit", "https://a.com/x", t,
    )
    assert got[("https://a.com/x", t2, "A")] == (
        "revisit", "https://a.com/x", t,
    )
    assert got[("https://c.com/a", t, "B")] == ("response", None, None)
    assert got[("https://c.com/z", t, "B")] == (
        "revisit", "https://c.com/a", t,
    )
    assert got[("https://d.com/d", t, "C")] == ("response", None, None)
    assert len(plan_revisit_records(df).collect()) == len(rows)


def test_wat_record_shape_and_roundtrip(spark):
    import json
    from datetime import datetime

    from legislation_scraper_spark.sources.warc import wat_records

    pages = spark.createDataFrame(
        [(
            "https://h/x",
            datetime(2024, 3, 5, 6, 7, 8),
            "sha1:abc",
            'T "quoted" í',
            ["https://h/a", "https://h/b"],
        )],
        "url string, ts timestamp, digest string, title string, "
        "links array<string>",
    )
    row = wat_records(pages).first()
    env = json.loads(row["wat"])["Envelope"]
    assert env["Format"] == "WARC"
    hm = env["WARC-Header-Metadata"]
    assert hm["WARC-Target-URI"] == "https://h/x"
    assert hm["WARC-Date"] == "2024-03-05T06:07:08Z"
    assert hm["WARC-Type"] == "response"
    html = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert html["Head"]["Title"] == 'T "quoted" í'
    assert [l["url"] for l in html["Links"]] == [
        "https://h/a", "https://h/b",
    ]


def test_sitemap_staleness_classification(spark):
    from datetime import datetime

    from legislation_scraper_spark.sources.sitemap import (
        sitemap_staleness,
    )

    t1 = datetime(2024, 1, 1)
    t2 = datetime(2024, 6, 1)
    entries = spark.createDataFrame(
        [
            ("u1", t2),    # lastmod after fetch → stale
            ("u2", t1),    # lastmod before fetch → fresh
            ("u3", t1),    # never fetched → unseen
            ("u4", None),  # fetched, no lastmod → unknown
            ("u5", t1),    # lastmod == fetch → fresh (not newer)
        ],
        "url string, lastmod timestamp",
    )
    visited = spark.createDataFrame(
        [("u1", t1), ("u2", t2), ("u4", t1), ("u5", t1)],
        "url string, fetched_ts timestamp",
    )
    got = {
        r["url"]: r["status"]
        for r in sitemap_staleness(entries, visited).collect()
    }
    assert got == {
        "u1": "stale", "u2": "fresh", "u3": "unseen",
        "u4": "unknown", "u5": "fresh",
    }


def test_feed_parse_rss_and_atom(spark):
    from legislation_scraper_spark.sources.feed import parse_feed

    rss = (
        '<rss version="2.0"><channel><title>s</title>'
        "<item><title>A</title><link>http://h/1</link>"
        "<pubDate>Tue, 10 Jun 2003 04:00:00 GMT</pubDate></item>"
        "<item><title>B</title><link>http://h/2</link>"
        "<pubDate>2024-01-02</pubDate></item></channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>s</title>'
        '<entry><title>C</title><link href="http://h/3"/>'
        "<updated>2024-04-05T00:00:00Z</updated></entry></feed>"
    )
    df = spark.createDataFrame([(1, rss), (2, atom)], "i int, xml string")
    out = (
        df.select("i", F.explode(parse_feed(F.col("xml"))).alias("e"))
        .select("i", "e.url", "e.title", "e.published")
        .collect()
    )
    got = {(r["i"], r["url"], r["title"], r["published"]) for r in out}
    assert got == {
        (1, "http://h/1", "A", "Tue, 10 Jun 2003 04:00:00 GMT"),
        (1, "http://h/2", "B", "2024-01-02"),
        (2, "http://h/3", "C", "2024-04-05T00:00:00Z"),
    }


def test_feed_parse_non_feed_is_null(spark):
    from legislation_scraper_spark.sources.feed import parse_feed

    rows = [
        (1, "<html><body>not a feed</body></html>"),
        (2, "totally not xml <<<"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "i int, xml string")
    out = df.select("i", parse_feed(F.col("xml")).alias("e")).collect()
    assert all(r["e"] is None for r in out)


def test_feed_parse_missing_fields_kept_null(spark):
    from legislation_scraper_spark.sources.feed import parse_feed

    rss = (
        '<rss version="2.0"><channel><title>s</title>'
        "<item><link>http://h/1</link></item></channel></rss>"
    )
    df = spark.createDataFrame([(rss,)], "xml string")
    e = df.select(F.explode(parse_feed(F.col("xml"))).alias("e")).first()["e"]
    assert e["url"] == "http://h/1"
    assert e["title"] is None and e["published"] is None
