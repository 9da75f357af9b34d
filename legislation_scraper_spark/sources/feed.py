"""RSS / Atom feed source: URL discovery from syndication feeds.

Government sites that the reference reaches by walking search listings
(e.g. its per-year result-page enumeration,
/root/reference/src/scraper/base/scraper.py) usually ALSO publish
"latest acts" feeds — diario RSS channels, Atom feeds on CMS portals.
For an open frontier they are the cheapest discovery channel: one
fetch yields the newest N documents with titles and dates, no
pagination walk.  This source parses both families into one row shape
the frontier admits directly, complementing ``sources/sitemap.py``
(bulk inventory) with recency-oriented discovery.

Spark-first: the whole parse is JVM ``from_xml`` (PERMISSIVE —
malformed XML → NULL row, never a task failure) + in-row ``transform``
to the common ``(url, title, published)`` struct; per-feed fan-out is
a map-side ``explode``.  Zero Python, zero shuffle: at 100 TB the
feed-fetch table partitions by host exactly like any fetched-page
table and parsing stays inside whole-stage codegen.

``published`` is carried as the raw feed string — format varies
(RFC 822 in RSS, ISO 8601 in Atom) and date semantics belong to
``functions/dates.extract_date_pt`` / ``try_to_timestamp`` downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# element order inside item/entry is irrelevant to from_xml; attribute
# fields use the default "_" prefix (Atom's <link href=...>)
RSS_SCHEMA = (
    "struct<channel: struct<title:string,"
    " item: array<struct<title:string, link:string, pubDate:string>>>>"
)
ATOM_SCHEMA = (
    "struct<title:string,"
    " entry: array<struct<title:string, link:struct<_href:string>,"
    " updated:string>>>"
)

_ENTRY_TYPE = "array<struct<url:string,title:string,published:string>>"


def parse_rss(xml: Column) -> Column:
    """RSS 2.0 channel → array<struct<url,title,published>> (NULL when
    the document isn't an RSS channel)."""
    items = F.from_xml(xml, RSS_SCHEMA)["channel"]["item"]
    return F.transform(
        items,
        lambda i: F.struct(
            i["link"].alias("url"),
            i["title"].alias("title"),
            i["pubDate"].alias("published"),
        ),
    ).cast(_ENTRY_TYPE)


def parse_atom(xml: Column) -> Column:
    """Atom feed → array<struct<url,title,published>> (NULL when the
    document isn't an Atom feed)."""
    entries = F.from_xml(xml, ATOM_SCHEMA)["entry"]
    return F.transform(
        entries,
        lambda e: F.struct(
            e["link"]["_href"].alias("url"),
            e["title"].alias("title"),
            e["updated"].alias("published"),
        ),
    ).cast(_ENTRY_TYPE)


def parse_feed(xml: Column) -> Column:
    """Format-sniffing parse: RSS wins when both somehow resolve, a
    non-feed document yields NULL (the PERMISSIVE contract — callers
    filter, nothing throws)."""
    return F.coalesce(parse_rss(xml), parse_atom(xml))
