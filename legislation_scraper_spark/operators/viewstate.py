"""Stateful two-request fetch: the ASP.NET VIEWSTATE postback protocol
(SURVEY.md §2.1 S5; reference espirito_santo.py:69-127).

The reference fetches page N of an .aspx search in TWO dependent
requests inside one session: GET the base URL, scrape the
``__VIEWSTATE`` / ``__EVENTVALIDATION`` hidden inputs out of the
response, then POST them back with
``__EVENTTARGET=ctl00$ContentPlaceHolder1$rptPaging$ctl{N-1:02d}$lbPaging``
to receive the page's real content.  The defining property is
STATEFULNESS: the second request cannot be constructed without tokens
from the first response.

Spark-first rebuild — the dependency becomes a two-hop plan:

  hop 1: join (url, page) requests to the web on the BASE url
         → harvest tokens from the returned body (Arrow UDF)
  hop 2: synthesize the postback key FROM THE HARVESTED TOKENS
         (pure column expr) → join to the web on that key → body

Page-1 requests skip hop 2 (the reference returns the GET body
as-is).  Both hops broadcast the politeness-bounded request side, so
bodies never shuffle (same discipline as operators/fetch.py).  In the
sandbox the "web" is the pages_raw table and a POST is a lookup whose
key embeds the form payload; a real deployment swaps each join hop for
an HTTP call in the same mapInPandas task (session reuse per task),
leaving the plan shape unchanged.

Failure parity with the reference: a base page missing its tokens →
``fetched=false, error='missing __VIEWSTATE/__EVENTVALIDATION'``
(espirito_santo.py:92-95 returns None); a postback whose key matches
nothing → ``404 postback`` (requests raise_for_status path, :124-127).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RE_VIEWSTATE = re.compile(r'id="__VIEWSTATE"\s+value="([^"]*)"')
_RE_EVENTVAL = re.compile(r'id="__EVENTVALIDATION"\s+value="([^"]*)"')

# espirito_santo.py:103 — the 0-padded repeater control id
EVENT_TARGET_FMT = "ctl00$ContentPlaceHolder1$rptPaging$ctl{idx:02d}$lbPaging"


def event_target(page_col) -> F.Column:
    """Column twin of the reference's event-target format (page ≥ 2)."""
    return F.concat(
        F.lit("ctl00$ContentPlaceHolder1$rptPaging$ctl"),
        F.lpad((F.col(page_col) - 1).cast("string"), 2, "0"),
        F.lit("$lbPaging"),
    )


def harvest_tokens(body_col) -> F.Column:
    """Arrow UDF: scrape (__VIEWSTATE, __EVENTVALIDATION) from a GET
    response body; NULL field when the input is absent (the
    reference's error branch)."""

    @F.pandas_udf("viewstate string, eventvalidation string")
    def scrape(body: pd.Series) -> pd.DataFrame:
        vs, ev = [], []
        for raw in body:
            if raw is None:
                vs.append(None)
                ev.append(None)
                continue
            h = (
                raw.decode("utf-8", errors="replace")
                if isinstance(raw, (bytes, bytearray))
                else str(raw)
            )
            m = _RE_VIEWSTATE.search(h)
            vs.append(m.group(1) if m else None)
            m = _RE_EVENTVAL.search(h)
            ev.append(m.group(1) if m else None)
        return pd.DataFrame({"viewstate": vs, "eventvalidation": ev})

    return scrape(body_col)


def postback_url(url_col, page_col, vs_col, ev_col) -> F.Column:
    """The sandbox key a POST resolves to: base url + form payload.
    Embedding the harvested tokens makes hop 2 impossible without
    hop 1 — the statefulness contract under test."""
    return F.concat(
        F.col(url_col),
        F.lit("#postback:"),
        event_target(page_col),
        F.lit(":"),
        F.col(vs_col),
        F.lit(":"),
        F.col(ev_col),
    )


def fetch_paged(requests_df: DataFrame, pages_raw: DataFrame) -> DataFrame:
    """Resolve (url, page) requests through the VIEWSTATE protocol.

    Input: ``requests_df`` with (url string, page int ≥ 1).
    Output: (url, page, body, fetched, fetch_error).
    """
    web = pages_raw.select(
        F.col("url").alias("w_url"), F.col("html").alias("w_body")
    )
    req = F.broadcast(requests_df.select("url", "page"))

    # hop 1: GET the base url (every request needs it — page 1 for its
    # content, page >1 for its tokens)
    got = req.join(
        web, F.col("url") == F.col("w_url"), "left"
    ).select("url", "page", F.col("w_body").alias("base_body"))

    p1 = got.filter(F.col("page") == 1).select(
        "url", "page",
        F.col("base_body").alias("body"),
        F.col("base_body").isNotNull().alias("fetched"),
        F.when(F.col("base_body").isNull(), F.lit("404 not found"))
        .alias("fetch_error"),
    )

    pn = got.filter(F.col("page") > 1).select(
        "url", "page", harvest_tokens(F.col("base_body")).alias("t")
    ).select("url", "page", "t.viewstate", "t.eventvalidation")
    missing = (
        F.col("viewstate").isNull() | F.col("eventvalidation").isNull()
    )
    bad = pn.filter(missing).select(
        "url", "page",
        F.lit(None).cast("binary").alias("body"),
        F.lit(False).alias("fetched"),
        F.lit("missing __VIEWSTATE/__EVENTVALIDATION").alias("fetch_error"),
    )
    # hop 2: the POST — join on the token-bearing key
    keyed = pn.filter(~missing).withColumn(
        "pb_url",
        postback_url("url", "page", "viewstate", "eventvalidation"),
    )
    posted = F.broadcast(keyed).join(
        web, F.col("pb_url") == F.col("w_url"), "left"
    ).select(
        "url", "page",
        F.col("w_body").alias("body"),
        F.col("w_body").isNotNull().alias("fetched"),
        F.when(F.col("w_body").isNull(), F.lit("404 postback"))
        .alias("fetch_error"),
    )
    return p1.unionByName(bad).unionByName(posted)


# --- straight-line oracle (test double of the reference's loop) ----------


def simulate_viewstate_fetch(
    web: dict[str, bytes], url: str, page: int
) -> tuple[bytes | None, str | None]:
    """Pure-Python re-enactment of espirito_santo._get_page_html over a
    dict web — the parity oracle for fetch_paged."""
    base = web.get(url)
    if page == 1:
        return (base, None) if base is not None else (None, "404 not found")
    if base is None:
        return None, "missing __VIEWSTATE/__EVENTVALIDATION"
    h = base.decode("utf-8", errors="replace")
    mv = _RE_VIEWSTATE.search(h)
    me = _RE_EVENTVAL.search(h)
    if not mv or not me:
        return None, "missing __VIEWSTATE/__EVENTVALIDATION"
    tgt = EVENT_TARGET_FMT.format(idx=page - 1)
    key = f"{url}#postback:{tgt}:{mv.group(1)}:{me.group(1)}"
    body = web.get(key)
    if body is None:
        return None, "404 postback"
    return body, None
