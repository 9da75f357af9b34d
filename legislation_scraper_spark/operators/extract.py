"""Extraction operators: HTML → document record / link records.

The reference extracts per-source with BeautifulSoup selectors + MarkItDown
(/root/reference/src/scraper/federal_legislation/scrape.py:187-245,
base/scraper.py:381-429).  Here extraction is a *vectorized pandas UDF*
(Arrow batches, no per-row Python dispatch from the JVM — input_hint
mandate), one regex-driven parser per source family:

- family 0 "content_div": isolate ``<div id="texto-norma">``, unwrap
  ``<p>`` paragraphs (content-div isolation, scrape.py:214-222);
  PDF variant: base64 ``<object id="pdf">`` decoded when the visible
  text is a short teaser (≤200 chars ⇒ OCR fallback, base/scraper.py:344,
  alagoas.py:104-107 — deterministic stand-in for the LLM-OCR branch).
- family 1 "table_rows": ``<table class="norma">`` rows minus header
  rows (row-shape filter, icmbio/scrape.py:88-94).
- family 2 "header_strip": literal header/footer strips (acre.py:45-46,
  107-110) and *inferred* situation via the revogado regex
  (parana.py:108-111) because the page carries no situation metadata.
- family 3 "plain_div": ``<div id="conteudo">``; error pages
  ("A página não pode ser exibida", rio_grande_do_sul.py:131-165) are
  flagged and routed to the error sink.

Byte parity: ``extract_doc(html) == pages_raw.text`` for every URL —
enforced by tests/test_extract_parity.py over the whole synthetic world.
"""

from __future__ import annotations

import base64
import html as html_mod
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --- regexes (compiled once per executor) ----------------------------------

_RE_META = re.compile(r'<meta name="dc\.(\w+)" content="([^"]*)">')
_RE_TEXTO_NORMA = re.compile(r'<div id="texto-norma">(.*?)</div>', re.S)
_RE_CONTEUDO = re.compile(r'<div id="conteudo">(.*?)</div>', re.S)
_RE_TABLE = re.compile(r'<table class="norma">(.*?)</table>', re.S)
_RE_TR = re.compile(r'<tr(?: class="(\w+)")?><td>(.*?)</td></tr>', re.S)
_RE_TEXTO_DIV = re.compile(r'<div class="texto">(.*?)</div>', re.S)
_RE_PDF_OBJ = re.compile(
    r'<object id="pdf"[^>]*data="data:application/pdf;base64,([^"]*)"'
)
_RE_ERROR = re.compile(r"<h1>A página não pode ser exibida</h1>")
_RE_REVOKED = re.compile(r"revogad[oa] pel", re.I)
_RE_RES_LINK = re.compile(r'<a class="res" href="([^"]+)">')
_RE_NEXT_LINK = re.compile(r'<a class="next" href="([^"]+)">')
_RE_TOTAL = re.compile(r"Total de registros:\s*(\d+)")

HEADER_LIT = "GOVERNO DO ESTADO - DIÁRIO OFICIAL"
FOOTER_LIT = "Imprimir | Voltar ao topo"
OCR_SHORT_THRESHOLD = 200  # cf. base/scraper.py:344
DEFAULT_SITUATION = "Não consta revogação expressa"


def _unwrap_paras(inner: str) -> str:
    inner = inner.strip()
    if inner.startswith("<p>") and inner.endswith("</p>"):
        inner = inner[3:-4]
    return html_mod.unescape(inner.replace("</p><p>", "\n\n"))


def _extract_one(raw: bytes) -> tuple:
    h = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else str(raw)
    meta = dict(_RE_META.findall(h))
    title = html_mod.unescape(meta.get("title", ""))
    summary = html_mod.unescape(meta.get("summary", ""))
    ntype = meta.get("type", "")
    year = int(meta["year"]) if meta.get("year", "").isdigit() else None
    if _RE_ERROR.search(h):
        return (title, ntype, year, meta.get("situation", ""), summary, "", True)
    text = None
    m = _RE_TEXTO_NORMA.search(h)
    if m:
        text = _unwrap_paras(m.group(1))
        # OCR fallback: visible text too short + embedded PDF present
        if len(text) <= OCR_SHORT_THRESHOLD:
            pdf = _RE_PDF_OBJ.search(h)
            if pdf:
                text = base64.b64decode(
                    re.sub(r"\s", "", pdf.group(1))
                ).decode("utf-8")
    if text is None:
        m = _RE_TABLE.search(h)
        if m:
            paras = [
                html_mod.unescape(body)
                for cls, body in _RE_TR.findall(m.group(1))
                if cls != "hdr"
            ]
            text = "\n\n".join(paras)
    if text is None:
        m = _RE_TEXTO_DIV.search(h)
        if m:
            inner = html_mod.unescape(m.group(1))
            if inner.startswith(HEADER_LIT):
                inner = inner[len(HEADER_LIT):]
            if inner.endswith(FOOTER_LIT):
                inner = inner[: -len(FOOTER_LIT)]
            text = inner.strip("\n")
    if text is None:
        m = _RE_CONTEUDO.search(h)
        if m:
            text = _unwrap_paras(m.group(1))
    if text is None:
        return (title, ntype, year, meta.get("situation", ""), summary, "", True)
    situation = meta.get("situation")
    if situation is None:
        situation = (
            "Revogada" if _RE_REVOKED.search(text) else DEFAULT_SITUATION
        )
    return (title, ntype, year, situation, summary, text, False)


DOC_RECORD_TYPE = StructType(
    [
        StructField("title", StringType()),
        StructField("type", StringType()),
        StructField("year", IntegerType()),
        StructField("situation", StringType()),
        StructField("summary", StringType()),
        StructField("text", StringType()),
        StructField("is_error", BooleanType()),
    ]
)


@F.pandas_udf(DOC_RECORD_TYPE)
def extract_doc(html: pd.Series) -> pd.DataFrame:
    rows = [_extract_one(b) for b in html]
    return pd.DataFrame(
        rows,
        columns=[
            "title", "type", "year", "situation", "summary", "text",
            "is_error",
        ],
    )


LINKS_TYPE = StructType(
    [
        StructField("doc_links", ArrayType(StringType())),
        StructField("next_link", StringType()),
        StructField("total", IntegerType()),
    ]
)

PARSE_TYPE = StructType(
    [StructField("rec", DOC_RECORD_TYPE), StructField("l", LINKS_TYPE)]
)

_DOC_KEYS = ["title", "type", "year", "situation", "summary", "text", "is_error"]


def make_parse_page(search_marker: str = "/busca"):
    """Combined single-pass parser: document record OR link record per
    row, dispatched on URL shape.  One Arrow round-trip of the body per
    crawl round (body bytes are the dominant Python-boundary traffic)."""

    @F.pandas_udf(PARSE_TYPE)
    def parse_page(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        recs, links = [], []
        for u, raw in zip(url, html):
            if raw is None:
                recs.append(None)
                links.append(None)
                continue
            if search_marker in (u or ""):
                h = (
                    raw.decode("utf-8", errors="replace")
                    if isinstance(raw, (bytes, bytearray))
                    else str(raw)
                )
                found = _RE_RES_LINK.findall(h)
                nxt = _RE_NEXT_LINK.search(h)
                tot = _RE_TOTAL.search(h)
                links.append(
                    {
                        "doc_links": found,
                        "next_link": nxt.group(1) if nxt else None,
                        "total": int(tot.group(1)) if tot else None,
                    }
                )
                recs.append(None)
            else:
                recs.append(dict(zip(_DOC_KEYS, _extract_one(raw))))
                links.append(None)
        return pd.DataFrame({"rec": recs, "l": links})

    return parse_page


@F.pandas_udf(LINKS_TYPE)
def extract_links(html: pd.Series) -> pd.DataFrame:
    out = {"doc_links": [], "next_link": [], "total": []}
    for raw in html:
        h = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else str(raw)
        out["doc_links"].append(_RE_RES_LINK.findall(h))
        nxt = _RE_NEXT_LINK.search(h)
        out["next_link"].append(nxt.group(1) if nxt else None)
        tot = _RE_TOTAL.search(h)
        out["total"].append(int(tot.group(1)) if tot else None)
    return pd.DataFrame(out)
