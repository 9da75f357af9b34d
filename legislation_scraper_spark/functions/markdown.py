"""HTML → Markdown conversion (the reference's extraction backbone).

The reference converts every fetched page/PDF with MarkItDown
(`base/scraper.py:381-429` ``self.md.convert(response).text_content``),
which drives a markdownify-style DOM walk.  Neither markitdown nor
beautifulsoup4 ships in this container and installs are not permitted,
so BYTE-parity against the real library cannot be executed here; this
module re-implements the conversion subset those pages exercise on
stdlib ``html.parser``, with golden fixtures hand-derived from the
documented markdownify/MarkItDown rules
(tests/test_reference_goldens.py).  Swapping ``html_to_markdown_py``
for ``MarkItDown().convert_stream`` is a one-line change where the
real dependency exists.

Conversion rules implemented (markdownify defaults as MarkItDown uses
them):

- ``h1``–``h6``  → ``#``·n + space + text, blank-line separated
- ``p`` / ``div``→ paragraph, blank-line separated
- ``b/strong``   → ``**text**`` ; ``i/em`` → ``*text*``
- ``a href``     → ``[text](href)``; javascript: links are dropped to
  their text (MarkItDown's _CustomMarkdownify override)
- ``ul li``      → ``- item`` ; ``ol li`` → ``1. item`` (numbered)
- ``br``         → newline; ``script/style`` subtrees dropped
- whitespace in text nodes collapsed; result ``.strip()``-ed (the
  reference strips, scraper.py:429)

Runs as a vectorized Arrow UDF (``html_to_markdown``) — the input_hint
mandate (no per-row Python dispatch from the JVM).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_WS = re.compile(r"\s+")
_BLOCK = {"p", "div", "section", "article", "table", "tr"}
_SKIP = {"script", "style", "head", "title", "meta", "link"}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}


class _MdWalker(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self.cur: list[str] = []
        self.skip_depth = 0
        self.list_stack: list[dict] = []
        self.href: str | None = None
        self.pending_prefix = ""

    # -- block helpers ----------------------------------------------------

    def _flush(self) -> None:
        # \x00 marks a <br> hard break: survives whitespace collapsing,
        # restored as a newline afterwards
        text = _WS.sub(" ", "".join(self.cur)).strip()
        text = re.sub(r" ?\x00 ?", "\n", text)
        if text:
            self.blocks.append(self.pending_prefix + text)
        self.cur = []
        self.pending_prefix = ""

    # -- parser events ----------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag in _HEADINGS:
            self._flush()
            self.pending_prefix = "#" * _HEADINGS[tag] + " "
        elif tag in _BLOCK:
            self._flush()
        elif tag in ("ul", "ol"):
            self._flush()
            self.list_stack.append({"tag": tag, "n": 0})
        elif tag == "li":
            self._flush()
            if self.list_stack:
                top = self.list_stack[-1]
                top["n"] += 1
                self.pending_prefix = (
                    "- " if top["tag"] == "ul" else f"{top['n']}. "
                )
            else:
                self.pending_prefix = "- "
        elif tag == "br":
            self.cur.append("\x00")
        elif tag in ("b", "strong"):
            self.cur.append("**")
        elif tag in ("i", "em"):
            self.cur.append("*")
        elif tag == "a":
            href = dict(attrs).get("href", "")
            # MarkItDown drops javascript: targets to bare text
            self.href = (
                href if href and not href.startswith("javascript:") else None
            )
            if self.href is not None:
                self.cur.append("[")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag in _HEADINGS or tag in _BLOCK or tag == "li":
            self._flush()
        elif tag in ("ul", "ol"):
            self._flush()
            if self.list_stack:
                self.list_stack.pop()
        elif tag in ("b", "strong"):
            self.cur.append("**")
        elif tag in ("i", "em"):
            self.cur.append("*")
        elif tag == "a":
            if self.href is not None:
                self.cur.append(f"]({self.href})")
            self.href = None

    def handle_data(self, data):
        if not self.skip_depth:
            self.cur.append(data)

    def result(self) -> str:
        self._flush()
        return "\n\n".join(self.blocks).strip()


def html_to_markdown_py(html: str | bytes | None) -> str:
    """Straight-line conversion (the unit under golden-fixture test)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    w = _MdWalker()
    w.feed(html)
    return w.result()


# DataType object, not a DDL string: string schemas are parsed through
# the active session, which need not exist at import time
@F.pandas_udf(StringType())
def html_to_markdown(html: pd.Series) -> pd.Series:
    """Arrow-vectorized html→markdown (one call per batch)."""
    return html.map(html_to_markdown_py)
