"""JSF / PrimeFaces partial-AJAX scan (SURVEY.md §2.1 S6).

The reference drives the Maranhão JSF search with Selenium
(state_legislation/maranhao.py:124-161 clicks ui-paginator buttons and
scrapes ``driver.page_source``), but the underlying protocol it
documents (:44-107) is an HTTP POST of ``javax.faces.*`` form fields —
source/execute/render = ``table_resultados``, a ``ViewState`` token and
a ``dswid`` client window id — whose response is a PrimeFaces
``<partial-response>`` XML envelope carrying the updated table HTML in
a CDATA block.  Selenium is a transport workaround, not semantics; the
engine twin speaks the protocol itself:

* :func:`faces_post_body` — the exact field list of maranhao.py:83-107
  as an ordered column expression (same two-hop discipline as the S5
  VIEWSTATE operator: the ViewState token is harvested from the first
  response and the postback key is synthesized FROM it);
* :func:`partial_update` — extract one ``<update id=...>`` CDATA
  payload from the partial-response XML (dotall lazy regex — the
  payload is HTML, so ``from_xml`` would re-escape it);
* :func:`parse_result_rows` — the ``tr.ui-widget-content`` result rows
  → (title, project, publication, summary, pdf_link), the column twin
  of the BeautifulSoup label-indexing loop at maranhao.py:164-185
  (labels by position: 0=title, 2=project, 3=publication; the summary
  label carries the extra ``ementa`` class; link = first href).

All three are pure JVM column algebra (regexp + transform): the scan
fuses into codegen, nothing crosses the Python boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: maranhao.py:119-121 — first-row offset of page N (rows per page 20)
ROWS_PER_PAGE = 20

_ROW_RE = r'(?s)<tr class="ui-widget-content.*?</tr>'
_LABEL_RE = r'(?s)<label class="ui-outputlabel ui-widget[^"]*">(.*?)</label>'
_EMENTA_RE = (
    r'(?s)<label class="ui-outputlabel ui-widget ementa">(.*?)</label>'
)
_HREF_RE = r'<a href="([^"]*)"'


def faces_post_body(
    norm_type_id: Column,
    year: Column,
    page: Column,
    viewstate: Column,
    subtype_id: Column | None = None,
) -> Column:
    """The javax.faces AJAX POST body (maranhao.py:83-107 field-for-
    field, reference order; ``table_resultados_first`` = page * 20 per
    :119-121)."""
    sub = subtype_id if subtype_id is not None else F.lit("")
    parts = [
        F.lit("javax.faces.partial.ajax=true"),
        F.lit("javax.faces.source=table_resultados"),
        F.lit("javax.faces.partial.execute=table_resultados"),
        F.lit("javax.faces.partial.render=table_resultados"),
        F.lit("javax.faces.behavior.event=page"),
        F.lit("javax.faces.partial.event=page"),
        F.concat(F.lit("in_tipo_doc_input="), norm_type_id.cast("string")),
        F.concat(F.lit("j_idt53="), sub.cast("string")),
        F.concat(F.lit("in_ano_doc="), year.cast("string")),
        F.concat(
            F.lit("table_resultados_first="),
            (page * ROWS_PER_PAGE).cast("string"),
        ),
        F.concat(F.lit("javax.faces.ViewState="), viewstate),
        F.lit("javax.faces.ClientWindow=1381"),
    ]
    return F.concat_ws("&", *parts)


def partial_update(xml: Column, update_id: str = "table_resultados") -> Column:
    """CDATA payload of ``<update id="{update_id}">`` in a JSF
    partial-response envelope (empty string when the id is absent —
    the protocol's "nothing to render").

    ``update_id`` is regex-escaped: real PrimeFaces client ids carry
    ``:`` ``(`` ``)`` and dots (e.g. ``form:tbl(0)``) which would
    otherwise break or false-match the pattern."""
    pat = (
        r'(?s)<update id="' + re.escape(update_id)
        + r'"><!\[CDATA\[(.*?)\]\]></update>'
    )
    return F.regexp_extract(xml, pat, 1)


def parse_result_rows(html: Column) -> Column:
    """ui-widget-content rows → array<struct<title, project,
    publication, summary, pdf_link>> (maranhao.py:164-185 semantics)."""

    def build(row: Column) -> Column:
        labels = F.regexp_extract_all(row, F.lit(_LABEL_RE), 1)
        return F.struct(
            F.element_at(labels, 1).alias("title"),
            F.element_at(labels, 3).alias("project"),
            F.element_at(labels, 4).alias("publication"),
            F.regexp_extract(row, _EMENTA_RE, 1).alias("summary"),
            F.regexp_extract(row, _HREF_RE, 1).alias("pdf_link"),
        )

    return F.transform(
        F.regexp_extract_all(html, F.lit(_ROW_RE), 0), build
    )
