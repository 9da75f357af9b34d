"""Publication-date extraction from Brazilian legal text.

Every act the reference scrapes carries its date in the header line —
"LEI Nº 12.345, DE 2 DE MARÇO DE 2004" — but the reference keeps only
the YEAR as an integer (its per-source ``situation``/``year`` fields;
e.g. /root/reference/src/scraper/base/scraper.py keeps year-indexed
checkpoints).  A corpus needs the full date: recency weighting,
revision ordering between same-year amendments, and the
``{year}/{type}`` partition layout all key on it.  This module parses
the three formats Brazilian government sites actually serve:

1. textual — ``2 de março de 2004`` (any case; the header form)
2. slashed — ``02/03/2004`` (diario mastheads, DataTables payloads)
3. ISO — ``2004-03-02`` (JSON APIs)

All pure ``regexp_extract`` + a literal month map + ``make_date`` —
in-row JVM codegen, zero shuffle, no Python; DuckDB reproduces each
step verbatim (same regexes, CASE month map, ``make_date``), keeping
the DATE output oracle-comparable.  ``make_date`` RAISES on
out-of-range parts in both engines (Spark 4 runs ANSI-on), so every
call is guarded by explicit calendar arithmetic — month 1–12, day
within the month's length incl. the Gregorian leap rule — written as
plain integer CASE logic both sides; an invalid or unknown part
yields NULL and the priority ``coalesce`` falls through to the next
format.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PT_MONTHS = [
    "janeiro",
    "fevereiro",
    "março",
    "abril",
    "maio",
    "junho",
    "julho",
    "agosto",
    "setembro",
    "outubro",
    "novembro",
    "dezembro",
]

# name→number incl. the accent-folded alias ("marco" ⇔ "março" — OCR
# often drops ç); dict dedups the alias for the 11 ç-free months
# (ANSI create_map raises on duplicate keys)
_MONTHS_BY_NAME = {
    nm: i + 1
    for i, m in enumerate(PT_MONTHS)
    for nm in (m, m.replace("ç", "c"))
}


def _month_map() -> Column:
    """Literal month map, built lazily: Column literals need an active
    SparkContext."""
    return F.create_map(
        *[
            F.lit(x)
            for nm, i in _MONTHS_BY_NAME.items()
            for x in (nm, i)
        ]
    )

_RE_TEXTUAL = r"(\d{1,2})\s+de\s+([a-zç]+)\s+de\s+(\d{4})"
_RE_SLASH = r"(\d{2})/(\d{2})/(\d{4})"
_RE_ISO = r"(\d{4})-(\d{2})-(\d{2})"


def _g(col: Column, pat: str, i: int) -> Column:
    return F.regexp_extract(col, pat, i)


def _days_in_month(y: Column, m: Column) -> Column:
    """Gregorian month length as pure integer CASE logic (identical
    expression shape in the DuckDB oracle — no engine date functions
    before validity is established)."""
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(m.isin(4, 6, 9, 11), 30)
        .when(leap, 29)
        .otherwise(28)
    )


def _safe_date(y: Column, m: Column, d: Column) -> Column:
    """NULL-on-invalid make_date: ANSI Spark (and DuckDB) raise on
    out-of-range parts, so guard with explicit calendar arithmetic."""
    y, m, d = y.cast("int"), m.cast("int"), d.cast("int")
    ok = (
        m.isNotNull()
        & d.isNotNull()
        & y.isNotNull()
        & m.between(1, 12)
        & (d >= 1)
        & (d <= _days_in_month(y, m))
    )
    return F.when(ok, F.make_date(y, m, d))


def extract_date_pt(text: Column) -> Column:
    """First publication date found in the text, trying textual →
    slashed → ISO (a format that matches but doesn't resolve to a real
    date — unknown month word, day 32, Feb 30 — yields NULL and falls
    through to the next format).

    Perf shape: ONE regex evaluation per format — the full match
    (group 0) is extracted once, split into its tokens (the patterns'
    groups are whole tokens, so the split is lossless), and the token
    array is LET-BOUND (functions/text.let) so the size guard and the
    three part reads all see one cached evaluation.  Per-group
    ``regexp_extract`` calls would execute the same pattern once PER
    GROUP plus once for the match condition (4× per format; codegen
    subexpression elimination cannot merge extracts that differ in
    group index), and an unbound split subtree re-runs once per
    reference — measured on the sf0.1 ``date_extract`` bench query:
    2.4–3.0 s per-group, 4–6 s unbound split, 0.6 s let-bound.
    No-match rows short-circuit: group 0 of a non-matching pattern is
    '' → split gives a 1-element array → the size guard yields NULL."""
    from .text import let

    low = F.lower(text)

    def _textual(t: Column) -> Column:
        # "2 de março de 2004" → [d, 'de', month, 'de', y]
        return F.when(
            F.size(t) == 5,
            _safe_date(
                F.element_at(t, 5),
                # try_: ANSI element_at raises on a missing map key
                F.try_element_at(_month_map(), F.element_at(t, 3)),
                F.element_at(t, 1),
            ),
        )

    def _slash(s: Column) -> Column:
        return F.when(
            F.size(s) == 3,
            _safe_date(
                F.element_at(s, 3), F.element_at(s, 2), F.element_at(s, 1)
            ),
        )

    def _iso(i: Column) -> Column:
        return F.when(
            F.size(i) == 3,
            _safe_date(
                F.element_at(i, 1), F.element_at(i, 2), F.element_at(i, 3)
            ),
        )

    return F.coalesce(
        let(F.split(F.regexp_extract(low, _RE_TEXTUAL, 0), r"\s+"),
            _textual),
        let(F.split(F.regexp_extract(low, _RE_SLASH, 0), "/"), _slash),
        let(F.split(F.regexp_extract(low, _RE_ISO, 0), "-"), _iso),
    )
