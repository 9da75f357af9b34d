"""Main-content extraction via block link-density — boilerplate strip.

The readability/jusText/trafilatura family of web-corpus cleaners all
reduce to the same core heuristic: split the page into markup blocks,
score each block by how much of its text lives inside anchors
(boilerplate nav/footers are link-dense, body prose is not) and by raw
text length, and keep the prose blocks.  The reference repo does this
per-site by hand (e.g. the CSS-selector content picks in
/root/reference/src/scraper/scrapers/sao_paulo.py:268-287); this
operator is the site-agnostic scale version used for Common-Crawl-style
corpora where no per-site selector exists.

Spark-first & scale notes:
- ZERO shuffle and zero Python: the block split, per-block tag strip,
  anchor-length fold, density filter, and rejoin are one in-row chain
  of ``split``/``transform``/``filter``/``aggregate`` higher-order
  expressions — whole-stage codegen end to end, same discipline as
  curation.repetition_scores.
- The regexes are written in the Java∩RE2 dialect subset (no
  backrefs, no lookaround) so the DuckDB oracle runs the *same*
  patterns — the cross-engine parity checks the semantics, not a
  ported quirk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: block-level tags whose open/close boundaries delimit candidate
#: text blocks (inline tags — a, b, span, em — stay inside blocks so
#: their text and link mass are scored with the block)
BLOCK_SPLIT_RE = (
    r"</?(?:div|p|section|article|nav|footer|header|table|tr|td|ul|ol|"
    r"li|h[1-6]|br)[^>]*>"
)

#: anchor body capture (inline links only — block splitting already
#: removed any block tags that would nest inside)
ANCHOR_TEXT_RE = r"<a[^>]*>([^<]*)</a>"


def _block_text(b: Column) -> Column:
    """Visible text of one block: inline tags → space, whitespace
    collapsed, trimmed."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(b, "<[^>]*>", " "), r"\s+", " "
        )
    )


def _link_len(b: Column) -> Column:
    """Total characters of anchor-enclosed text in the block."""
    return F.aggregate(
        F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )


def strip_boilerplate(
    df: DataFrame,
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Append ``main_text`` (space-joined prose blocks) and
    ``kept_blocks`` to ``df``.

    A block survives when its visible text has ≥ ``min_chars``
    characters AND its anchor-text mass is ≤ ``max_link_density`` of
    the visible text (nav bars and footers are link-dense; prose is
    not).  Block order is preserved.
    """
    scored = F.transform(
        F.split(F.col(html_col), BLOCK_SPLIT_RE),
        lambda b: F.struct(
            _block_text(b).alias("text"), _link_len(b).alias("ll")
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["text"]) >= F.lit(min_chars))
        & (
            s["ll"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["text"])
        ),
    )
    return df.withColumns(
        {
            "main_text": F.array_join(
                F.transform(kept, lambda s: s["text"]), " "
            ),
            "kept_blocks": F.size(kept).cast("bigint"),
        }
    )
