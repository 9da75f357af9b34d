"""HTTP/1.x response-message parser — the protocol layer between WARC
``response`` records and extractable HTML.

A Common-Crawl WARC response payload is the raw HTTP message: status
line + headers + CRLFCRLF + entity body.  The reference never sees
this layer (`requests` strips it: /root/reference/src/scraper/base/
scraper.py:203 works on ``response.text``); an archive-driven pipeline
must do the split itself, at 10^10-record scale, so it has to stay on
the JVM.

The whole parse is pure column algebra — zero Python, zero shuffle:

- **Binary-safe splitting via the latin-1 bijection.**  The entity
  body is arbitrary bytes (gzip, images, broken encodings), so JVM
  string functions cannot touch the payload as UTF-8 (replacement
  chars destroy byte positions).  ``decode(payload, 'ISO-8859-1')``
  maps every byte to exactly one char and back — ``instr``/
  ``substring`` then operate on byte offsets, and
  ``encode(_, 'ISO-8859-1')`` recovers the body bytes EXACTLY (md5
  roundtrip is unit-tested against hashlib over adversarial non-UTF-8
  payloads).  The head section is ASCII by RFC 9112 §2.2, so parsing
  it from the latin-1 view is sound.
- **Header map with keep-last duplicate semantics.**  Keys lowercase
  (header names are case-insensitive, RFC 9110 §5.1); duplicate names
  keep the LAST occurrence (the common proxy/CDN override direction).
  The dedup is an in-row index fold over the ~20-entry header array —
  O(n²) on n=20, never a shuffle, never mapKeyDedupPolicy-dependent.
- **Tolerant of malformed input**: missing CRLFCRLF → whole payload
  is head, body null; non-HTTP first line → null status; colon-less
  header lines are skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF2 = "\r\n\r\n"


def _latin1(col: Column) -> Column:
    return F.decode(col, "ISO-8859-1")


def parse_http_response(
    df: DataFrame,
    payload_col: str = "payload",
    prefix: str = "http_",
    keep_body: bool = True,
) -> DataFrame:
    """Append parsed HTTP-response columns to ``df``.

    Adds ``{prefix}status`` (int, null if the first line is not an
    HTTP status line), ``{prefix}reason`` (string), ``{prefix}headers``
    (map<string,string>, lowercased keys, duplicates keep-last) and —
    when ``keep_body`` — ``{prefix}body`` (binary, byte-exact entity
    body).  All other columns pass through untouched.
    """
    s = _latin1(F.col(payload_col))
    sep = F.instr(s, _CRLF2)  # 1-based; 0 when absent
    head = F.when(sep > 0, F.substring(s, F.lit(1), sep - 1)).otherwise(s)
    lines = F.split(head, "\r\n")

    status = F.regexp_extract(
        lines[0], r"^HTTP/\d\.\d (\d{3})", 1
    )
    reason = F.regexp_extract(lines[0], r"^HTTP/\d\.\d \d{3} ?(.*)$", 1)

    hdr_lines = F.filter(
        F.slice(lines, F.lit(2), F.greatest(F.size(lines) - 1, F.lit(0))),
        lambda l: F.instr(l, ":") > 0,
    )
    entries = F.transform(
        hdr_lines,
        lambda l, i: F.struct(
            F.lower(F.trim(F.substring_index(l, ":", 1))).alias("key"),
            F.trim(
                F.substring(l, F.instr(l, ":") + 1, F.length(l))
            ).alias("value"),
            i.alias("i"),
        ),
    )
    # keep-last per key: an entry survives iff no later entry shares
    # its key (in-row quadratic fold; header counts are ~20)
    kept = F.filter(
        entries,
        lambda e: ~F.exists(
            entries, lambda o: (o["key"] == e["key"]) & (o["i"] > e["i"])
        ),
    )
    headers = F.map_from_entries(
        F.transform(kept, lambda e: F.struct(e["key"], e["value"]))
    )

    out = df.withColumns({
        f"{prefix}status": F.when(
            status != "", status.cast("int")
        ),
        f"{prefix}reason": F.when(status != "", reason),
        f"{prefix}headers": headers,
    })
    if keep_body:
        body = F.when(
            sep > 0,
            F.encode(
                F.substring(s, sep + 4, F.length(s)), "ISO-8859-1"
            ),
        )
        out = out.withColumn(f"{prefix}body", body)
    return out


# --- charset sniffing + decode -------------------------------------------
#
# WHATWG-style precedence: byte-order mark > Content-Type charset
# parameter > <meta charset> in the first 2 KiB > utf-8 (the HTML5
# default).  All sniffing happens on the latin-1 view of the bytes, so
# it is byte-offset-exact and stays in codegen.

_BOM8 = "ï»¿"        # EF BB BF as latin-1 chars
_BOM16LE = "ÿþ"
_BOM16BE = "þÿ"
_CS_RE = r"(?i)charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)"


def _norm_charset(cs: Column) -> Column:
    """Collapse charset aliases onto the JVM decoder set.  cp1252 maps
    to iso-8859-1 — identical except 0x80-0x9F, the standard engine
    approximation (Spark's decode() only ships the six RFC charsets)."""
    c = F.lower(cs)
    return (
        F.when(c.isin("utf8", "utf-8"), "utf-8")
        .when(
            c.isin(
                "latin1", "latin-1", "iso8859-1", "iso-8859-1",
                "windows-1252", "cp1252", "l1",
            ),
            "iso-8859-1",
        )
        .when(c.isin("us-ascii", "ascii"), "us-ascii")
        .when(c.isin("utf-16le", "utf16le"), "utf-16le")
        .when(c.isin("utf-16be", "utf16be"), "utf-16be")
        .when(c.isin("utf-16", "utf16"), "utf-16")
        .otherwise("utf-8")  # unknown label → HTML5 default
    )


def sniff_charset(
    body: Column, content_type: Column | None = None
) -> tuple[Column, Column]:
    """Return ``(charset, source)`` columns for an HTML ``binary``
    body: charset is a normalized decoder name, source is one of
    ``bom`` / ``header`` / ``meta`` / ``default`` (precedence proof)."""
    lat = F.decode(body, "ISO-8859-1")
    head = F.substring(lat, 1, 2048)
    hdr_cs = (
        F.regexp_extract(content_type, _CS_RE, 1)
        if content_type is not None
        else F.lit("")
    )
    meta_cs = F.regexp_extract(
        head, r"(?i)<meta[^>]{0,512}?" + _CS_RE, 1
    )
    charset = (
        F.when(lat.startswith(_BOM8), "utf-8")
        .when(lat.startswith(_BOM16LE), "utf-16le")
        .when(lat.startswith(_BOM16BE), "utf-16be")
        .when(hdr_cs != "", _norm_charset(hdr_cs))
        .when(meta_cs != "", _norm_charset(meta_cs))
        .otherwise("utf-8")
    )
    source = (
        F.when(
            lat.startswith(_BOM8)
            | lat.startswith(_BOM16LE)
            | lat.startswith(_BOM16BE),
            "bom",
        )
        .when(hdr_cs != "", "header")
        .when(meta_cs != "", "meta")
        .otherwise("default")
    )
    return charset, source


def decode_html(body: Column, charset: Column) -> Column:
    """Decode ``binary`` HTML to string under a PER-ROW charset.

    ``decode()`` takes a literal charset, so the column-dependent
    dispatch is a CASE over the supported decoders — still one codegen
    expression, no Python.  A leading U+FEFF (decoded BOM) is stripped,
    matching every browser."""
    decoded = (
        F.when(charset == "utf-16le", F.decode(body, "UTF-16LE"))
        .when(charset == "utf-16be", F.decode(body, "UTF-16BE"))
        .when(charset == "utf-16", F.decode(body, "UTF-16"))
        .when(charset == "iso-8859-1", F.decode(body, "ISO-8859-1"))
        .when(charset == "us-ascii", F.decode(body, "US-ASCII"))
        .otherwise(F.decode(body, "UTF-8"))
    )
    return F.regexp_replace(decoded, "^\\uFEFF", "")
