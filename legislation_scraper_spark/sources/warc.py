"""WARC (Web ARChive, ISO 28500) record reader — the Common Crawl
ingestion path.

The reference has no archive-format source (it fetches live HTML), but
a 100 TB webtext pipeline starts from WARC segments, so the reader is
a first-class source here.

Format essentials (WARC/1.1 §4): a record is
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes of
payload>\\r\\n\\r\\n`` and records concatenate back-to-back.  Payloads
are arbitrary binary, so splitting on text delimiters is WRONG — the
only correct framing is the declared ``Content-Length``.  That rules
out ``spark.read.text(lineSep=...)`` and any JVM split; this is the
legitimate mapInPandas case (SURVEY §2.10 discipline): one pass over
each file's bytes, honoring Content-Length, emitting typed rows.

Scale notes:
- Parallelism is PER FILE (``binaryFile`` source): Common Crawl ships
  ~1 GB gzip'd segments in the tens of thousands per dump, so file
  granularity saturates any cluster; no intra-file split is needed (and
  gzip forbids it anyway — the standard tradeoff every WARC engine
  makes).
- ``spark.sql.files.maxPartitionBytes`` does not split binaryFile rows;
  memory per task = one segment (~1 GB decompressed burst), the same
  envelope as the reference bench worlds.
- Record headers travel as a ``map<string,string>`` column; payloads as
  ``binary``.  Downstream pruning (e.g. response-only filter) happens
  on the typed columns, not by re-parsing.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "path string, record_type string, target_uri string, "
    "warc_date string, content_length bigint, payload binary, "
    "payload_md5 string"
)

_CRLF = b"\r\n"


def parse_warc_stream(data: bytes):
    """Parse one WARC file's bytes into records (straight-line kernel
    shared by the Spark reader; tests verify it against hand-written
    byte literals, not against itself).

    Yields dicts with header map + payload.  Tolerates trailing
    garbage / truncated tails by stopping at the first malformed
    record boundary (Common Crawl segments occasionally truncate).
    """
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            break
        head = data[pos:end_hdr].decode("utf-8", "replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            break
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            # malicious/corrupt header: a negative length would walk pos
            # BACKWARDS (infinite loop) or slice a phantom payload from
            # the buffer tail via negative indexing — treat as malformed
            break
        body_start = end_hdr + 4
        if body_start + clen > n:
            break  # truncated tail
        yield {
            "headers": headers,
            "payload": data[body_start:body_start + clen],
        }
        pos = body_start + clen


def _accumulate_records(
    out: dict, key_col: str, key, raw: bytes, response_only: bool
) -> None:
    """Append each parsed record of ``raw`` to the column buffers
    (shared by the file reader and the column parser, so framing fixes
    land in one place)."""
    for rec in parse_warc_stream(raw):
        h = rec["headers"]
        rtype = h.get("warc-type", "")
        if response_only and rtype != "response":
            continue
        out[key_col].append(key)
        out["record_type"].append(rtype)
        out["target_uri"].append(h.get("warc-target-uri"))
        out["warc_date"].append(h.get("warc-date"))
        out["content_length"].append(len(rec["payload"]))
        out["payload"].append(rec["payload"])
        out["payload_md5"].append(hashlib.md5(rec["payload"]).hexdigest())


def _empty_buffers(key_col: str) -> dict:
    return {k: [] for k in (
        key_col, "record_type", "target_uri", "warc_date",
        "content_length", "payload", "payload_md5",
    )}


def read_warc(
    spark: SparkSession, path: str, response_only: bool = False
) -> DataFrame:
    """Read WARC files (optionally .gz) under ``path`` into typed rows.

    ``response_only=True`` keeps only ``WARC-Type: response`` records
    (the usual Common Crawl projection) — filtered INSIDE the parser so
    request/metadata payloads never materialize as rows.
    """
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _empty_buffers("path")
            for p, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                if p.endswith(".gz"):
                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                _accumulate_records(out, "path", p, raw, response_only)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


def wet_record(uri, text):
    """One WET ``conversion`` record (the Common Crawl text sibling of
    WARC: same ISO 28500 framing, payload = extracted plain text) as a
    pure JVM column expression — the export side of the format family
    (``read_warc``/``parse_warc_column`` is the ingest side; CDX the
    planning tier).

    ``Content-Length`` is the OCTET length of the utf-8 payload (the
    framing invariant binary parsers rely on), not the character count.
    Concatenate per output file and the bytes are a valid .wet stream.
    """
    header = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z"
              "\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(
        header.cast("binary"),
        F.encode(text, "utf-8"),
        F.lit("\r\n\r\n").cast("binary"),
    )


def build_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (record_type, target_uri, payload) triples into a WARC
    byte stream (test/synthesis helper; framing per ISO 28500 §4)."""
    parts = []
    for rtype, uri, payload in records:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        parts.append(head + payload + b"\r\n\r\n")
    return b"".join(parts)


def parse_warc_column(
    df: DataFrame,
    bytes_col: str = "warc",
    id_col: str = "source",
    response_only: bool = False,
) -> DataFrame:
    """Parse a binary WARC-stream COLUMN into exploded record rows
    (same kernel as :func:`read_warc`, for streams that arrive as rows
    — e.g. fetched sub-archives — instead of files)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _empty_buffers(id_col)
            for key, blob in zip(pdf[id_col], pdf[bytes_col]):
                _accumulate_records(
                    out, id_col, key, bytes(blob), response_only
                )
            yield pd.DataFrame(out)

    schema = f"`{id_col}` string, " + WARC_SCHEMA.split(", ", 1)[1]
    return df.select(id_col, bytes_col).mapInPandas(run, schema)


def plan_revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Digest-based WARC storage dedup (WARC/1.1 §6.7.2 ``revisit``,
    identical-payload-digest profile — the mechanism Common Crawl uses
    to avoid re-storing unchanged payloads): within each payload
    digest, the FIRST capture (min (ts, url), lexicographic tie-break)
    stays a full ``response`` record; every later capture becomes a
    ``revisit`` record that carries ``refers_to_uri``/``refers_to_ts``
    of the original and stores NO payload.

    Exact-duplicate capture rows (same digest, ts, AND url) all mark
    ``response`` — they ARE the same record, and the rule stays a pure
    per-row function of the (digest → original) map, which is what the
    SQL oracle replays.  Returns the input columns +
    (warc_type, refers_to_uri, refers_to_ts).

    Plan shape / scale: the original-per-digest map is ONE
    partial-aggregatable ``min(struct(ts, url))`` shuffle carrying a
    small struct per digest — never payloads; the join back is an
    equi-join on the digest where the build side has exactly one row
    per key, so a mega-duplicated payload (10^6 captures of one
    boilerplate page) skews only the probe side, which AQE splits.
    """
    o = (
        captures.groupBy(digest_col)
        .agg(
            F.min(
                F.struct(
                    F.col(ts_col).alias("ts"), F.col(url_col).alias("url")
                )
            ).alias("_o")
        )
    )
    joined = captures.join(o, digest_col)
    is_orig = (F.col(ts_col) == F.col("_o.ts")) & (
        F.col(url_col) == F.col("_o.url")
    )
    return joined.select(
        *captures.columns,
        F.when(is_orig, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("warc_type"),
        F.when(is_orig, F.lit(None).cast("string"))
        .otherwise(F.col("_o.url"))
        .alias("refers_to_uri"),
        F.when(is_orig, F.lit(None).cast("timestamp"))
        .otherwise(F.col("_o.ts"))
        .alias("refers_to_ts"),
    )


def wat_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    title_col: str = "title",
    links_col: str = "links",
) -> DataFrame:
    """WAT metadata-record export (the third Common Crawl artifact
    beside WARC archives and WET text): one JSON envelope per response
    capture carrying the WARC header metadata and the parsed HTML head
    (title + outlink list), in the standard
    ``Envelope / WARC-Header-Metadata / Payload-Metadata /
    HTTP-Response-Metadata / HTML-Metadata`` nesting.

    The JSON is built by Catalyst's ``to_json`` over a nested struct —
    pure JVM codegen, per-row, zero shuffle — and is byte-identical to
    DuckDB's ``to_json(struct_pack(...))`` for this shape (compact
    separators, declaration key order, standard escaping), which is
    what the ``wat_export`` oracle exploits.  WARC-Date uses the
    archive-standard ``yyyy-MM-ddTHH:mm:ssZ`` UTC form.
    """
    env = F.struct(
        F.struct(
            F.lit("WARC").alias("Format"),
            F.struct(
                F.col(url_col).alias("WARC-Target-URI"),
                F.date_format(
                    F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("WARC-Date"),
                F.lit("response").alias("WARC-Type"),
                F.col(digest_col).alias("WARC-Payload-Digest"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.struct(
                    F.struct(
                        F.struct(F.col(title_col).alias("Title")).alias(
                            "Head"
                        ),
                        F.transform(
                            F.col(links_col),
                            lambda x: F.struct(x.alias("url")),
                        ).alias("Links"),
                    ).alias("HTML-Metadata")
                ).alias("HTTP-Response-Metadata")
            ).alias("Payload-Metadata"),
        ).alias("Envelope")
    )
    return pages.select(
        F.col(url_col).alias("url"), F.to_json(env).alias("wat")
    )
