"""CDX(J) capture-index source — the Common-Crawl URL index format.

A crawl at 10^10-URL scale reads the CDX index (one line per capture:
``<urlkey> <timestamp> <json>``) to plan fetches without touching WARC
payloads: dedup by digest, pick newest capture per URL, locate the
(filename, offset, length) byte range to range-read.  The reference
repo has no index tier (it re-fetches everything); this source plus
``sources/warc.py`` gives the engine the standard two-tier layout.

Spark-first: the line parse is ``substring_index`` + ``from_json`` —
pure JVM codegen, no Python; SURT url-key generation is expression-only
string algebra.  Per-file parallelism comes from the text scan; at
cluster scale CDX shards are range-partitioned by urlkey prefix, so
per-URL lookups prune shards (the analogue of Iceberg partition
pruning on the key prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# capture metadata carried by Common-Crawl-style CDXJ records
CDX_META_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def surt_key(url: Column) -> Column:
    """SURT-style url key (expression-only twin of the urlkey column):
    lowercase, scheme and leading ``www.`` stripped, host labels
    reversed and comma-joined, ``)`` separator, then the path.

    ``https://WWW.Planalto.Gov.BR/ccivil_03/leis`` →
    ``br,gov,planalto)/ccivil_03/leis``.
    """
    u = F.lower(url)
    no_scheme = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    no_www = F.regexp_replace(no_scheme, r"^www\d*\.", "")
    host = F.substring_index(no_www, "/", 1)
    path = F.substring(no_www, F.length(host) + 1, F.lit(1 << 30))
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev_host,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ lines → (urlkey, ts, url, mime, status, digest,
    length, offset, filename).  Malformed JSON yields NULL metadata
    (the record survives with its key/timestamp — standard
    skip-and-log index hygiene)."""
    l = F.col(line_col)
    urlkey = F.substring_index(l, " ", 1)
    ts = F.substring_index(F.substring_index(l, " ", 2), " ", -1)
    meta = F.from_json(
        F.expr(
            f"substring({line_col}, length(substring_index({line_col},"
            f" ' ', 2)) + 2)"
        ),
        CDX_META_SCHEMA,
    )
    return lines.select(
        F.col(line_col), meta.alias("m")
    ).select(
        urlkey.alias("urlkey"),
        F.to_timestamp(ts, "yyyyMMddHHmmss").alias("ts"),
        F.col("m.url").alias("url"),
        F.col("m.mime").alias("mime"),
        F.col("m.status").cast("int").alias("status"),
        F.col("m.digest").alias("digest"),
        F.col("m.length").cast("long").alias("length"),
        F.col("m.offset").cast("long").alias("offset"),
        F.col("m.filename").alias("filename"),
    )


def latest_captures(parsed: DataFrame) -> DataFrame:
    """One row per urlkey: the newest successful (status 200) capture —
    the fetch-planning view of the index.  Partial-aggregatable
    max_by (no window), so the shuffle carries one row per key."""
    ok = parsed.filter(F.col("status") == 200)
    pick = F.max_by(
        F.struct("ts", "url", "digest", "length", "offset", "filename"),
        F.struct("ts", "filename", "offset"),
    ).alias("c")
    return (
        ok.groupBy("urlkey")
        .agg(pick)
        .select(
            "urlkey", "c.ts", "c.url", "c.digest", "c.length",
            "c.offset", "c.filename",
        )
    )


def scope_filter(
    candidates: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    default_allow: bool = False,
) -> DataFrame:
    """Heritrix-style crawl scoping by SURT prefix: each rule is
    ``(surt_prefix, allow)``; the LONGEST prefix matching a candidate
    URL's SURT key decides admission, equal-length conflicts resolve to
    deny (conservative), and a URL matching no rule gets
    ``default_allow``.

    SURT prefixes make one rule cover a subtree naturally:
    ``br,leg,`` scopes every *.leg.br host; ``br,leg,senado)`` scopes
    one host; ``br,leg,senado)/norma`` scopes a path subtree.  A prefix
    WITHOUT the ``)`` host terminator intentionally covers every host
    label completion (``br,leg,src1`` matches src1 AND src10..src19) —
    that is Heritrix SurtPrefixScope semantics, kept here.

    Scale/plan: the rule table is crawl CONFIG (10^1–10^4 rows) — it is
    aggregated to a single array row and crossJoin-broadcast
    (BroadcastNestedLoopJoin of 1×N), then per-URL matching is an
    in-row ``filter``/``array_max`` fold — candidates NEVER shuffle and
    there is no per-rule join fan-out.  Tie-break is encoded in the
    struct ordering: max over (prefix_length, deny_flag) picks the
    longest match and, on length ties, deny.

    Returns candidates + (surt, allowed).
    """
    rule_arr = rules.agg(
        F.collect_list(
            F.struct(
                F.col("surt_prefix").alias("p"),
                F.col("allow").alias("a"),
            )
        ).alias("_rules")
    )
    keyed = candidates.withColumn("surt", surt_key(F.col(url_col)))
    matched = F.filter(
        F.col("_rules"), lambda r: F.col("surt").startswith(r["p"])
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["p"]).alias("l"),
                (~r["a"]).cast("int").alias("deny"),
            ),
        )
    )
    return (
        keyed.crossJoin(F.broadcast(rule_arr))
        .withColumn(
            "allowed",
            F.when(F.size(matched) == 0, F.lit(default_allow)).otherwise(
                best["deny"] == 0
            ),
        )
        .drop("_rules")
    )
