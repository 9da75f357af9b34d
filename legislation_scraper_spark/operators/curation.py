"""Corpus-curation operators for the training-data pipeline: PII
scrubbing and benchmark-contamination screening.

Neither exists in the reference (its corpus is public legislation and
it ships everything it scrapes, build_dataset.py:204-248); both are
table-stakes for a 100 TB web-text pipeline, so they join the
dedup/quality ladder as first-class, oracle-checked operators.

Scale notes:
- ``scrub_pii`` is pure ``regexp_replace`` / ``regexp_count`` codegen —
  no UDF, no shuffle; it fuses into whatever scan feeds it.
- ``contamination_screen`` explodes corpus docs to n-gram shingles and
  equi-joins them against the benchmark's shingle set.  The benchmark
  side (an eval suite) is tiny relative to the corpus, so its distinct
  shingles BROADCAST; the corpus side is a map-side probe — no
  shuffle of corpus data at any scale.  Results aggregate per doc
  (contaminated gram count), which shuffles only (doc_id, count) pairs.

Regex dialect parity: patterns restricted to the Java-regex ∩ RE2
subset (no backrefs, no lookarounds) so the DuckDB oracles run the
SAME pattern strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles

# pattern, replacement-tag pairs; ORDER MATTERS (CPF before phone —
# a CPF's digit shape must not be half-eaten by the phone pattern)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\d{3}\.\d{3}\.\d{3}-\d{2}", "[CPF]"),
    (r"\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}", "[CNPJ]"),
    (r"\(\d{2}\)\s?\d{4,5}-\d{4}", "[PHONE]"),
)


def scrub_pii(text_col) -> F.Column:
    """Redact emails / CPF / CNPJ / phone numbers to typed tags."""
    out = text_col if isinstance(text_col, F.Column) else F.col(text_col)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text_col) -> list[F.Column]:
    """One redaction-count column per PII class (regexp_count codegen)."""
    col = text_col if isinstance(text_col, F.Column) else F.col(text_col)
    return [
        F.regexp_count(col, F.lit(pat)).alias(
            "n_" + tag.strip("[]").lower()
        )
        for pat, tag in PII_PATTERNS
    ]


def contamination_screen(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag corpus docs sharing ≥1 n-gram with any benchmark doc.

    Returns (doc_id, contaminated_grams, benchmark_hits): number of the
    doc's distinct n-grams found in the benchmark shingle set and how
    many benchmark docs share them.  Docs present in the benchmark
    itself should be excluded by the caller (or join on id inequality
    downstream).  The benchmark's distinct-shingle dim is broadcast —
    corpus rows never shuffle.
    """
    # per-doc dedup happens ROW-SIDE (array_distinct before explode) so
    # the corpus side needs no Exchange — a .distinct() here would
    # shuffle every corpus gram
    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("gram"),
    )
    bench = (
        grams(benchmark)
        .groupBy("gram")
        .agg(F.count("*").alias("bench_docs"))
    )
    return (
        grams(corpus)
        .join(F.broadcast(bench), "gram")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("contaminated_grams"),
            F.sum("bench_docs").cast("bigint").alias("benchmark_hits"),
        )
    )
