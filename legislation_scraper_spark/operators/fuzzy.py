"""Fuzzy string matching: blocked edit-distance self-join.

Title/name-level near-matching is the record-linkage tier the lexical
dedup ladder (exact → minhash → simhash → jaccard) doesn't cover:
"LEI Nº 12.345, DE 2 DE MARÇO DE 2004" vs "LEI N 12345 DE 2 DE MARCO
DE 2004" are the SAME act re-listed across state diarios with OCR and
formatting drift — high edit similarity on a SHORT string, invisible
to shingle-based sketches that need ≥ n tokens of context.  (The
reference scraper dedups only on exact document_url equality —
``/root/reference/src/scraper/base/scraper.py`` checkpoint ``seen``
sets — so cross-source fuzzy linkage is a capability gap this module
adds, not ports.)

Naive fuzzy join is O(n²) levenshtein calls — never viable.  The
Spark-first shape here is the repo's standard bucket-then-cap
discipline (operators/dedup.py):

- **block** on a cheap equality key (default: first token, lowercased
  — configurable to any expression, e.g. a phonetic code or a sorted
  q-gram prefix).  One hash shuffle.
- **capped in-array expansion** — groupBy block → ``collect_set`` of
  (id, s) structs capped at ``max_block`` → ``pair_expansion`` → the
  exact ``levenshtein`` filter runs ONLY inside blocks, JVM-side
  (whole-stage codegen, no Python).  A block bigger than the cap
  carries no discriminating signal at that key width (the simhash
  argument) and is dropped loudly via the documented contract rather
  than silently exploding a task.

Recall contract: a true pair split across blocks (first tokens differ)
is missed — the classic blocking trade-off.  Callers needing
k-complete recall compose two passes with independent keys (first
token + last token), exactly like multi-band LSH; completeness within
a block is exact.

At 100 TB: pair count is Σ C(block,2) bounded by ``max_block``·n/2,
levenshtein cost is bounded by short-string length (titles, names);
the one shuffle is the blocking groupBy.  AQE handles residual key
skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from legislation_scraper_spark.operators.dedup import pair_expansion


def first_token_block(col: Column) -> Column:
    """Default block key: lowercased first whitespace token."""
    return F.lower(F.split(F.trim(col), r"\s+").getItem(0))


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 2,
    block_key: Column | None = None,
    max_block: int = 10_000,
) -> DataFrame:
    """Pairs (a_id < b_id) sharing a block key with
    ``levenshtein(a, b) <= max_dist`` → (a_id, b_id, dist).

    One shuffle (the blocking groupBy); pair expansion and the edit
    distance both run in-row under whole-stage codegen.
    """
    key = (
        block_key
        if block_key is not None
        else first_token_block(F.col(text_col))
    )
    rows = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s"), key.alias("bk")
    )
    grouped = rows.groupBy("bk").agg(
        F.array_sort(F.collect_set(F.struct("id", "s"))).alias("ms")
    )
    return (
        grouped.filter((F.size("ms") >= 2) & (F.size("ms") <= max_block))
        .select(F.explode(pair_expansion(F.col("ms"))).alias("p"))
        .select(
            F.col("p.a_id.id").alias("a_id"),
            F.col("p.a_id.s").alias("a_s"),
            F.col("p.b_id.id").alias("b_id"),
            F.col("p.b_id.s").alias("b_s"),
        )
        # collect_set dedups STRUCTS: a duplicated id with two strings
        # keeps both and would self-pair (the simhash_pairs lesson)
        .filter(F.col("a_id") != F.col("b_id"))
        .withColumn("dist", F.levenshtein("a_s", "b_s"))
        .filter(F.col("dist") <= max_dist)
        .select("a_id", "b_id", "dist")
        .distinct()
    )
