"""Offline dataset build — the E2 pipeline (SURVEY.md §3).

Replaces the reference's DatasetBuilder (glob + threaded pd.read_json +
BackgroundSaver + checkpoint counters, /root/reference/src/datasets/
build_dataset.py:107-248) with one declarative Spark job:

  pages table → dedup on document_url (deterministic survivor)
              → column sanitize (url-decode, markdown squeeze, year cast)
              → text coalesce (html/pdf precedence, build_dataset.py:210-218)
              → text-analysis enrichment (tokens, quality, lang-id,
                fingerprint — the corpus-building extensions)
              → partitioned parquet export

The saver thread, CSV snapshot cadence, and row-count resume checkpoint
all disappear: Spark's write is atomic per job and the input is a
snapshot table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def build_dataset(pages: DataFrame) -> DataFrame:
    """pages (document_url, source, title, year, type, situation,
    summary, text_markdown, fetched_round) → analysis-ready dataset."""
    # dedup: one row per document_url, earliest fetch wins
    # (drop_duplicates at build_dataset.py:204, made deterministic)
    w = Window.partitionBy("document_url").orderBy(
        "fetched_round", "text_markdown"
    )
    deduped = (
        pages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    text = F.col("text_markdown")
    cleaned = (
        deduped
        # markdown squeeze \n{4,} → \n\n\n (build_dataset.py:223-229)
        .withColumn("text", F.regexp_replace(text, r"\n{4,}", "\n\n\n"))
        # unquote URL-encoding on sanitized fields (build_dataset.py:232-236)
        .withColumn("type", F.url_decode(F.col("type")))
        .withColumn("situation", F.url_decode(F.col("situation")))
        .withColumn("summary", F.url_decode(F.col("summary")))
        # year normalization (astype(int), build_dataset.py:238)
        .withColumn("year", F.col("year").cast("int"))
    )
    return cleaned.select(
        "document_url",
        "source",
        "title",
        "year",
        "type",
        T.ascii_slug(F.col("type")).alias("type_slug"),
        "situation",
        "summary",
        "text",
        T.token_count_ws(F.col("text")).alias("n_tokens"),
        T.token_count_bpe_ish(F.col("text")).alias("n_tokens_bpe"),
        F.round(T.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.fingerprint(F.col("text")).alias("fingerprint"),
    )


def export_dataset(
    pages: DataFrame, out_dir: str, partition_by: tuple = ("type_slug",)
) -> None:
    """Materialize the dataset as partitioned parquet (the HF-push sink
    S20 is out of scope; parquet is the interchange format)."""
    build_dataset(pages).write.mode("overwrite").partitionBy(
        *partition_by
    ).parquet(out_dir)
