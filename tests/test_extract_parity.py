"""Byte-parity gate: extraction from html must equal the golden text
for EVERY url in the synthetic world, across all four source families,
including the base64-PDF OCR-fallback path and error pages.
(BASELINE.json: "byte-identical extracted text per url".)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.operators.extract import (
    extract_doc,
    extract_links,
)
from legislation_scraper_spark.synth import PAGE_SIZE, synth_world


@pytest.fixture(scope="module")
def world(spark):
    w = synth_world(spark, seed=42, docs_per_source=40, skew=5, partitions=8)
    return {k: v.cache() for k, v in w.items()}


def test_doc_extraction_byte_identical(world):
    docs = world["pages_raw"].filter(~F.col("url").contains("/busca"))
    rec = docs.select("url", "text", extract_doc("html").alias("r"))
    bad = rec.filter(
        (F.col("r.text") != F.col("text"))
        | F.col("r.text").isNull()
    )
    rows = bad.select("url", "text", "r.text").limit(5).collect()
    assert not rows, f"parity broken for {bad.count()} urls, e.g. {rows}"


def test_doc_metadata_matches_golden(world):
    docs = world["pages_raw"].filter(~F.col("url").contains("/busca"))
    rec = docs.select("url", extract_doc("html").alias("r"))
    gm = world["golden_meta"]
    j = rec.join(gm, rec.url == gm.document_url)
    mism = j.filter(
        (F.col("r.title") != F.col("title"))
        | (F.col("r.type") != F.col("type"))
        | (F.col("r.year") != F.col("year"))
        | (F.col("r.summary") != F.col("summary"))
        | (F.col("r.is_error") != F.col("is_error"))
        | (~F.col("is_error") & (F.col("r.situation") != F.col("situation")))
    )
    rows = mism.select("url", "r", "title", "situation").limit(5).collect()
    assert not rows, f"metadata mismatches: {rows}"


def test_error_pages_flagged(world):
    docs = world["pages_raw"].filter(~F.col("url").contains("/busca"))
    rec = docs.select("url", "text", extract_doc("html").alias("r"))
    gm = world["golden_meta"].filter(F.col("is_error"))
    n_err_gold = gm.count()
    n_err_got = rec.filter(F.col("r.is_error")).count()
    assert n_err_gold == n_err_got
    assert n_err_gold > 0, "world should contain some error pages"


def test_search_page_links(world):
    search = world["pages_raw"].filter(F.col("url").contains("/busca"))
    links = search.select("url", extract_links("html").alias("l"))
    first = links.filter(F.col("url").endswith("page=0")).collect()
    assert len(first) > 0
    for r in first:
        assert 0 < len(r["l"]["doc_links"]) <= PAGE_SIZE
        assert r["l"]["total"] is not None and r["l"]["total"] > 0
        if r["l"]["total"] > PAGE_SIZE:
            assert r["l"]["next_link"].endswith("page=1")
    # total link count == total docs
    n_links = links.select(
        F.explode("l.doc_links").alias("u")
    ).distinct().count()
    n_docs = world["golden_meta"].count()
    assert n_links == n_docs


def test_ocr_fallback_docs_exist(world):
    """The PDF/OCR path must actually be exercised by the world."""
    gm = world["golden_meta"]
    pdfish = gm.filter(
        (F.col("source").isin("planalto", "icmbio", "mato-grosso"))
        & ~F.col("is_error")
    )
    assert pdfish.count() > 0
