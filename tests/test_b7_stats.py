"""Round-4 batch-7 operators: PMI collocations, TF-IDF keywords,
bigram LM scoring, Zipf fit, Flesch readability, PSI drift,
keep-alive connection reuse, tokenizer fertility."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legislation_scraper_spark.functions.text import (
    flesch_reading_ease,
    sentence_count,
    syllable_count,
)
from legislation_scraper_spark.operators.curation import (
    bigram_logprob_scores,
    pmi_collocations,
    zipf_slope,
)
from legislation_scraper_spark.operators.fetch import connection_reuse
from legislation_scraper_spark.operators.index import tfidf_topk
from legislation_scraper_spark.operators.sketches import psi_report
from legislation_scraper_spark.operators.tokenize import fertility_stats


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- PMI collocations -------------------------------------------------


def test_pmi_ranks_fixed_phrase_first(spark):
    # "new york" always co-occurs; filler words are independent
    rows = [(i, "new york " + ("a b c d " * 3)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=2, top_k=5).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    # exact PMI: p(new york)=10/130 bigrams; p(new)=p(york)=10/140 uni
    exp = math.log10((10 / 130.0) / ((10 / 140.0) * (10 / 140.0)))
    assert abs(out[0]["pmi"] - round(exp, 6)) < 1e-9


def test_pmi_min_count_prunes(spark):
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "rare pair")],
        "doc_id long, text string",
    )
    out = pmi_collocations(df, min_count=2, top_k=10).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("rare", "pair") not in pairs and ("x", "y") in pairs


def test_pmi_plan_is_takeordered(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _explain(pmi_collocations(df))
    assert "TakeOrderedAndProject" in plan  # no global sort


# --- TF-IDF keywords --------------------------------------------------


def test_tfidf_rare_term_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "common unique unique"),
            (2, "common common common"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id"], r["rnk"]): r["w"]
        for r in tfidf_topk(df, k=2).collect()
    }
    # 'unique' (df=1) outranks 'common' (df=3) in doc 1
    assert out[(1, 1)] == "unique"
    assert out[(2, 1)] == "common"


def test_tfidf_window_group_limit(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _explain(tfidf_topk(df, k=2))
    assert "WindowGroupLimit" in plan  # map-side per-doc top-k


# --- bigram LM --------------------------------------------------------


def test_bigram_lm_scores_prose_above_scramble(spark):
    # corpus dominated by one word order; one doc scrambles it
    prose = [(i, "o projeto de lei foi aprovado") for i in range(20)]
    df = spark.createDataFrame(
        prose + [(99, "aprovado foi lei de projeto o")],
        "doc_id long, text string",
    )
    out = {r["id"]: r["mean_logprob"] for r in
           bigram_logprob_scores(df, top_k=100).collect()}
    assert out[0] > out[99]  # seen bigrams beat unseen reversals


def test_bigram_lm_counts_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x")], "doc_id long, text string"
    )
    rows = bigram_logprob_scores(df).collect()
    # single-word doc contributes no bigrams and is dropped
    assert {r["id"]: r["n_bigrams"] for r in rows} == {1: 3}


# --- Zipf fit ---------------------------------------------------------


def test_zipf_slope_exact_power_law(spark):
    # counts 12/r at consecutive ranks 1..4 -> exact slope -1
    counts = {"w1": 12, "w2": 6, "w3": 4, "w4": 3}
    text = " ".join(" ".join([w] * c) for w, c in sorted(counts.items()))
    df = spark.createDataFrame(
        [(1, text, "s")], "doc_id long, text string, source string"
    )
    row = zipf_slope(df, group_col="source").collect()[0]
    assert row["n_ranks"] == 4
    # ln(count) = ln12 - 1*ln(rank) exactly at ranks 1..4
    assert abs(row["slope"] + 1.0) < 1e-6
    assert abs(row["intercept"] - math.log(12)) < 1e-6


def test_zipf_top_ranks_cap(spark):
    text = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, text, "s")], "doc_id long, text string, source string"
    )
    row = zipf_slope(df, group_col="source", top_ranks=50).collect()[0]
    assert row["n_ranks"] == 50


# --- readability ------------------------------------------------------


def test_syllable_and_sentence_counts(spark):
    df = spark.createDataFrame([(1, "Hello world. Yes!")], "id long, t string")
    row = df.select(
        sentence_count(F.col("t")).alias("s"),
        syllable_count(F.lit("banana")).alias("ban"),
        syllable_count(F.lit("strength")).alias("str"),
        syllable_count(F.lit("xyz")).alias("floor"),
    ).collect()[0]
    assert row["s"] == 2
    assert row["ban"] == 3  # ba-na-na
    assert row["str"] == 1  # one vowel group
    assert row["floor"] == 1  # floored at 1


def test_flesch_formula_exact(spark):
    # 4 words, 2 sentences, 6 syllables (go=1 now=1 stop=1 banana=3)
    df = spark.createDataFrame([(1, "Go now. Stop banana!")], "id long, t string")
    got = df.select(flesch_reading_ease(F.col("t")).alias("f")).collect()[0]["f"]
    exp = 206.835 - 1.015 * (4 / 2) - 84.6 * (6 / 4)
    assert abs(got - round(exp, 6)) < 1e-9


def test_flesch_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b.")], "id long, t string")
    plan = _explain(df.select(flesch_reading_ease(F.col("t"))))
    assert "Exchange" not in plan


# --- PSI drift --------------------------------------------------------


def test_psi_zero_when_stable(spark):
    # identical composition in both halves -> psi_term == 0 per cat
    rows = []
    for i in range(10):
        rows.append((i, f"2024-01-01 00:00:{i:02d}", "a"))
        rows.append((100 + i, f"2024-01-02 00:00:{i:02d}", "a"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = psi_report(df).collect()
    assert len(out) == 1 and out[0]["psi_term"] == 0.0
    assert out[0]["c1"] == 10 and out[0]["c2"] == 10


def test_psi_flags_drifted_category(spark):
    rows = [(i, "2024-01-01 00:00:00", "old") for i in range(10)]
    rows += [(100 + i, "2024-01-03 00:00:00", "new") for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_type"]: r for r in psi_report(df).collect()}
    assert out["old"]["c1"] == 10 and out["old"]["c2"] == 0
    assert out["new"]["psi_term"] > 0 and out["old"]["psi_term"] > 0


# --- keep-alive reuse -------------------------------------------------


def test_connection_reuse_gaps(spark):
    rows = [
        (1, "h1", "2024-01-01 00:00:00"),
        (2, "h1", "2024-01-01 00:00:10"),  # 10s gap -> reused
        (3, "h1", "2024-01-01 00:01:00"),  # 50s gap -> fresh
        (4, "h2", "2024-01-01 00:00:00"),  # first fetch -> fresh
    ]
    df = spark.createDataFrame(
        rows, "event_id long, host string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["host"]: r for r in
           connection_reuse(df, keepalive_s=15).collect()}
    assert out["h1"]["n_reused"] == 1 and out["h1"]["n_fetches"] == 3
    assert out["h2"]["n_reused"] == 0
    assert abs(out["h1"]["reuse_rate"] - round(1 / 3, 6)) < 1e-9


def test_connection_reuse_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "h1", "2024-01-01 00:00:00"), (2, "h2", "2024-01-01 00:00:05")],
        "event_id long, host string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _explain(connection_reuse(df))
    # lag window and the per-host agg share one hash exchange: the
    # formatted plan lists each Exchange node once in the detail
    # section as "(n) Exchange"
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges <= 1, plan


# --- tokenizer fertility ----------------------------------------------


def test_fertility_stats_ratio(spark):
    counts = spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, n_tokens long"
    )
    docs = spark.createDataFrame(
        [(1, "pt", 40), (2, "pt", 50), (3, "en", 7)],
        "doc_id long, lang string, n_chars long",
    )
    out = fertility_stats(counts, docs).collect()
    assert len(out) == 1  # doc 3 has no token row -> lang en absent
    row = out[0]
    assert row["lang"] == "pt" and row["sum_tokens"] == 30
    assert abs(row["chars_per_token"] - 3.0) < 1e-9
