"""Round-4 batch-6 operators: C4 line cleaning, char entropy,
containment pairs (prefix-filter completeness), LSH pair eval,
blocklist verdicts, saturation curve."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from legislation_scraper_spark.functions.text import char_entropy
from legislation_scraper_spark.operators.curation import c4_line_filter
from legislation_scraper_spark.operators.dedup import (
    containment_pairs,
    lsh_pair_eval,
)
from legislation_scraper_spark.operators.revisit import saturation_curve
from legislation_scraper_spark.operators.traps import blocklist_verdicts


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --- C4 line filter ---------------------------------------------------


def _c4(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_line_filter(df).collect()[0]


GOOD = "Esta linha tem muitas palavras e termina bem."


def test_c4_keeps_good_page(spark):
    row = _c4(spark, "\n".join([GOOD, GOOD + "!", GOOD + "?"]))
    assert row["kept"] and row["n_lines_kept"] == 3
    assert row["clean_text"].count("\n") == 2


def test_c4_line_rules(spark):
    # no terminal punct / short / javascript lines all drop
    row = _c4(
        spark,
        "\n".join(
            [
                GOOD,
                GOOD + "!",
                GOOD + "?",
                "Home | Contato | Sobre",
                "Leia mais.",
                "Please enable JavaScript to continue reading here.",
            ]
        ),
    )
    assert row["kept"] and row["n_lines_kept"] == 3


def test_c4_page_kill_and_min_lines(spark):
    assert not _c4(spark, "\n".join([GOOD] * 3 + ["lorem ipsum dolor sit amet."]))["kept"]
    assert not _c4(spark, "\n".join([GOOD] * 3 + ["var x = { a: 1 };"]))["kept"]
    two = _c4(spark, "\n".join([GOOD] * 2))
    assert not two["kept"] and two["n_lines_kept"] == 2
    assert two["clean_text"] is None


def test_c4_whitespace_normalized(spark):
    row = _c4(spark, "Esta   linha\ttem  muitas\tpalavras e termina bem.\n"
                     + GOOD + "\n" + GOOD)
    assert row["kept"]
    assert "  " not in row["clean_text"] and "\t" not in row["clean_text"]


# --- char entropy -----------------------------------------------------


def test_char_entropy_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "aabb")],
        "id long, t string",
    )
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.round(char_entropy(F.col("t")), 9).alias("h")
        ).collect()
    }
    assert got[1] == 0.0 and got[3] == 0.0
    assert math.isclose(got[2], 1.0) and math.isclose(got[4], 1.0)
    # no -0.0 leaks (repr-sort hazard in the driver compare)
    assert math.copysign(1.0, got[1]) == 1.0


def test_char_entropy_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, t string")
    plan = _explain(df.select(char_entropy(F.col("t")).alias("h")))
    assert "Exchange" not in plan


# --- containment pairs ------------------------------------------------


def test_containment_subset_found(spark):
    base = "um dois tres quatro cinco seis sete oito nove dez"
    df = spark.createDataFrame(
        [
            (1, base, "s"),
            (2, "um dois tres quatro cinco", "s"),  # prefix quote of 1
            (3, "outro texto totalmente diferente aqui agora", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_pairs(
            df, block_cols=["source"], shingle_n=2, threshold=0.9
        ).collect()
    }
    assert out[(2, 1)] == 1.0
    assert (1, 2) not in out  # big doc not contained in the quote
    assert all(a != 3 and b != 3 for a, b in out)


def test_containment_prefix_filter_complete(spark):
    """Every brute-force qualifying pair survives prefix filtering —
    the pigeonhole completeness guarantee, checked exhaustively on a
    small world with overlapping docs."""
    words = ["w%d" % i for i in range(12)]
    rows = []
    for i in range(12):
        # doc i = a sliding 6-word window; neighbors overlap heavily
        rows.append((i, " ".join(words[i // 2 : i // 2 + 6]), "s"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["a_id"], r["b_id"])
        for r in containment_pairs(
            df, block_cols=["source"], shingle_n=2, threshold=0.6
        ).collect()
    }
    # brute force in python
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    want = set()
    sets = {i: sh(t) for i, t, _ in rows}
    for a in sets:
        for b in sets:
            if a != b and len(sets[a] & sets[b]) / len(sets[a]) >= 0.6:
                want.add((a, b))
    assert got == want and want  # non-trivial world


def test_containment_blocking(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", "s1"), (2, "a b c d e", "s2")],
        "doc_id long, text string, source string",
    )
    assert (
        containment_pairs(df, block_cols=["source"], threshold=0.5).count()
        == 0
    )


# --- lsh pair eval ----------------------------------------------------


def test_lsh_eval_perfect_on_clones(spark):
    txt = "um dois tres quatro cinco seis sete oito nove dez onze doze"
    df = spark.createDataFrame(
        [(1, txt, "s"), (2, txt, "s"), (3, "texto sem nada em comum aqui presente hoje", "s")],
        "doc_id long, text string, source string",
    )
    row = lsh_pair_eval(df, block_cols=["source"]).collect()[0]
    # clones: identical signature -> candidate; identical sets -> true
    assert row["n_true"] == 1 and row["n_hit"] == 1
    assert row["recall"] == 1.0 and row["n_cand"] >= 1


def test_lsh_eval_empty_corpus_zero_denominators(spark):
    df = spark.createDataFrame(
        [(1, "só duas", "s")], "doc_id long, text string, source string"
    )  # < 3 words: no shingles anywhere
    row = lsh_pair_eval(df, block_cols=["source"]).collect()[0]
    assert (
        row["n_true"] == 0
        and row["n_cand"] == 0
        and row["precision"] == 0.0
        and row["recall"] == 0.0
    )


# --- blocklist verdicts -----------------------------------------------


def _bl(spark, urls):
    u = spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], "id long, url string"
    )
    bl = spark.createDataFrame(
        [("bad.com", "ads"), ("pirate.org", "warez")],
        "domain string, category string",
    )
    return {
        r["url"]: (r["blocked"], r["reason"])
        for r in blocklist_verdicts(u, bl, patterns=("casino", "poker")).collect()
    }


def test_blocklist_tiers(spark):
    got = _bl(
        spark,
        [
            "https://www.bad.com/page",          # domain tier
            "https://a.b.bad.com/x",             # subdomain evasion
            "https://clean.org/casino/night",    # pattern tier
            "https://clean.org/fine",            # clean
            "https://www.bad.com/casino",        # domain beats pattern
        ],
    )
    assert got["https://www.bad.com/page"] == (True, "domain:ads")
    assert got["https://a.b.bad.com/x"] == (True, "domain:ads")
    assert got["https://clean.org/casino/night"] == (True, "pattern:casino")
    assert got["https://clean.org/fine"] == (False, None)
    assert got["https://www.bad.com/casino"] == (True, "domain:ads")


def test_blocklist_broadcast_no_shuffle(spark):
    u = spark.createDataFrame([(1, "https://x.com/a")], "id long, url string")
    bl = spark.createDataFrame([("bad.com", "ads")], "domain string, category string")
    plan = _explain(blocklist_verdicts(u, bl, patterns=("casino",)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- saturation curve -------------------------------------------------


def test_saturation_curve_cumulative(spark):
    rows = [
        ("h1", 1, "2024-01-01 10:00:00"),
        ("h1", 1, "2024-01-02 10:00:00"),  # repeat entity: not new
        ("h1", 2, "2024-01-02 11:00:00"),
        ("h1", 3, "2024-01-02 12:00:00"),
        ("h2", 1, "2024-01-05 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "host string, ent long, ts string").select(
        "host", "ent", F.to_timestamp("ts").alias("ts")
    )
    out = {
        (r["key"], str(r["day"])): (r["new_entities"], r["cum_entities"])
        for r in saturation_curve(df, "host", "ent", "ts").collect()
    }
    assert out[("h1", "2024-01-01")] == (1, 1)
    assert out[("h1", "2024-01-02")] == (2, 3)
    assert out[("h2", "2024-01-05")] == (1, 1)
    assert len(out) == 3


# --- revalidation -----------------------------------------------------


def test_revalidation_modes_and_outcomes(spark):
    from legislation_scraper_spark.operators.fetch import (
        revalidation_outcomes,
        revalidation_plan,
    )

    cand = spark.createDataFrame(
        [(u,) for u in ["u1", "u2", "u3", "u4"]], "url string"
    )
    prior = spark.createDataFrame(
        [
            ("u1", '"e1"', None, "d1"),     # etag, unchanged -> 304
            ("u2", None, "lm", "d2"),        # lm only, changed -> 200
            ("u3", None, None, "d3"),        # no validators -> full
        ],
        "url string, etag string, last_modified string, digest string",
    )
    live = spark.createDataFrame(
        [("u1", "d1", 100), ("u2", "dX", 200), ("u3", "d3", 300),
         ("u4", "d4", 400)],
        "url string, digest string, size_bytes long",
    )
    out = {
        r["url"]: (r["mode"], r["status"], r["fetched_bytes"], r["saved_bytes"])
        for r in revalidation_outcomes(
            revalidation_plan(cand, prior), live
        ).collect()
    }
    assert out["u1"] == ("conditional", 304, 0, 100)
    assert out["u2"] == ("conditional", 200, 200, 0)
    assert out["u3"] == ("full", 200, 300, 0)     # digest matches but no validator sent
    assert out["u4"] == ("full", 200, 400, 0)     # never crawled before


# --- compaction plan ---------------------------------------------------


def test_compaction_plan_groups(spark):
    from legislation_scraper_spark.tables import compaction_plan

    files = spark.createDataFrame(
        [
            ("p1", "a", 150), ("p1", "b", 100), ("p1", "c", 60),
            ("p1", "d", 40), ("p2", "e", 500),
        ],
        "partition string, path string, size_bytes long",
    )
    got = {
        r["path"]: r["group_id"]
        for r in compaction_plan(files, target_bytes=200).collect()
    }
    # p1 desc order: a(150) b(100) c(60) d(40); running-before 0,150,250,310
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 0}


def test_compaction_plan_oversize_file_own_group(spark):
    from legislation_scraper_spark.tables import compaction_plan

    files = spark.createDataFrame(
        [("p", "big", 900), ("p", "s1", 10), ("p", "s2", 10)],
        "partition string, path string, size_bytes long",
    )
    got = {
        r["path"]: r["group_id"]
        for r in compaction_plan(files, target_bytes=100).collect()
    }
    assert got["big"] == 0 and got["s1"] == 9 and got["s2"] == 9


# --- analyze stats ------------------------------------------------------


def test_analyze_stats_long_format(spark):
    from legislation_scraper_spark.tables import analyze_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, v string"
    )
    got = {r["column"]: r for r in analyze_stats(df, ("k", "v")).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_value"] == "1" and got["k"]["max_value"] == "2"
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_value"] == "a" and got["v"]["max_value"] == "b"


# --- skew report ---------------------------------------------------------


def test_skew_report_flags_hot_key(spark):
    from legislation_scraper_spark.operators.politeness import skew_report

    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "host string")
    got = {r["key"]: r for r in skew_report(df, "host").collect()}
    # mean count = 100/21; hot ratio = 80/(100/21) = 16.8 -> salt
    assert got["hot"]["needs_salt"] and got["hot"]["n_rows"] == 80
    assert got["hot"]["share"] == 0.8
    assert not got["k0"]["needs_salt"]


def test_skew_report_top_k(spark):
    from legislation_scraper_spark.operators.politeness import skew_report

    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "host string")
    assert skew_report(df, "host", top_k=10).count() == 10


# --- zorder key ----------------------------------------------------------


def test_zorder_key_interleave(spark):
    from legislation_scraper_spark.tables import zorder_key2

    df = spark.createDataFrame(
        [(0b1010, 0b0101), (0, 0), (1, 0), (0, 1), (65535, 65535)],
        "a long, b long",
    )
    got = [
        r["z"]
        for r in df.select(zorder_key2("a", "b").alias("z")).collect()
    ]

    def morton(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    assert got == [
        morton(0b1010, 0b0101), 0, 1, 2, morton(65535, 65535)
    ]


def test_zorder_locality(spark):
    """Sorting by z-key co-locates rows that are close in BOTH dims:
    the average |a-diff| between z-adjacent rows must beat a sort by
    b alone (which scatters a)."""
    import itertools

    rows = [(a, b) for a, b in itertools.product(range(16), range(16))]
    df = spark.createDataFrame(rows, "a long, b long")
    from legislation_scraper_spark.tables import zorder_key2

    z = [
        (r["a"], r["b"])
        for r in df.select("a", "b", zorder_key2("a", "b").alias("z"))
        .orderBy("z")
        .collect()
    ]
    bsort = sorted(rows, key=lambda r: (r[1], r[0]))

    def adj_a_dist(seq):
        return sum(abs(x[0] - y[0]) for x, y in zip(seq, seq[1:]))

    assert adj_a_dist(z) < adj_a_dist(bsort)


# --- AIMD concurrency ----------------------------------------------------


def test_aimd_trajectory(spark):
    from legislation_scraper_spark.operators.politeness import (
        aimd_concurrency,
    )

    rows = [
        # h1: three clean rounds -> 1+1+1+1 = 4
        ("h1", 0, 0.0), ("h1", 1, 0.1), ("h1", 2, 0.2),
        # h2: grow to 3, then a bad round halves (floor): 3 -> 1
        ("h2", 0, 0.0), ("h2", 1, 0.0), ("h2", 2, 0.9),
        # h3: all bad, floored at 1
        ("h3", 0, 0.9), ("h3", 1, 0.9),
    ]
    df = spark.createDataFrame(rows, "host string, round int, error_rate double")
    got = {
        r["host"]: r["concurrency"]
        for r in aimd_concurrency(df).collect()
    }
    assert got == {"h1": 4, "h2": 1, "h3": 1}


def test_aimd_cap(spark):
    from legislation_scraper_spark.operators.politeness import (
        aimd_concurrency,
    )

    rows = [("h", i, 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, "host string, round int, error_rate double")
    assert aimd_concurrency(df, cap=8).collect()[0]["concurrency"] == 8
