"""Round-4 batch-15 operators: DUST rule mining, positional-index
phrase search, alias-collapsed link graph."""

from __future__ import annotations

import pyspark.sql.functions as F

from legislation_scraper_spark.operators.dust import (
    apply_dust_rules,
    dust_rules,
)
from legislation_scraper_spark.operators.graph import collapse_aliases
from legislation_scraper_spark.operators.index import (
    phrase_search,
    positional_index,
)


# --- dust_rules -------------------------------------------------------


def _pages(spark, rows):
    return spark.createDataFrame(rows, "digest string, url string")


def test_dust_deletion_and_substitution_rules(spark):
    rows = []
    for i in range(4):
        base = f"http://h/s/{i}"
        rows += [
            ("d%d" % i, base),
            ("d%d" % i, base + "/index.html"),
            ("d%d" % i, base + "?m=true"),
            ("d%d" % i, base + "?m=false"),
        ]
    got = {
        (r["rule_from"], r["rule_to"]): r["support"]
        for r in dust_rules(_pages(spark, rows), min_support=2).collect()
    }
    # per digest: (base, base/index.html) -> deletion; (?m=false, ?m=true)
    # -> substitution; the four cross pairs yield nothing
    assert got == {("index.html", ""): 4, ("true", "false"): 4}


def test_dust_min_support_filters(spark):
    rows = [
        ("d1", "http://h/a"),
        ("d1", "http://h/a/index.html"),
    ]
    assert dust_rules(_pages(spark, rows), min_support=2).count() == 0
    got = dust_rules(_pages(spark, rows), min_support=1).collect()
    assert len(got) == 1 and got[0]["rule_from"] == "index.html"


def test_dust_two_token_diff_yields_nothing(spark):
    # same length, two mismatching positions: no rule
    rows = [
        ("d1", "http://h/a/x?k=1"),
        ("d1", "http://h/b/x?k=2"),
    ]
    assert dust_rules(_pages(spark, rows), min_support=1).count() == 0
    # length differs by 2: no rule
    rows2 = [
        ("d2", "http://h/a"),
        ("d2", "http://h/a?k=1"),
    ]
    assert dust_rules(_pages(spark, rows2), min_support=1).count() == 0


def test_dust_trailing_extra_token(spark):
    # no mismatch within the short length -> the extra token is last
    rows = [
        ("d1", "http://h/a/b"),
        ("d1", "http://h/a/b/print"),
        ("d2", "http://h/c/d"),
        ("d2", "http://h/c/d/print"),
    ]
    got = dust_rules(_pages(spark, rows), min_support=2).collect()
    assert len(got) == 1
    assert (got[0]["rule_from"], got[0]["rule_to"], got[0]["support"]) == (
        "print", "", 2,
    )


def test_apply_dust_rules_canonicalizes(spark):
    rules = spark.createDataFrame(
        [("index.html", "", 5), ("true", "false", 5)],
        "rule_from string, rule_to string, support bigint",
    )
    fr = spark.createDataFrame(
        [
            ("http://h/s/1/index.html",),
            ("http://h/s/1",),
            ("http://h/s/1?m=true",),
            ("http://h/s/1?m=false",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["canon_key"]
        for r in apply_dust_rules(fr, rules).collect()
    }
    # the deletion rule folds the index.html alias onto the base URL;
    # the substitution rule folds m=true onto m=false (u1 vs u3 never
    # produced a rule — query-less and query forms stay distinct keys)
    assert got["http://h/s/1/index.html"] == got["http://h/s/1"]
    assert got["http://h/s/1?m=true"] == got["http://h/s/1?m=false"]
    assert len(set(got.values())) == 2


# --- positional index + phrase search ---------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_positional_index_positions(spark):
    idx = positional_index(_docs(spark, ["a b a  c", "b"]))
    got = {
        (r["term"], r["id"]): r["positions"] for r in idx.collect()
    }
    assert got[("a", 0)] == [0, 2]
    assert got[("b", 0)] == [1]
    assert got[("c", 0)] == [3]
    assert got[("b", 1)] == [0]


def test_phrase_search_counts_and_filters(spark):
    docs = _docs(
        spark,
        [
            "x a b y a b",      # 2 occurrences
            "a x b",            # terms present, never adjacent
            "b a",              # reversed
            "a b",              # 1 occurrence
        ],
    )
    idx = positional_index(docs)
    got = {
        r["id"]: r["n_occurrences"]
        for r in phrase_search(idx, ["a", "b"]).collect()
    }
    assert got == {0: 2, 3: 1}


def test_phrase_search_three_terms_and_repeated(spark):
    docs = _docs(spark, ["a a a b", "a b a", "c c"])
    idx = positional_index(docs)
    got3 = {
        r["id"]: r["n_occurrences"]
        for r in phrase_search(idx, ["a", "a", "b"]).collect()
    }
    assert got3 == {0: 1}
    rep = {
        r["id"]: r["n_occurrences"]
        for r in phrase_search(idx, ["a", "a"]).collect()
    }
    assert rep == {0: 2}
    assert phrase_search(idx, ["b", "c"]).count() == 0


def test_phrase_search_capped_index_is_approximate(spark):
    # documented contract: a capped index may undercount long docs
    docs = _docs(spark, ["a " * 100 + "a b"])
    full = positional_index(docs)
    assert phrase_search(full, ["a", "b"]).collect()[0][
        "n_occurrences"
    ] == 1


# --- collapse_aliases -------------------------------------------------


def test_collapse_aliases_folds_and_weights(spark):
    edges = spark.createDataFrame(
        [("a1", "b"), ("a2", "b"), ("b", "a1"), ("a1", "a2")],
        "src string, dst string",
    )
    aliases = spark.createDataFrame(
        [("a1", "a"), ("a2", "a")], "url string, canonical string"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in collapse_aliases(edges, aliases).collect()
    }
    # a1->b and a2->b fold to a->b weight 2; a1->a2 becomes a self-loop
    # and is dropped; b->a1 becomes b->a
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_collapse_aliases_identity_when_no_match(spark):
    edges = spark.createDataFrame(
        [("x", "y")], "src string, dst string"
    )
    aliases = spark.createDataFrame(
        [("zzz", "z")], "url string, canonical string"
    )
    got = collapse_aliases(edges, aliases).collect()
    assert [(r["src"], r["dst"], r["weight"]) for r in got] == [
        ("x", "y", 1)
    ]
