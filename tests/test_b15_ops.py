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


# --- hyperball --------------------------------------------------------


def _hb_py(nodes, balls, t):
    """Straight-line HLL estimate of each node's exact ball set —
    independent of the Spark register plumbing."""
    import hashlib
    import math

    def reg(n):
        h = hashlib.md5(n.encode()).hexdigest()
        b = int(h[0], 16)
        w = h[1:14]
        t_ = w.lstrip("0")
        lz = len(w) - len(t_)
        first = t_[:1]
        extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1,
                 "7": 1}.get(first, 0)
        return b, lz * 4 + extra + 1

    out = {}
    for n in nodes:
        regs = [0] * 16
        for m in balls[n]:
            b, r = reg(m)
            regs[b] = max(regs[b], r)
        s = sum(1 << (50 - min(r, 50)) for r in regs)
        v = sum(1 for r in regs if r == 0)
        raw = 0.673 * 256 * (2.0 ** 50) / float(s)
        if raw < 40.0 and v > 0:
            est = 16.0 * math.log(16.0 / v)
        else:
            est = raw
        out[n] = round(est, 4)
    return out


def test_hyperball_matches_exact_ball_estimates(spark):
    from legislation_scraper_spark.operators.graph import hyperball

    # a -> b -> c -> d, a -> c ; e isolated source e -> a
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "a")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: r for r in hyperball(e, iters=2).collect()}

    nodes = list("abcde")
    out = {n: {n} for n in nodes}
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    ball1 = {n: out[n] | set().union(*[out[m] for m in adj.get(n, set())] or [set()])
             for n in nodes}
    ball2 = {n: ball1[n] | set().union(*[ball1[m] for m in adj.get(n, set())] or [set()])
             for n in nodes}
    e1 = _hb_py(nodes, ball1, 1)
    e2 = _hb_py(nodes, ball2, 2)
    for n in nodes:
        assert abs(got[n]["ball_1"] - e1[n]) < 1e-9, (n, got[n], e1[n])
        assert abs(got[n]["ball_2"] - e2[n]) < 1e-9, (n, got[n], e2[n])


def test_hyperball_monotone_and_sink(spark):
    from legislation_scraper_spark.operators.graph import hyperball

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a")],
        "src string, dst string",
    )
    rows = hyperball(e, iters=3).collect()
    for r in rows:
        assert r["ball_1"] <= r["ball_2"] + 1e-9
        assert r["ball_2"] <= r["ball_3"] + 1e-9


# --- salsa ------------------------------------------------------------


def test_salsa_hand_graph(spark):
    from legislation_scraper_spark.operators.graph import salsa

    # hubs {a, b}, authorities {x, y}; a->x, a->y, b->y
    e = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "y")], "src string, dst string"
    )
    got = {r["node"]: r for r in salsa(e, iters=1).collect()}
    # a0 = 1/2 each; h1(a) = a0(x)/in(x) + a0(y)/in(y) = 1/2 + 1/4
    # h1(b) = a0(y)/in(y) = 1/4
    assert abs(got["a"]["hub"] - 0.75) < 1e-9
    assert abs(got["b"]["hub"] - 0.25) < 1e-9
    # a1(x) = h1(a)/out(a) = 0.375 ; a1(y) = 0.375 + 0.25
    assert abs(got["x"]["authority"] - 0.375) < 1e-9
    assert abs(got["y"]["authority"] - 0.625) < 1e-9
    # pure hubs score 0 authority and vice versa
    assert got["a"]["authority"] == 0.0
    assert got["x"]["hub"] == 0.0


def test_salsa_scores_stay_distributions(spark):
    from legislation_scraper_spark.operators.graph import salsa

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    out = salsa(e, iters=3).agg(
        F.sum("hub").alias("h"), F.sum("authority").alias("a")
    ).collect()[0]
    # scores are rounded to 6dp per node, so the sums carry up to
    # n_nodes x 5e-7 of rounding
    assert abs(out["h"] - 1.0) < 5e-6
    assert abs(out["a"] - 1.0) < 5e-6


# --- adaptive_fetch_delay ---------------------------------------------


def test_adaptive_delay_window_and_clamps(spark):
    from legislation_scraper_spark.operators.politeness import (
        adaptive_fetch_delay,
    )

    rows = []
    # fast host: latencies 100ms -> delay pinned at the 500ms floor
    rows += [("fast", t, 100.0) for t in range(20)]
    # slow host: 5000ms -> 2x mean = 10000 -> pinned at 8000 ceiling
    rows += [("slow", t, 5000.0) for t in range(4)]
    # drifting host: old fetches 10000ms, recent 4 are 1000ms; with
    # window=4 only the recent ones count -> delay 2000
    rows += [("drift", t, 10000.0) for t in range(10)]
    rows += [("drift", 100 + t, 1000.0) for t in range(4)]
    # flapper: alternating timeouts (NULL -> max) and 0ms
    rows += [("flap", t, None if t % 2 == 0 else 0.0) for t in range(8)]
    log = spark.createDataFrame(
        rows, "host string, fetched_at long, latency_ms double"
    )
    got = {
        r["host"]: r
        for r in adaptive_fetch_delay(
            log, window=4, k=2.0, min_delay_ms=500, max_delay_ms=8000
        ).collect()
    }
    assert got["fast"]["delay_ms"] == 500.0
    assert got["slow"]["delay_ms"] == 8000.0
    assert got["drift"]["mean_latency_ms"] == 1000.0
    assert got["drift"]["delay_ms"] == 2000.0
    # flap window=4 over ts 7,6,5,4 -> lats 0, 8000, 0, 8000 -> mean 4000
    assert got["flap"]["mean_latency_ms"] == 4000.0
    assert got["flap"]["delay_ms"] == 8000.0
    assert all(r["n_recent"] == 4 for r in got.values())


# --- shark_scores -----------------------------------------------------


def test_shark_scores_branches(spark):
    from legislation_scraper_spark.operators.focused import shark_scores

    parents = spark.createDataFrame(
        [
            ("rel", 0.8, 0.2),     # relevant parent: inherit from rel
            ("irr", 0.0, 0.6),     # irrelevant: decay its inherited
        ],
        "url string, relevance double, inherited double",
    )
    links = spark.createDataFrame(
        [
            # anchor matched -> context forced to 1
            ("rel", "c1", 0.4, 0.1),
            # no anchor match -> context used as-is
            ("rel", "c2", 0.0, 0.6),
            # child via irrelevant parent
            ("irr", "c3", 0.0, 0.0),
            # c2 discovered twice: keeps the better evidence
            ("irr", "c2", 0.0, 1.0),
        ],
        "src string, dst string, anchor_rel double, context_rel double",
    )
    got = {
        r["url"]: r
        for r in shark_scores(parents, links).collect()
    }
    # c1: inh=.5*.8=.4 ; neigh=.75*.4+.25*1=.55 ; pot=.5*.4+.5*.55
    assert abs(got["c1"]["potential"] - 0.475) < 1e-9
    # c2 via rel: inh=.4, neigh=.25*.6=.15 -> .275
    # c2 via irr: inh=.5*.6=.3, neigh=.25*1.0=.25 -> .275 -> tie .275
    assert abs(got["c2"]["potential"] - 0.275) < 1e-9
    assert got["c2"]["n_parents"] == 2
    # c3: inh=.3, neigh=0 -> .15
    assert abs(got["c3"]["potential"] - 0.15) < 1e-9


# --- pagerank_weighted ------------------------------------------------


def test_weighted_rank_vs_uniform_on_unit_weights(spark):
    from legislation_scraper_spark.operators.graph import (
        pagerank,
        pagerank_weighted,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    ew = e.withColumn("weight", F.lit(1))
    u = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    w = {
        r["node"]: r["rank"]
        for r in pagerank_weighted(ew, iters=2).collect()
    }
    for n in u:
        assert abs(u[n] - w[n]) < 1e-12


def test_weighted_rank_follows_weight_mass(spark):
    from legislation_scraper_spark.operators.graph import pagerank_weighted

    # a sends 9/10 of its mass to b, 1/10 to c
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0)],
        "src string, dst string, weight double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_weighted(e, iters=1).collect()
    }
    third = 1.0 / 3.0
    base = 0.15 / 3
    assert abs(got["b"] - (base + 0.85 * third * 0.9)) < 1e-12
    assert abs(got["c"] - (base + 0.85 * third * 0.1)) < 1e-12
    assert abs(got["a"] - base) < 1e-12


# --- hard_negatives ---------------------------------------------------


def test_hard_negatives_excludes_same_label_before_ranking(spark):
    from legislation_scraper_spark.operators.similarity import (
        hard_negatives,
    )

    # anchor a0 (label 0); nearest is SAME label (must not take a
    # slot); then two cross-label at decreasing similarity
    rows = [
        ("a0", [1.0, 0.0], 0),
        ("same", [0.99, 0.1], 0),      # closest but same label
        ("n1", [0.9, 0.2], 1),
        ("n2", [0.5, 0.5], 2),
        ("n3", [-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, label int"
    )
    anchors = df.filter(F.col("vec_id") == "a0")
    got = [
        (r["cid"], r["rnk"])
        for r in hard_negatives(anchors, df, k=2)
        .orderBy("rnk")
        .collect()
    ]
    assert got == [("n1", 1), ("n2", 2)]


def test_hard_negatives_k_and_tiebreak(spark):
    from legislation_scraper_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        ("q", [1.0, 0.0], 0),
        ("b", [1.0, 0.0], 1),   # exact tie with c -> cid asc
        ("c", [1.0, 0.0], 1),
        ("d", [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, label int"
    )
    anchors = df.filter(F.col("vec_id") == "q")
    got = [
        r["cid"]
        for r in hard_negatives(anchors, df, k=3).orderBy("rnk").collect()
    ]
    assert got == ["b", "c", "d"]


# --- dedup_aware_split ------------------------------------------------


def test_dedup_split_zero_leakage_vs_naive(spark):
    from legislation_scraper_spark.operators.curation import (
        dedup_aware_split,
    )

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    l, r = docs.alias("l"), docs.alias("r")
    edges = (
        l.join(r, F.col("r.doc_id") == F.col("l.doc_id") + 1)
        .filter(F.col("l.doc_id") % 8 != 7)
        .select(
            F.col("l.doc_id").alias("a_id"),
            F.col("r.doc_id").alias("b_id"),
        )
    )
    out = dedup_aware_split(docs, edges, n_splits=4)
    # zero leakage: every edge's endpoints share a split
    s = out.select(F.col("id"), F.col("split"))
    e2 = (
        edges.join(s.withColumnRenamed("id", "a_id"), "a_id")
        .withColumnRenamed("split", "sa")
        .join(s.withColumnRenamed("id", "b_id"), "b_id")
        .withColumnRenamed("split", "sb")
    )
    assert e2.filter(F.col("sa") != F.col("sb")).count() == 0
    # the naive per-doc hash split DOES leak on this graph
    naive = docs.select(
        F.col("doc_id").alias("id"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10,
            ).cast("int") % 4
        ).alias("split"),
    )
    e3 = (
        edges.join(naive.withColumnRenamed("id", "a_id"), "a_id")
        .withColumnRenamed("split", "sa")
        .join(naive.withColumnRenamed("id", "b_id"), "b_id")
        .withColumnRenamed("split", "sb")
    )
    assert e3.filter(F.col("sa") != F.col("sb")).count() > 0


def test_dedup_split_singletons_self_component(spark):
    from legislation_scraper_spark.operators.curation import (
        dedup_aware_split,
    )

    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([(0, 1)], "a_id long, b_id long")
    got = {
        r["id"]: r["component"]
        for r in dedup_aware_split(docs, edges, n_splits=3).collect()
    }
    assert got[0] == got[1] == 0
    for i in range(2, 10):
        assert got[i] == i


# --- quantile_gate ----------------------------------------------------


def test_quantile_gate_per_group_cut(spark):
    from legislation_scraper_spark.operators.curation import quantile_gate

    rows = [("en", i, float(i)) for i in range(10)]       # scores 0..9
    rows += [("pt", 100 + i, float(i) / 100) for i in range(5)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, score double")
    out = quantile_gate(df, keep_frac=0.3, group_col="lang")
    got = {
        lang: sorted(r["doc_id"] for r in rs)
        for lang, rs in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: r["lang"]),
            key=lambda r: r["lang"],
        )
    }
    # en: percent_rank over 10 rows -> pr = (rank-1)/9 <= 0.3 keeps
    # ranks 1..3 (top scores 9,8,7 = ids 9,8,7)
    assert got["en"] == [7, 8, 9]
    # pt has its OWN cut despite globally tiny scores: 5 rows, ranks
    # 1..2 survive (pr 0, 0.25)
    assert got["pt"] == [103, 104]
    # a global 30% cut would have kept NOTHING from pt — the point
    assert all(s < 0.05 for s in [r["score"] for r in out.collect()
                                  if r["lang"] == "pt"])


def test_quantile_gate_single_row_group_survives(spark):
    from legislation_scraper_spark.operators.curation import quantile_gate

    df = spark.createDataFrame(
        [("solo", 1, 0.0001)], "lang string, doc_id long, score double"
    )
    assert quantile_gate(df, keep_frac=0.1).count() == 1


# --- margin_knn_pairs -------------------------------------------------


def test_margin_beats_raw_cosine_on_hub(spark):
    from legislation_scraper_spark.operators.similarity import (
        margin_knn_pairs,
    )

    # hub target "hub" is moderately close to EVERYTHING; the true
    # match "t0" is the real nearest for q0 only.  Raw cosine would
    # still pick t0 here, so make the hub slightly closer to q0 than
    # t0 is — margin must divide the hub's neighborhood mass out and
    # still pick t0.
    src = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0]), ("q1", [0.0, 1.0, 0.0]),
         ("q2", [0.0, 0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [
            ("hub", [0.58, 0.58, 0.58]),   # cos ~0.577 to every query
            ("t0", [0.9, 0.1, 0.0]),       # cos ~0.994 to q0
            ("t1", [0.1, 0.9, 0.0]),
            ("t2", [0.0, 0.1, 0.9]),
        ],
        "vec_id string, embedding array<double>",
    )
    got = {
        r["qid"]: r["cid"]
        for r in margin_knn_pairs(src, tgt, k=2).collect()
    }
    assert got == {"q0": "t0", "q1": "t1", "q2": "t2"}


def test_margin_one_row_per_source(spark):
    from legislation_scraper_spark.operators.similarity import (
        margin_knn_pairs,
    )

    src = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(100 + i, [1.0, float(i)]) for i in range(7)],
        "vec_id long, embedding array<double>",
    )
    out = margin_knn_pairs(src, tgt, k=3)
    assert out.count() == 5
    assert out.select("qid").distinct().count() == 5
    assert all(r["margin"] > 0 for r in out.collect())


# --- ranking_metrics --------------------------------------------------


def test_ranking_metrics_hand_case(spark):
    from legislation_scraper_spark.operators.index import ranking_metrics
    import math

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3),
         (2, "x", 1), (2, "y", 2)],
        "qid long, cid string, rnk int",
    )
    truth = spark.createDataFrame(
        [(1, "b", 3.0), (1, "c", 1.0), (1, "zzz", 2.0),
         (2, "nope", 1.0)],
        "qid long, cid string, rel double",
    )
    got = {r["qid"]: r for r in ranking_metrics(ranked, truth, k=3).collect()}
    # q1: first relevant at rnk 2 -> mrr 0.5
    assert abs(got[1]["mrr"] - 0.5) < 1e-9
    dcg = (2**3 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert abs(got[1]["dcg"] - round(dcg, 6)) < 1e-9
    assert abs(got[1]["idcg"] - round(idcg, 6)) < 1e-9
    assert abs(got[1]["ndcg"] - round(dcg / idcg, 6)) < 2e-6
    # q2: retrieved nothing relevant; its only relevant doc unretrieved
    assert got[2]["mrr"] == 0.0 and got[2]["dcg"] == 0.0
    assert got[2]["idcg"] > 0 and got[2]["ndcg"] == 0.0


def test_ranking_metrics_perfect_ranking(spark):
    from legislation_scraper_spark.operators.index import ranking_metrics

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "qid long, cid string, rnk int"
    )
    truth = spark.createDataFrame(
        [(1, "a", 2.0), (1, "b", 1.0)], "qid long, cid string, rel double"
    )
    r = ranking_metrics(ranked, truth, k=5).collect()[0]
    assert r["mrr"] == 1.0 and abs(r["ndcg"] - 1.0) < 1e-9


# --- age_priorities ---------------------------------------------------


def test_priority_aging_overtakes_and_clamps(spark):
    from legislation_scraper_spark.operators.politeness import (
        age_priorities,
    )

    fr = spark.createDataFrame(
        [
            ("old", 4.0, 0),     # base-worst but waited 10 rounds
            ("mid", 2.0, 8),     # waited 2
            ("new", 0.0, 10),    # fresh, base-best
            ("future", 1.0, 12), # clock skew: waited clamps to 0
        ],
        "url string, priority double, discovered_round int",
    )
    got = {
        r["url"]: r["priority"]
        for r in age_priorities(fr, current_round=10, rate=0.5).collect()
    }
    assert abs(got["old"] - (4.0 - 5.0)) < 1e-12    # overtakes new
    assert abs(got["mid"] - 1.0) < 1e-12
    assert got["new"] == 0.0
    assert got["future"] == 1.0                      # no negative wait
    order = sorted(got, key=lambda u: got[u])
    assert order[0] == "old"


# --- excise_spans -----------------------------------------------------


def test_excise_spans_overlap_clamp_passthrough(spark):
    from legislation_scraper_spark.operators.curation import excise_spans

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 1, 4),     # cut t1..t3
            (1, 3, 6),     # overlaps: cut extends to t5
            (1, 50, 55),   # beyond length: clamps to nothing
        ],
        "doc_id long, start_tok long, end_tok long",
    )
    got = {r["id"]: r for r in excise_spans(docs, spans).collect()}
    assert got[1]["text"] == "t0 t6 t7"
    assert got[1]["n_tokens"] == 8 and got[1]["n_kept"] == 3
    # doc with no spans passes through byte-identical
    assert got[2]["text"] == "a b c" and got[2]["n_kept"] == 3
    # empty doc survives the sequence guard
    assert got[3]["n_tokens"] == 0 and got[3]["text"] == ""


def test_excise_spans_full_cut(spark):
    from legislation_scraper_spark.operators.curation import excise_spans

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 0, 2)], "doc_id long, start_tok long, end_tok long"
    )
    r = excise_spans(docs, spans).collect()[0]
    assert r["n_kept"] == 0 and r["text"] == ""


def test_dup_spans_keep_first_and_excise_composition(spark):
    """dup_spans finds cross-doc duplicated k-grams as excisable
    intervals; keep_first suppresses the canonical (min-id) holder so
    one copy survives excision — the Lee et al. cut-not-drop shape."""
    from legislation_scraper_spark.operators.curation import (
        dup_spans,
        excise_spans,
    )

    shared = "s1 s2 s3 s4"  # 4-gram duplicated across docs 1 and 3
    docs = spark.createDataFrame(
        [
            (1, f"a b {shared} c d"),
            (2, "unrelated words only here"),
            (3, f"x {shared} y z w"),
        ],
        "doc_id long, text string",
    )
    spans = dup_spans(docs, gram_words=4, keep_first=True)
    rows = spans.collect()
    # only doc 3 (the non-canonical holder) gets a span, at tokens 1..5
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["start_tok"] == 1 and rows[0]["end_tok"] == 5
    out = {
        r["id"]: r for r in excise_spans(docs, spans).collect()
    }
    assert out[1]["text"] == f"a b {shared} c d"  # canonical copy kept
    assert out[3]["text"] == "x y z w"            # duplicate cut
    assert out[2]["n_kept"] == out[2]["n_tokens"]
    # keep_first=False cuts EVERY holder
    spans_all = dup_spans(docs, gram_words=4, keep_first=False)
    assert {r["doc_id"] for r in spans_all.collect()} == {1, 3}
