"""Webtext curation extensions: repetition scores (in-row fold),
chunk-level corpus dedup, and link-graph degree/PageRank operators."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.curation import (
    chunk_dedup,
    repetition_scores,
)
from legislation_scraper_spark.operators.graph import degrees, pagerank

DOCS = [
    (0, "a b a b a b"),            # top bigram "a b" x3 of 5
    (1, "x"),                      # single word: no bigrams
    (2, ""),                       # empty
    (3, "w w w w"),                # all same
    (4, "p q r s t u v"),          # all distinct
    (5, "a b a b a b"),            # duplicate of doc 0
]


def _py_repetition(text: str, n: int = 2):
    ws = text.split()
    grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    nd = len(set(ws)) / len(ws) if ws else None
    top = max(Counter(grams).values()) / len(grams) if grams else None
    rnd = lambda v: round(v, 6) if v is not None else None  # noqa: E731
    return len(ws), rnd(nd), rnd(top)


def test_repetition_fold_matches_straight_line(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: (r["n_words"], r["distinct_word_frac"], r["top_ngram_frac"])
        for r in repetition_scores(df).collect()
    }
    for i, text in DOCS:
        assert got[i] == _py_repetition(text), (i, text)


def test_repetition_fold_matches_explode_twin(spark):
    """The zero-shuffle fold must equal the canonical explode/groupBy
    plan on real corpus text."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fold = {
        r["id"]: r["top_ngram_frac"]
        for r in repetition_scores(d).collect()
    }
    from legislation_scraper_spark.functions.text import word_shingles

    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("g")
    )
    twin = (
        grams.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(
            F.round(F.max("count") / F.sum("count"), 6).alias("t")
        )
    )
    for r in twin.collect():
        assert fold[r["doc_id"]] == r["t"]


def test_repetition_plan_has_no_exchange(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = repetition_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_dedup_survivors(spark):
    rows = [
        (0, " ".join(["w%d" % i for i in range(25)])),   # 3 chunks
        (1, " ".join(["w%d" % i for i in range(10)])),   # dup of doc0 chunk0
        (2, ""),                                          # empty: no chunks
        (3, " ".join(["w%d" % i for i in range(10)])),   # dup of doc0+doc1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_chunks"], r["n_kept"])
        for r in chunk_dedup(df, chunk_words=10).collect()
    }
    assert got[0] == (3, 3)        # first occurrence keeps everything
    assert got[1] == (1, 0)        # chunk already owned by doc 0
    assert 2 not in got            # empty doc yields no chunk rows
    assert got[3] == (1, 0)


def _py_pagerank(edges, iters=2, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    od = Counter(s for s, _ in edges)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = defaultdict(float)
        for s, t in edges:
            contrib[t] += rank[s] / od[s]
        rank = {v: (1 - d) / n + d * contrib.get(v, 0.0) for v in nodes}
    return rank


def test_degrees_and_pagerank_match_straight_line(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    deg = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degrees(df).collect()}
    assert deg == {"a": (3, 1), "b": (1, 2), "c": (1, 2)}
    pr = {r["node"]: round(r["rank"], 9) for r in pagerank(df, iters=2).collect()}
    expect = {v: round(r, 9) for v, r in _py_pagerank(edges).items()}
    assert pr == expect
    # probability mass is conserved (no dangling nodes in this graph)
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_pack_sequences_boundaries(spark):
    from legislation_scraper_spark.operators.curation import pack_sequences

    rows = [
        (0, "s", " ".join(["w"] * 6)),   # tokens 0-5   → seq 0
        (1, "s", " ".join(["w"] * 6)),   # tokens 6-11  → seq 0..1 (spans)
        (2, "s", ""),                     # zero tokens → dropped
        (3, "s", " ".join(["w"] * 4)),   # tokens 12-15 → seq 1
        (4, "t", " ".join(["w"] * 9)),   # other shard restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["id"]: (r["start_tok"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(df, seq_len=8).collect()
    }
    assert got == {
        0: (0, 0, 0),
        1: (6, 0, 1),
        3: (12, 1, 1),
        4: (0, 0, 1),
    }
    assert 2 not in got


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=2).collect() == []
    assert degrees(empty).collect() == []


def test_dup_span_coverage_interval_union(spark):
    from legislation_scraper_spark.operators.curation import (
        dup_span_coverage,
    )

    shared = "a b c d"  # one shared 4-gram
    rows = [
        # docs 0/1 share the gram at pos 0 → covered = 4 of 6 tokens
        (0, shared + " x y"),
        (1, shared + " p q"),
        # doc 2: two occurrences of the shared gram at pos 0 and 5 —
        # disjoint spans union to 8 of 9 tokens
        (2, shared + " z " + shared),
        # doc 3: grams "a b a b", "b a b c", "a b c d", "b c d e" —
        # only pos 2 matches docs 0/1, one span covering 4 of 7 tokens
        (3, "a b a b c d e"),
        # doc 4: within-doc-only repetition — its gram never appears in
        # another doc, so it must NOT be counted
        (4, "r s t u r s t u"),
        # doc 5: shorter than the gram window → no rows
        (5, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (
            r["n_tokens"], r["dup_grams"], r["covered_tokens"],
            r["dup_frac"],
        )
        for r in dup_span_coverage(df, gram_words=4).collect()
    }
    assert got[0] == (6, 1, 4, round(4 / 6, 6))
    assert got[1] == (6, 1, 4, round(4 / 6, 6))
    assert got[2] == (9, 2, 8, round(8 / 9, 6))
    assert got[3] == (7, 1, 4, round(4 / 7, 6))
    assert 4 not in got          # within-doc repetition ignored
    assert 5 not in got          # too short for one gram


def test_host_overlap_pairs_modes_and_cap(spark):
    from legislation_scraper_spark.operators.dedup import (
        host_overlap_pairs,
    )

    rows = [
        (0, "h1", "the quick brown fox jumps"),
        (1, "h2", "the quick brown fox jumps"),   # full mirror of doc 0
        (2, "h3", "the quick brown fox sleeps"),  # shares a 4-gram only
        (3, "h4", "totally different text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # whole-doc mode: only the strict mirror pair survives
    full = {
        (r["host_a"], r["host_b"]): r["shared"]
        for r in host_overlap_pairs(df, gram_words=None).collect()
    }
    assert full == {("h1", "h2"): 1}
    # gram mode: h3 joins via the shared "the quick brown fox" 4-gram
    gram = {
        (r["host_a"], r["host_b"]): r["shared"]
        for r in host_overlap_pairs(df, gram_words=4).collect()
    }
    assert gram[("h1", "h2")] == 2          # both rolling 4-grams match
    assert gram[("h1", "h3")] == 1 and gram[("h2", "h3")] == 1
    assert not any("h4" in p for p in gram)
    # degenerate-key cap: "the quick brown fox" spans 3 hosts and is
    # dropped at max_hosts=2; only the 2-host gram pair survives
    capped = {
        (r["host_a"], r["host_b"]): r["shared"]
        for r in host_overlap_pairs(df, gram_words=4, max_hosts=2).collect()
    }
    assert capped == {("h1", "h2"): 1}


def _py_hits(edges, iters=2):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    auth = {v: 1.0 for v in nodes}
    hub = {v: 1.0 for v in nodes}
    for _ in range(iters):
        a = defaultdict(float)
        for s, t in edges:
            a[t] += hub[s]
        ta = sum(a.values())
        auth = {v: a.get(v, 0.0) / ta for v in nodes}
        h = defaultdict(float)
        for s, t in edges:
            h[s] += auth[t]
        th = sum(h.values())
        hub = {v: h.get(v, 0.0) / th for v in nodes}
    return auth, hub


def test_hits_matches_straight_line(spark):
    from legislation_scraper_spark.operators.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (round(r["auth"], 9), round(r["hub"], 9))
        for r in hits(df, iters=2).collect()
    }
    ea, eh = _py_hits(edges)
    assert got == {v: (round(ea[v], 9), round(eh[v], 9)) for v in ea}
    # L1 normalization: each score vector sums to 1
    assert abs(sum(a for a, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in got.values()) - 1.0) < 1e-9


def test_hits_empty_edges(spark):
    from legislation_scraper_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty, iters=2).collect() == []


def test_salted_index_equals_one_phase(spark):
    from legislation_scraper_spark.operators.index import (
        inverted_index,
        inverted_index_salted,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one = {
        r["term"]: (r["df_count"], r["postings"])
        for r in inverted_index(d, max_postings=8).collect()
    }
    two = {
        r["term"]: (r["df_count"], r["postings"])
        for r in inverted_index_salted(
            d, max_postings=8, n_salts=4
        ).collect()
    }
    assert one == two


def test_unigram_logprob_scores_orders_quality(spark):
    """Common-word docs must outscore rare/OOV-word docs under the
    corpus's own unigram LM; the OOV floor applies to words outside
    the top-k."""
    import math

    from legislation_scraper_spark.operators.curation import (
        unigram_logprob_scores,
    )

    rows = [(i, "lei norma artigo lei norma lei") for i in range(8)]
    rows += [(100, "zzq xxw yyk qqz"), (101, "lei norma artigo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_words"], r["mean_logprob"])
        for r in unigram_logprob_scores(df, top_k=3).collect()
    }
    assert got[101][0] == 3
    # common-word doc beats the OOV doc
    assert got[101][1] > got[100][1]
    # doc 100 is entirely OOV (top_k=3 keeps lei/norma/artigo):
    # every word scores the add-one floor log10(1/(total+vocab))
    total = 8 * 6 + 4 + 3
    vocab = 3 + 4
    floor = round(math.log10(1.0 / (total + vocab)), 6)
    assert abs(got[100][1] - floor) < 1e-6


def test_hash_split_stable_and_proportional(spark):
    from legislation_scraper_spark.operators.curation import hash_split

    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b  # deterministic
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in set(a.values())}
    assert abs(frac["train"] - 0.98) < 0.01
    assert abs(frac["val"] - 0.01) < 0.005
    assert abs(frac["test"] - 0.01) < 0.005
    # a different seed reshuffles membership but keeps proportions
    c = {r["doc_id"]: r["split"]
         for r in hash_split(df, seed="other").collect()}
    assert c != a
    # growing the corpus never migrates an existing id (rebuild-proof)
    grown = spark.range(0, 40000).withColumnRenamed("id", "doc_id")
    g = {r["doc_id"]: r["split"] for r in hash_split(grown).collect()}
    assert all(g[k] == v for k, v in a.items())


def test_hash_split_no_shuffle(spark):
    from legislation_scraper_spark.operators.curation import hash_split
    from tests.test_plans import _explain

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    assert "Exchange" not in _explain(hash_split(df))


def test_mixture_sample_rates_and_determinism(spark):
    from legislation_scraper_spark.operators.curation import (
        mixture_sample,
        mixture_weights,
    )

    rows = [(i, "big", 100) for i in range(3000)] + [
        (10000 + i, "small", 100) for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int"
    )
    w = mixture_weights(df, group_col="source", alpha=0.7)
    out = mixture_sample(
        df.select("doc_id", "source"), w, budget_tokens=60000
    )
    got = out.collect()
    assert got == mixture_sample(
        df.select("doc_id", "source"), w, budget_tokens=60000
    ).collect()  # deterministic, no RNG state
    by_src = {}
    rates = {}
    for r in got:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
        rates[r["source"]] = r["keep_rate"]
    # alpha<1 up-weights the small source: its keep rate must exceed
    # the big source's
    assert rates["small"] > rates["big"]
    assert all(0 < v <= 1 for v in rates.values())
    # kept counts track rate*n within binomial noise
    assert abs(by_src["big"] / 3000 - rates["big"]) < 0.05
    assert abs(by_src["small"] / 300 - rates["small"]) < 0.10


def test_mixture_sample_broadcasts_weights(spark):
    from legislation_scraper_spark.operators.curation import (
        mixture_sample,
        mixture_weights,
    )
    from tests.test_plans import _explain

    df = spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, source string, n_tokens int"
    )
    w = mixture_weights(df, group_col="source")
    plan = _explain(mixture_sample(df.select("doc_id", "source"), w, 100))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_gopher_verdict_rule_by_rule(spark):
    from legislation_scraper_spark.operators.curation import (
        gopher_quality_verdict,
    )

    good = "uma lei de qualidade " * 15  # 60 words, stopwords present
    rows = [
        (1, good),
        (2, "de da do"),  # too few words
        (3, ("a " * 60) + good),  # mean word length dragged under 3
        (4, good + " ###### " * 20),  # symbol ratio blown by #
        (5, "\n".join("• item de uma lista que tem" for _ in range(20))),
        (6, "\n".join("uma linha que continua..." for _ in range(20))),
        (7, ("123 456 789 " * 20) + "de e"),  # alpha fraction too low
        (8, "wordy " * 60),  # no stopwords at all
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (
            r["keep"], r["n_words"], r["stop_hits"], r["bullet_frac"],
        )
        for r in gopher_quality_verdict(df, lang="pt").collect()
    }
    assert got[1][0] is True
    assert got[2][0] is False and got[2][1] < 50
    assert got[3][0] is False  # mean word len < 3
    assert got[4][0] is False  # symbol ratio
    assert got[5][0] is False and got[5][3] == 1.0  # all lines bulleted
    assert got[6][0] is False  # ellipsis lines
    assert got[7][0] is False  # alpha fraction
    assert got[8][0] is False and got[8][2] == 0  # stopword rule


def test_gopher_verdict_is_shuffle_free(spark):
    from legislation_scraper_spark.operators.curation import (
        gopher_quality_verdict,
    )

    df = spark.createDataFrame([(1, "texto de uma lei")],
                               "doc_id int, text string")
    plan = (
        gopher_quality_verdict(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_top_ngrams_counts_and_partial_topk_plan(spark):
    from legislation_scraper_spark.operators.curation import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),       # "a b c" x2, "b c a", "c a b"
            (2, "a b c d"),           # "a b c", "b c d"
            (3, "x y"),               # too short → no grams
        ],
        "doc_id int, text string",
    )
    df = top_ngrams(docs, n=3, k=3)
    got = [(r["gram"], r["cnt"]) for r in df.collect()]
    assert got == [("a b c", 3), ("b c a", 1), ("b c d", 1)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_weights_favor_target_distribution(spark):
    """Docs drawn from the target distribution must get higher
    importance weights than docs from the off-target distribution,
    and a mixed doc lands between them."""
    from legislation_scraper_spark.operators.curation import dsir_weights

    tgt = "lei norma artigo decreto lei norma"
    off = "zzq xxw yyk qqz zzq xxw"
    rows = [(i, tgt, "en") for i in range(6)]
    rows += [(10 + i, off, "de") for i in range(6)]
    rows += [(99, tgt + " " + off, "de")]  # mixed, off-target flag
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["id"]: (r["n_feats"], r["weight"])
        for r in dsir_weights(df, target=F.col("lang") == "en").collect()
    }
    # unigrams (6) + bigrams (5) per pure doc
    assert got[0][0] == 11
    assert got[0][1] > got[99][1] > got[10][1]
    # pure target docs score positive, pure off-target negative
    assert got[0][1] > 0 > got[10][1]


def test_dsir_weights_broadcast_lm_plan(spark):
    """The log-ratio dim must broadcast — the corpus side never
    shuffles for the scoring join."""
    from legislation_scraper_spark.operators.curation import dsir_weights

    df = spark.createDataFrame(
        [(1, "lei norma", "en"), (2, "zzq xxw", "de")],
        "doc_id long, text string, lang string",
    )
    plan = (
        dsir_weights(df, target=F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_perplexity_buckets_tercile_order(spark):
    """Within each language every head doc outscores every middle doc,
    which outscores every tail doc; tier sizes honor the ceil(N/3)
    cumulative cuts on the rounded-score grid."""
    from legislation_scraper_spark.operators.curation import (
        perplexity_buckets,
    )

    # 9 docs in one lang with strictly decreasing quality: common
    # words repeated i times vs OOV filler
    rows = []
    for i in range(9):
        text = " ".join(["lei norma artigo"] * (9 - i) + [f"zq{i}w"] * (i + 1))
        rows.append((i, text, "pt"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df, top_k=3).collect()
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["mean_logprob"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert len(by_bucket["head"]) == 3
    assert len(by_bucket["middle"]) == 3
    assert len(by_bucket["tail"]) == 3
    assert min(by_bucket["head"]) > max(by_bucket["middle"])
    assert min(by_bucket["middle"]) > max(by_bucket["tail"])


def test_passage_chunks_semantics(spark):
    """Window/stride math: ≤window → one chunk; total coverage with the
    last chunk truncated at the doc end; fixed overlap between
    consecutive chunks; empty docs yield zero rows."""
    from legislation_scraper_spark.operators.curation import passage_chunks

    toks = [f"t{i}" for i in range(23)]
    rows = [
        (0, ""),                      # empty → no chunks
        (1, "  \n\t "),               # whitespace-only → no chunks
        (2, " ".join(toks[:8])),      # n == window → 1 chunk
        (3, " ".join(toks[:9])),      # n == window+1 → 2 chunks
        (4, " ".join(toks)),          # 23 tokens → starts 0,5,10,15
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = passage_chunks(df, window=8, stride=5)
    got = defaultdict(list)
    for r in out.collect():
        got[r["id"]].append((r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    for v in got.values():
        v.sort()
    assert 0 not in got and 1 not in got
    assert got[2] == [(0, " ".join(toks[:8]), 8)]
    assert [c[0] for c in got[3]] == [0, 1]
    assert got[3][1] == (1, " ".join(toks[5:9]), 4)  # truncated tail
    # 23 tokens, window 8, stride 5 → ceil((23-8)/5)+1 = 4 chunks
    chunks4 = got[4]
    assert [c[0] for c in chunks4] == [0, 1, 2, 3]
    for idx, text, n in chunks4:
        lo = idx * 5
        want = toks[lo:lo + 8]
        assert text.split(" ") == want and n == len(want)
    # consecutive chunks overlap by window - stride = 3 tokens
    for a, b in zip(chunks4, chunks4[1:]):
        assert a[1].split(" ")[-3:] == b[1].split(" ")[:3]
    # coverage: union of chunk tokens == the document
    covered = set()
    for _, text, _ in chunks4:
        covered.update(text.split(" "))
    assert covered == set(toks)


def test_passage_chunks_matches_oracle(spark):
    from tests.conftest import SF_SMALL, compare_query

    compare_query(spark, "passage_chunks", SF_SMALL)
