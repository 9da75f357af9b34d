"""Library tests: dedup ladder, similarity tiers, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from legislation_scraper_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    dup = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    near = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(" fim extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    return d.unionByName(dup).unionByName(near).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_removes_copies(docs):
    n_all = docs.count()
    out = dedup.exact_dedup(docs)
    assert out.count() == n_all - 50  # 50 exact copies injected
    # survivor is the min id
    assert out.filter(F.col("doc_id") >= 10000).filter(
        F.col("doc_id") < 20000
    ).count() == 0


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    # every exact copy pair must be found (identical signatures)
    for base in range(0, 500, 10):
        assert (base, base + 10000) in got, f"missed exact dup {base}"
    # most near-dups (2 extra tokens) should be found too
    near_found = sum(1 for a, b in got if b >= 20000 and b - 20000 == a)
    assert near_found >= 30  # out of 50, LSH recall is probabilistic


def test_minhash_edges_same_components_linear_size(docs):
    """minhash_lsh_edges clusters identically to the full pair
    expansion — per LSH bucket, member→bucket-min star edges reach the
    same connected components — while emitting at most as many edges
    as pairs (linear vs quadratic in bucket size: the 8.19M-URL
    rehearsal measured 331.6M pairs where the star path needs ~8M)."""
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket=1 << 31).cache()
    edges = dedup.minhash_lsh_edges(docs).cache()
    n_pairs, n_edges = pairs.count(), edges.count()
    assert 0 < n_edges <= n_pairs
    comp_pairs = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_star(pairs).collect()
    }
    comp_edges = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_star(edges).collect()
    }
    assert comp_pairs == comp_edges
    pairs.unpersist()
    edges.unpersist()


def test_simhash_pairs_hamming(docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=2)
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in pairs.collect()}
    for base in range(0, 500, 10):
        assert got.get((base, base + 10000)) == 0, f"missed exact dup {base}"


def test_ngram_jaccard_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs, block_cols=["source"], threshold=0.9
    )
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    for base in range(0, 500, 10):
        assert (base, base + 10000) in got
    # jaccard of exact copy pairs is exactly 1.0
    ones = pairs.filter(F.col("b_id") - 10000 == F.col("a_id"))
    assert ones.filter(F.col("jaccard") < 1.0).count() == 0
    assert ones.count() == 50


def test_embedding_cosine_pairs_selfdup(spark, emb):
    dup = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    pairs = dedup.embedding_cosine_pairs(both, threshold=0.999)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    for i in range(20):
        assert (i, i + 1000) in got


def test_lsh_topk_approximates_bruteforce(emb):
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    exact = similarity.brute_force_topk(q, c, k=5)
    approx = similarity.lsh_topk(q, c, k=5, bits=4, multiprobe=1)
    ex = {(r["qid"], r["cid"]) for r in exact.collect()}
    ap = {(r["qid"], r["cid"]) for r in approx.collect()}
    # recall@5 ≥ 40% with 4-bit buckets + multiprobe on random vectors
    assert len(ex & ap) >= 0.4 * len(ex)


def test_ivf_topk_recall(emb):
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    exact = similarity.brute_force_topk(q, c, k=5)
    ivf = similarity.ivf_topk(q, c, k=5, n_cells=8, nprobe=4)
    ex = {(r["qid"], r["cid"]) for r in exact.collect()}
    iv = {(r["qid"], r["cid"]) for r in ivf.collect()}
    assert len(ex & iv) >= 0.5 * len(ex)
    # full probe == exact
    full = similarity.ivf_topk(q, c, k=5, n_cells=8, nprobe=8)
    fu = {(r["qid"], r["cid"]) for r in full.collect()}
    assert fu == ex


def test_ngram_jaccard_paths_identical(spark):
    """Bitset and hash physical paths must produce identical pairs
    (same (a, b, jaccard) sets) on a corpus whose vocab fits both."""
    rows = [
        (1, "g", "um dois tres quatro cinco"),
        (2, "g", "um dois tres quatro cinco"),
        (3, "g", "um dois tres quatro seis"),
        (4, "g", "sete oito nove dez onze"),
        (5, "h", "um dois tres quatro cinco"),
        (6, "h", "um dois tres quatro"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def pairs(max_bits):
        out = dedup.ngram_jaccard_pairs(
            df, ["source"], threshold=0.5, max_bitset_bits=max_bits
        )
        return {
            (r["a_id"], r["b_id"], round(r["jaccard"], 9))
            for r in out.collect()
        }

    bitset, hashed = pairs(512), pairs(0)
    assert bitset == hashed
    assert (1, 2, 1.0) in bitset


def test_star_cc_equals_propagation(spark):
    """large-star/small-star labels == min-label propagation labels on
    a multi-component graph with chains, triangles and a hub."""
    edges = (
        [(i, i + 1) for i in range(0, 9)]            # chain 0..9
        + [(20, 21), (21, 22), (22, 20)]             # triangle
        + [(30, j) for j in range(31, 40)]           # star hub
        + [(50, 51)]                                  # pair
    )
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    prop = {
        (r["id"], r["comp"])
        for r in dedup.connected_components(df).collect()
    }
    star = {
        (r["id"], r["comp"])
        for r in dedup.connected_components_star(df).collect()
    }
    assert prop == star
    assert (9, 0) in star and (22, 20) in star and (39, 30) in star


def test_star_cc_long_chain_converges_logarithmically(spark):
    """The adversarial case propagation can't handle: a 256-node chain
    must converge in ≤ log2(n) + 4 star rounds (propagation needs 255)
    with every node labeled 0."""
    import math

    n = 256
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    labels, rounds = dedup.connected_components_star(
        df, return_rounds=True
    )
    assert rounds <= int(math.log2(n)) + 4, rounds
    got = {(r["id"], r["comp"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}


def test_multimodal_plumbing(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (3, b"RIFF" + b"z" * 80),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = multimodal.attach_media_meta(df)
    got = {r["doc_id"]: (r["media_type"], r["format"]) for r in meta.collect()}
    assert got[1] == ("image", "png")
    assert got[2] == ("image", "jpeg")
    assert got[3] == ("audio", "wav")

    feats = multimodal.decode_and_featurize(df).collect()
    assert len(feats) == 3  # null payload dropped
    for r in feats:
        assert len(r["feature"]) == 3
        assert len(r["thumb"]) == 8 * 8 * 3
    # determinism
    feats2 = multimodal.decode_and_featurize(df).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, feats2))

    frames = multimodal.sample_frames(df.filter(F.col("doc_id") == 1))
    assert frames.count() == 10
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(df, decode_stub=False)


def test_simhash_pairs_capped_and_join_free(spark):
    from legislation_scraper_spark.operators.dedup import simhash_pairs

    # identical docs pair at hamming 0; the unrelated doc pairs with
    # nothing under a tight budget
    df = spark.createDataFrame(
        [
            (1, "lei de ajuste fiscal do estado"),
            (2, "lei de ajuste fiscal do estado"),
            (3, "zzz completamente diferente qqq www eee rrr"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_pairs(df, max_hamming=3).collect()
    }
    assert got.get((1, 2)) == 0
    assert all(3 not in k for k in got)
    # saturated buckets are DROPPED by the cap: with max_bucket=1 no
    # bucket may pair anything
    assert simhash_pairs(df, max_hamming=3, max_bucket=1).collect() == []
    # plan shape: no self-join — the only join-like node is none; the
    # pipeline is groupBy + explode of the in-array expansion
    plan = (
        simhash_pairs(df, max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_semantic_dedup_keeps_earliest_and_drops_chain(spark):
    """SemDeDup survivor rule: earliest doc of every near-dup pair is
    kept; on a transitive chain a~b, b~c, a!~c BOTH b and c drop
    (order-free rule, documented as more aggressive than greedy)."""
    import math

    from legislation_scraper_spark.operators.dedup import semantic_dedup

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 6

    # cos(25 deg) ~ 0.906 >= 0.9; cos(50 deg) ~ 0.643 < 0.9; all
    # components non-negative -> one sign bucket
    rows = [(1, vec(0)), (2, vec(25)), (3, vec(50)), (9, vec(120))]
    # vec(120) has a negative x component -> different bucket, no pairs
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["id"]: r["kept"]
        for r in semantic_dedup(df, threshold=0.9).collect()
    }
    assert got == {1: True, 2: False, 3: False, 9: True}


def test_recall_at_k_fractions(spark):
    """recall_at_k: exact arm == approx arm → 1.0; empty approx → 0.0;
    partial overlap → hits/k; queries absent from approx score 0."""
    import math

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 6

    corpus = spark.createDataFrame(
        [(10, vec(5)), (11, vec(10)), (12, vec(15)), (13, vec(80))],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, vec(0)), (1, vec(90))],
        "vec_id long, embedding array<double>",
    )
    # exact top-2 for q0: cids 10, 11; for q1: 13, 12
    perfect = similarity.brute_force_topk(queries, corpus, k=2)
    got = {
        r["qid"]: r["recall"]
        for r in similarity.recall_at_k(
            queries, corpus, perfect, k=2
        ).collect()
    }
    assert got == {0: 1.0, 1: 1.0}
    # approx hits one of two for q0, nothing for q1
    partial = spark.createDataFrame(
        [(0, 11)], "qid long, cid long"
    )
    got = {
        r["qid"]: r["recall"]
        for r in similarity.recall_at_k(
            queries, corpus, partial, k=2
        ).collect()
    }
    assert got == {0: 0.5, 1: 0.0}


def test_ann_recall_matches_oracle(spark):
    from tests.conftest import SF_SMALL, compare_query

    compare_query(spark, "ann_recall", SF_SMALL)


def test_quantize_int8_codes_bounded_and_zero_safe(spark):
    rows = [
        (1, [1.0, -2.0, 0.5, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-0.003, 0.001, 0.002, -0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in similarity.quantize_int8(df).collect()}
    for r in out.values():
        assert all(-127 <= c <= 127 for c in r["codes"])
    assert out[1]["codes"][3] == 127  # max element hits full scale
    assert out[2]["codes"] == [0, 0, 0, 0] and out[2]["scale"] == 0.0
    # tiny magnitudes still spread across the int range
    assert out[3]["codes"][0] == -127


def test_quantized_topk_matches_exact_ranking(spark, emb):
    """int8 cosine ranking ≈ exact float ranking: recall@5 ≥ 0.9 over
    the fixture embeddings (64-dim, well-separated)."""
    q = emb.filter(F.col("vec_id") < 20)
    c = emb.filter(F.col("vec_id") >= 20)
    approx = similarity.quantized_topk(q, c, k=5)
    rec = similarity.recall_at_k(q, c, approx, k=5)
    mean_rec = rec.agg(F.avg("recall")).first()[0]
    assert mean_rec >= 0.9, mean_rec


def test_quantized_topk_zero_norm_scores_zero(spark):
    rows = [(0, [1.0, 0.0])]
    qdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cdf = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.quantized_topk(qdf, cdf, k=2).collect()
    ranks = {r["cid"]: r["rnk"] for r in out}
    assert ranks[11] == 1 and ranks[10] == 2  # zero vector ranks last
