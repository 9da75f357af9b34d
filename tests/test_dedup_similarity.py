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
