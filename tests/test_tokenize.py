"""BPE trainer/encoder tests: golden parity against a straight-line
implementation, tie-breaking, early stop, and encode semantics."""

from __future__ import annotations

from collections import Counter

from legislation_scraper_spark.operators.tokenize import (
    bpe_encode,
    bpe_train,
    word_freqs,
)


def _golden_train(freqs: dict[str, int], n_merges: int) -> list[tuple]:
    """Independent straight-line BPE (mirrors scripts/gen_bpe_fixture)."""
    vocab = {tuple(w): f for w, f in freqs.items()}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, a, b, a + b, freq))
        nxt: dict = {}
        for syms, f in vocab.items():
            res: list = []
            for s in syms:
                if res and res[-1] == a and s == b:
                    res[-1] = a + b
                else:
                    res.append(s)
            k = tuple(res)
            nxt[k] = nxt.get(k, 0) + f
        vocab = nxt
    return out


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest"),
    (2, "newest newest newest widest widest"),
    (3, "aaa aa a"),  # overlapping-pair greedy case
]


def test_bpe_train_matches_golden(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    freqs: Counter = Counter()
    for _, t in CORPUS:
        for w in t.split():
            freqs[w] += 1
    want = _golden_train(freqs, 8)
    got = bpe_train(df, n_merges=8)
    assert got == want


def test_bpe_train_early_stop(spark):
    # single-char words only → zero pairs → zero merges, no crash
    df = spark.createDataFrame(
        [(0, "a b c a b")], "doc_id long, text string"
    )
    assert bpe_train(df, n_merges=4) == []


def test_bpe_word_freqs(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["w"]: r["freq"] for r in word_freqs(df).collect()}
    assert got["low"] == 5 and got["newest"] == 6 and got["aaa"] == 1


def test_bpe_encode_roundtrip_and_greedy(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(df, n_merges=8)
    enc = {
        r["id"]: list(r["tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    # lossless: concatenating tokens reproduces the original words
    for i, text in CORPUS:
        assert "".join(enc[i]) == text.replace(" ", "")
    # greedy left-to-right under an (x, x) merge: "aaa" → [xx, x]-shape
    if any(m[1] == m[2] == "a" for m in merges):
        # find doc 3's first word's tokens: aaa splits as aa + a
        toks = enc[3]
        assert toks[0] == "aa" and toks[1] == "a"
    # encoding with NO merges is plain char tokens
    enc0 = {
        r["id"]: list(r["tokens"])
        for r in bpe_encode(df, []).collect()
    }
    assert enc0[0] == list("low" * 5)


def test_bpe_merges_matches_oracle(spark):
    from tests.conftest import SF_SMALL, compare_query

    compare_query(spark, "bpe_merges", SF_SMALL)


def test_bpe_token_counts_equals_encode(spark):
    """The distinct-word factorization returns the same per-doc counts
    as the in-row encode, including 0 for empty documents."""
    from legislation_scraper_spark.operators.tokenize import (
        bpe_token_counts,
    )

    rows = CORPUS + [(9, ""), (10, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=6)
    via_encode = {
        r["id"]: r["n_tokens"] for r in bpe_encode(df, merges).collect()
    }
    via_counts = {
        r["id"]: r["n_tokens"]
        for r in bpe_token_counts(df, merges).collect()
    }
    assert via_counts == via_encode
    assert via_counts[9] == 0 and via_counts[10] == 0


def test_bpe_encode_query_matches_oracle(spark):
    from tests.conftest import SF_SMALL, compare_query

    compare_query(spark, "bpe_encode", SF_SMALL)
