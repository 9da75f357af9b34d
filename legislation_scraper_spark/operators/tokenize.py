"""Byte-pair-encoding tokenizer training/encoding — the learned half
of the tokenization surface (``functions/text.token_count_bpe_ish`` is
the fixed-regex half).

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"): start from characters, repeatedly merge the
most frequent adjacent symbol pair.  The reference repo ships corpora
TO tokenizer training (its HF dataset push, base/scraper.py S20 path);
a 100 TB pipeline trains the tokenizer itself, so the trainer is a
first-class corpus operator here.

Spark-first shape — the classic BPE-trainer factorization:

* ONE corpus pass builds the ``(word, freq)`` table (groupBy over
  whitespace tokens).  Every subsequent iteration runs over DISTINCT
  WORDS weighted by freq, never over the corpus again — vocabulary
  grows sublinearly with corpus size (Heaps' law), so the iterative
  loop's input is orders of magnitude smaller than the input table
  and independent of document count.
* Each iteration: adjacent-pair counts via an in-row
  ``transform(sequence(...))`` explode (map-side partial agg), the
  argmax via ``orderBy().limit(1)`` (TakeOrderedAndProject — no full
  sort, no single-partition window), then an in-row greedy merge fold
  (``aggregate``) over each word's symbol array.
* ``localCheckpoint`` per iteration truncates the 2-jobs-per-round
  lineage (same discipline as graph.pagerank / dedup CC).
* Encoding is embarrassingly parallel: the learned merge list is a
  tiny literal array folded over each word in-row — zero shuffle,
  no Python.

Determinism: pair-count ties break lexicographically on (left,
right), so the merge sequence is a pure function of the corpus.

No end-of-word marker symbol: merges never cross word boundaries
because symbols live inside per-word arrays (the marker in the paper
exists to make detokenization unambiguous, which a corpus-statistics
trainer does not need; document-level detokenization here rejoins on
the whitespace the pre-tokenizer split on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words

#: split a string into its characters: a boundary at every position
#: that is not the start AND has a character after it — Spark's split
#: uses Java limit=-1 semantics (trailing empties KEPT), so a bare
#: (?!^) would emit a trailing "" symbol per word
_CHAR_SPLIT = r"(?!^)(?=.)"


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) pairs in a
    symbol array — the in-row rewrite applied after each merge pick.
    A just-merged token is the accumulator's last element, so "aaa"
    under (a,a) folds to [aa, a], never [a, aa] or [aaa]."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(lit_l, lit_r)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus pass: distinct whitespace words with corpus
    frequencies — the trainer's working set."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    ``[(rank, left, right, merged, freq), ...]`` in merge order, where
    ``freq`` is the pair's corpus count at selection time.  Stops
    early when no adjacent pair remains.

    The returned merge list is the MODEL — a few dozen rows — so
    returning it driver-side is the bounded-artifact pattern
    (classifier weights, mixture weights), not a corpus collect.
    """
    spark = df.sparkSession
    vocab = word_freqs(df, text_col).select(
        F.split(F.col("w"), _CHAR_SPLIT).alias("syms"), "freq"
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # guard: sequence(1, 0) is DESCENDING in Spark, not empty — a
        # single-symbol word must yield zero pairs (cf. chunk_dedup)
        pair_idx = F.when(
            F.size("syms") > 1,
            F.sequence(F.lit(1), F.size("syms") - 1),
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            vocab.select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + F.lit(1)).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("total"))
        )
        best = (
            pairs.orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, total = best[0]["a"], best[0]["b"], int(best[0]["total"])
        merges.append((rank, a, b, a + b, total))
        nxt = vocab.select(
            _merge_fold(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document,
    ``(id, tokens array<string>, n_tokens)``.  The merge list is a
    literal array folded over each word in-row — zero shuffle,
    corpus-parallel.  The nested fold is interpreted (HOFs don't
    whole-stage-codegen) and runs per word OCCURRENCE, so when only
    counts are needed use :func:`bpe_token_counts` (distinct-word
    factorization — ~8× faster measured at sf0.1).

    ``merges`` accepts either trainer output tuples
    ``(rank, left, right, ...)`` or bare ``(left, right)`` pairs,
    applied in the given order (= rank order from ``bpe_train``).
    """
    pairs = [
        (m[1], m[2]) if len(m) >= 3 else (m[0], m[1]) for m in merges
    ]

    def encode_word(w):
        syms = F.split(w, _CHAR_SPLIT)
        for left, right in pairs:
            syms = _merge_fold(syms, left, right)
        return syms

    return df.select(
        F.col(id_col).alias("id"),
        F.flatten(
            F.transform(words(F.col(text_col)), encode_word)
        ).alias("tokens"),
    ).select(
        "id", "tokens", F.size("tokens").cast("bigint").alias("n_tokens")
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document token counts under a learned merge list —
    ``(id, n_tokens)`` — via the distinct-word factorization: the
    (interpreted, nested-HOF) merge fold runs ONCE PER DISTINCT WORD,
    not once per occurrence, then a word→token-length dim joins back
    onto the exploded corpus.  Measured 16.5 s → ~2 s at sf0.1 vs
    folding in-row per occurrence (``bpe_encode``), because corpus
    tokens outnumber vocabulary words by orders of magnitude and the
    fold cannot whole-stage-codegen.

    ``broadcast_vocab=True`` (default) broadcasts the encoded-vocab
    dim — right whenever the vocabulary fits the broadcast threshold
    (Heaps' law keeps it sublinear in corpus size).  At extreme vocab
    (100 TB, multilingual) pass False and let AQE pick the join; the
    explode side then shuffles on the word key.
    """
    pairs = [
        (m[1], m[2]) if len(m) >= 3 else (m[0], m[1]) for m in merges
    ]

    def encode_word(w):
        syms = F.split(w, _CHAR_SPLIT)
        for left, right in pairs:
            syms = _merge_fold(syms, left, right)
        return syms

    occurrences = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("w"),
    )
    enc = (
        occurrences.select("w")
        .distinct()
        .select(
            "w", F.size(encode_word(F.col("w"))).cast("bigint").alias("tl")
        )
    )
    if broadcast_vocab:
        enc = F.broadcast(enc)
    counted = (
        occurrences.join(enc, "w")
        .groupBy("id")
        .agg(F.sum("tl").alias("n_tokens"))
    )
    # empty documents have no occurrence rows — restore them with 0
    return (
        df.select(F.col(id_col).alias("id"))
        .join(counted, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
        )
    )


def fertility_stats(
    token_counts: DataFrame,
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    ndigits: int = 6,
) -> DataFrame:
    """Tokenizer fertility by group (chars emitted per token): the
    standard multilingual-tokenizer health metric — a BPE vocabulary
    trained lopsidedly makes under-served languages pay more tokens
    per character, which shows up here before it shows up in training
    cost.  ``token_counts`` is ``bpe_token_counts`` output
    ``(id, n_tokens)``; ``docs`` supplies the grouping column and the
    character counts.

    Scale: one equi-join on the doc id (both sides one row per doc)
    and one small-cardinality aggregation — rows, never text.
    """
    joined = token_counts.select(
        F.col("id").alias(id_col), "n_tokens"
    ).join(docs.select(id_col, group_col, chars_col), id_col)
    return joined.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum(chars_col).alias("sum_chars"),
        F.round(
            F.sum(chars_col).cast("double") / F.sum("n_tokens"),
            ndigits,
        ).alias("chars_per_token"),
    )
