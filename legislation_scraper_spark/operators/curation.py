"""Corpus-curation operators for the training-data pipeline: PII
scrubbing and benchmark-contamination screening.

Neither exists in the reference (its corpus is public legislation and
it ships everything it scrapes, build_dataset.py:204-248); both are
table-stakes for a 100 TB web-text pipeline, so they join the
dedup/quality ladder as first-class, oracle-checked operators.

Scale notes:
- ``scrub_pii`` is pure ``regexp_replace`` / ``regexp_count`` codegen —
  no UDF, no shuffle; it fuses into whatever scan feeds it.
- ``contamination_screen`` explodes corpus docs to n-gram shingles and
  equi-joins them against the benchmark's shingle set.  The benchmark
  side (an eval suite) is tiny relative to the corpus, so its distinct
  shingles BROADCAST; the corpus side is a map-side probe — no
  shuffle of corpus data at any scale.  Results aggregate per doc
  (contaminated gram count), which shuffles only (doc_id, count) pairs.

Regex dialect parity: patterns restricted to the Java-regex ∩ RE2
subset (no backrefs, no lookarounds) so the DuckDB oracles run the
SAME pattern strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import let, word_shingles, words

# pattern, replacement-tag pairs; ORDER MATTERS (CPF before phone —
# a CPF's digit shape must not be half-eaten by the phone pattern)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\d{3}\.\d{3}\.\d{3}-\d{2}", "[CPF]"),
    (r"\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}", "[CNPJ]"),
    (r"\(\d{2}\)\s?\d{4,5}-\d{4}", "[PHONE]"),
)


def scrub_pii(text_col) -> F.Column:
    """Redact emails / CPF / CNPJ / phone numbers to typed tags."""
    out = text_col if isinstance(text_col, F.Column) else F.col(text_col)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text_col) -> list[F.Column]:
    """One redaction-count column per PII class (regexp_count codegen)."""
    col = text_col if isinstance(text_col, F.Column) else F.col(text_col)
    return [
        F.regexp_count(col, F.lit(pat)).alias(
            "n_" + tag.strip("[]").lower()
        )
        for pat, tag in PII_PATTERNS
    ]


def contamination_screen(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag corpus docs sharing ≥1 n-gram with any benchmark doc.

    Returns (doc_id, contaminated_grams, benchmark_hits): number of the
    doc's distinct n-grams found in the benchmark shingle set and how
    many benchmark docs share them.  Docs present in the benchmark
    itself should be excluded by the caller (or join on id inequality
    downstream).  The benchmark's distinct-shingle dim is broadcast —
    corpus rows never shuffle.
    """
    # per-doc dedup happens ROW-SIDE (array_distinct before explode) so
    # the corpus side needs no Exchange — a .distinct() here would
    # shuffle every corpus gram
    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("gram"),
    )
    bench = (
        grams(benchmark)
        .groupBy("gram")
        .agg(F.count("*").alias("bench_docs"))
    )
    return (
        grams(corpus)
        .join(F.broadcast(bench), "gram")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("contaminated_grams"),
            F.sum("bench_docs").cast("bigint").alias("benchmark_hits"),
        )
    )


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals per document, computed IN-ROW.

    Returns ``(id, n_words, distinct_word_frac, top_ngram_frac)`` where
    ``top_ngram_frac`` is the share of the document's word n-grams taken
    by its single most frequent n-gram — the Gopher repetition-removal
    family (Rae et al. 2021 §A1.1: "duplicate n-gram fraction").

    Scale note: the naive plan explodes (doc, gram) pairs and shuffles
    them to count per-doc modes — at 100 TB that is a shuffle of the
    entire tokenized corpus.  Here the mode is computed WITHOUT any
    exchange: sort the in-row gram array, then a sequential
    ``aggregate`` fold finds the longest equal-run (= max frequency).
    Everything stays inside whole-stage codegen; the operator adds zero
    shuffles to whatever scan feeds it.  ``tests/test_curation_ext.py``
    proves it equal to the explode/groupBy twin.
    """
    txt = F.col(text_col)
    ws = words(txt)
    grams_sorted = F.sort_array(word_shingles(txt, n))
    # fold state: (prev gram, current run length, best run length)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(grams_sorted, init, step, lambda acc: acc["best"])
    return df.select(
        F.col(id_col).alias("id"),
        F.size(ws).cast("bigint").alias("n_words"),
        F.round(
            F.size(F.array_distinct(ws))
            / F.nullif(F.size(ws), F.lit(0)).cast("double"),
            6,
        ).alias("distinct_word_frac"),
        F.round(
            top / F.nullif(F.size(grams_sorted), F.lit(0)).cast("double"), 6
        ).alias("top_ngram_frac"),
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Paragraph/chunk-level exact dedup across the corpus.

    Splits each document into consecutive ``chunk_words``-word chunks
    (the stand-in for paragraphs — the synthetic corpus has no newlines)
    and keeps, per distinct chunk text, only the FIRST occurrence in
    ``(id, chunk_idx)`` order.  Returns per-doc
    ``(id, n_chunks, n_kept)`` — the C4/RefinedWeb intra-corpus
    paragraph-dedup step reduced to counts.

    Scale: chunk hashes (16-byte md5, not chunk text) shuffle once on
    the hash — the canonical exact-dedup exchange, identical in shape to
    ``dedup.exact_dedup``.  The survivor is ``min(struct(id, idx))``
    per hash — lexicographic struct min, partial-aggregatable, and
    collision-free at any document size (an arithmetic ``id*K+idx`` key
    would silently collide across docs once idx ≥ K).
    """
    txt = F.col(text_col)

    # words bound ONCE via let: the md5 lambda references the token
    # array per chunk, and an unbound words(txt) re-splits the document
    # PER CHUNK — O(words × chunks) per doc (measured 65.8 s for 63k
    # sf1-scale docs in the round-4 rehearsal; ~4 s bound).  Guard:
    # sequence(0, -1) is DESCENDING in Spark, not empty — an empty
    # document must yield zero chunks, not two.
    def chunks_of(w):
        n_chunks = F.ceil(F.size(w) / F.lit(chunk_words)).cast("int")
        return F.when(
            n_chunks > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.array_join(
                        F.slice(w, i * chunk_words + 1, chunk_words), " "
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    hashes = let(words(txt), chunks_of)
    ch = df.select(
        F.col(id_col).alias("id"), F.posexplode(hashes).alias("idx", "h")
    ).withColumn("skey", F.struct("id", "idx"))
    surv = ch.groupBy("h").agg(F.min("skey").alias("survivor_key"))
    return (
        ch.join(surv, "h")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(
                (F.col("skey") == F.col("survivor_key")).cast("bigint")
            ).alias("n_kept"),
        )
    )


def passage_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/eval prep step.

    Splits each document into whitespace tokens and emits sliding
    windows of ``window`` tokens advancing by ``stride`` (< window →
    consecutive chunks overlap by ``window - stride`` tokens, the
    standard RAG-passage shape).  Coverage is total: the last window
    starts at the final stride step that still reaches the document end
    and is truncated there, so every token lands in ≥ 1 chunk and a
    document of ≤ ``window`` tokens yields exactly one chunk.  Empty
    documents yield zero rows.  Returns
    ``(id, chunk_idx, chunk_text, n_tokens)``.

    Scale: the chunk construction is one in-row chain
    (``split``/``sequence``/``transform``/``slice`` higher-order
    expressions bound via :func:`let` so the document is tokenized once
    per row, not once per chunk) — zero shuffle, zero Python, whole-
    stage codegen.  ``explode`` fans out ~n/stride rows per document
    map-side; downstream embedding/packing stages consume the chunk
    stream without ever reassembling documents, so the operator's
    output partitioning is the input's and the fan-out never forces an
    Exchange.  The reference has no passage layer (its unit of work is
    the whole norm text, base/scraper.py:381-429); this is the
    training/retrieval-pipeline extension over the same corpus.
    """
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    txt = F.col(text_col)

    def chunks_of(w):
        n = F.size(w)
        n_chunks = F.when(n <= window, F.lit(1)).otherwise(
            F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int") + 1
        )
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("int").alias("chunk_idx"),
                    F.array_join(
                        F.slice(w, i * stride + 1, window), " "
                    ).alias("chunk_text"),
                    # arithmetic, not size(slice(...)) — the slice is
                    # already evaluated for chunk_text; a second slice
                    # would re-copy the window per chunk
                    F.least(F.lit(window), n - i * stride)
                    .cast("bigint")
                    .alias("n_tokens"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<chunk_idx:int,chunk_text:string,"
                "n_tokens:bigint>>"
            )
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.explode(let(words(txt), chunks_of)).alias("c"),
    ).select("id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus subset.

    The standard multi-source training mix (e.g. GPT-3/PaLM data
    mixtures): subset s gets probability c_s^alpha / sum(c^alpha),
    where c_s is its size and alpha<1 up-weights small subsets.
    Returns (group, size, weight, oversample = weight / natural share).

    Scale: one partial-aggregatable groupBy; the normalizing constant
    is a scalar broadcast via a cross join of the 1-row total — no
    collect, no second scan of the fact table.
    """
    sizes = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(weight_col).cast("double").alias("size")
    )
    powed = sizes.withColumn("pw", F.pow("size", F.lit(alpha)))
    tot = powed.agg(
        F.sum("pw").alias("z"), F.sum("size").alias("total")
    )
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            F.col("size").cast("bigint").alias("size"),
            F.round(F.col("pw") / F.col("z"), 6).alias("weight"),
            F.round(
                (F.col("pw") / F.col("z")) / (F.col("size") / F.col("total")),
                6,
            ).alias("oversample"),
        )
    )


def _md5_frac6(key, seed: str):
    """First 6 hex chars of md5(key#seed) — a uniform draw over 16^6
    buckets that is identical in Spark and DuckDB (md5 is the one hash
    both engines share), compared LEXICOGRAPHICALLY against hex
    thresholds so no hex→int conversion is needed."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("#" + seed))), 1, 6
    )


def _hex6(frac: float) -> str:
    """Hex threshold for a cumulative fraction (lowercase, 6 digits)."""
    return format(min(int(frac * 16**6), 16**6 - 1), "06x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s0",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash.

    The property that matters at pipeline scale: a document's split
    depends only on (id, seed) — re-running over a regrown corpus
    never migrates an old document across splits (random splits leak
    eval data on every rebuild).  Assignment is a seeded md5 bucket
    against cumulative hex thresholds — pure codegen, no shuffle, no
    sampling pass.
    """
    ch = _md5_frac6(F.col(id_col), seed)
    cum = 0.0
    expr = None
    for name, frac in fractions[:-1]:
        cum += frac
        cond = ch < F.lit(_hex6(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def mixture_sample(
    df: DataFrame,
    weights: DataFrame,
    budget_tokens: float,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: str = "mix0",
) -> DataFrame:
    """Deterministic sampler that makes ``mixture_weights`` actionable:
    group g keeps rate_g = min(1, budget·weight_g / size_g) of its rows
    (so the expected kept token mass follows the temperature mix), each
    row kept iff its seeded md5 draw falls under the group's hex
    threshold — reproducible row-level selection, no RNG state.

    ``weights`` is the (group, size, weight, ...) frame from
    ``mixture_weights`` — its 6dp-ROUNDED weight is used on purpose:
    both engines derive the threshold from the same rounded inputs, so
    the discrete keep/drop cutoff cannot flip on last-ulp differences
    (the repo's floating-aggregate convention).

    Scale: the weights dim is one row per group — broadcast join; the
    keep decision is in-row codegen.  No shuffle of the corpus.
    """
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_tokens)) * F.col("weight") / F.col("size"),
    )
    dim = weights.select(
        F.col(group_col), rate.alias("keep_rate")
    )
    thr = F.lpad(
        F.lower(F.hex((F.col("keep_rate") * F.lit(float(16**6)))
                      .cast("bigint"))),
        6, "0",
    )
    return (
        df.join(F.broadcast(dim), group_col)
        .filter(
            (F.col("keep_rate") >= 1.0)
            | (_md5_frac6(F.col(id_col), seed) < thr)
        )
        .withColumn("keep_rate", F.round("keep_rate", 6))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    token_count_col=None,
    text_col: str = "text",
) -> DataFrame:
    """Greedy concat-then-chunk sequence packing (training prep).

    Documents are concatenated in ``(shard, id)`` order and cut into
    fixed ``seq_len``-token training sequences; a document may span a
    sequence boundary (the standard pretraining packing).  Returns per
    doc: ``(id, shard, n_tokens, start_tok, first_seq, last_seq)``
    where ``start_tok`` is the doc's offset in its shard's token stream
    and sequences are numbered per shard.  Zero-token docs are dropped
    (they occupy no sequence).

    Scale: packing is SHARD-LOCAL by design — a global token order
    would need a corpus-wide sort (total-order exchange), and training
    shards are independent files anyway.  The only exchange is the
    window's hash partition by shard; skewed shards are the caller's
    responsibility (pre-split hot shards, same discipline as the
    politeness salt).
    """
    from pyspark.sql import Window

    toks = (
        token_count_col
        if token_count_col is not None
        else F.size(words(F.col(text_col)))
    )
    # window over the RENAMED projection below (shard/id aliases)
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(shard_col).alias("shard"),
            toks.cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "start_tok",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
    )
    return out.select(
        "id", "shard", "n_tokens", "start_tok",
        F.floor(F.col("start_tok") / seq_len).cast("bigint")
        .alias("first_seq"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
        .cast("bigint").alias("last_seq"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50_000,
    ndigits: int = 6,
) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log10-probability
    per document under the corpus's own add-one-smoothed unigram LM —
    the classic cheap LM filter in webtext curation ladders (documents
    of gibberish / boilerplate / wrong-language text score far below
    the corpus mode; CCNet-style pipelines threshold on exactly this
    statistic, just with a bigger LM).

    Spark-first shape, scale notes:

    - corpus counts: one (word, count) aggregation — partial map-side
      combine, the only full-corpus shuffle;
    - the LM itself is the TOP-``top_k`` words by (count desc, word) —
      ``orderBy().limit()`` compiles to TakeOrderedAndProject (partial
      per-partition top-k, no global sort), and the resulting dim is
      bounded by construction, so the score join BROADCASTS the LM no
      matter how big the corpus vocabulary is.  Out-of-LM words get
      the add-one floor log10(1 / (total + vocab)) — at web scale the
      tail you dropped is exactly the tail a 50k-entry LM models as
      OOV anyway;
    - per-doc mean: explode → broadcast-join → one (doc, sum/count)
      aggregation keyed by the id — second shuffle, rows not text.

    Both corpus statistics (``total`` tokens and ``vocab`` distinct
    words) ride along in the broadcast dim, so no driver collect
    anywhere.  Rounded to ``ndigits`` for cross-engine comparison
    (DuckDB oracle mirrors the same rounding).
    """
    tok = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("ws")
    ).filter(F.size("ws") > 0)
    wcounts = (
        tok.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    stats = wcounts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    lm = (
        wcounts.orderBy(F.desc("cnt"), F.asc("w"))
        .limit(top_k)
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.log10((F.col("cnt") + 1) / (F.col("total") + F.col("vocab")))
            .alias("lp"),
        )
    )
    # the OOV floor is a corpus CONSTANT: 1-row broadcast, never null
    # on join miss (same no-collect pattern as mixture_weights)
    oov = stats.select(
        F.log10(F.lit(1.0) / (F.col("total") + F.col("vocab")))
        .alias("oov_lp")
    )
    return (
        tok.select("id", F.explode("ws").alias("w"))
        .join(F.broadcast(lm), "w", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(
                F.avg(F.coalesce("lp", "oov_lp")), ndigits
            ).alias("mean_logprob"),
        )
    )


def _dup_gram_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    checkpoint: bool,
) -> DataFrame:
    """Shared stage of `dup_span_coverage` / `dup_spans`: one row per
    rolling k-gram occurrence — ``(id, n_tokens, pos, h)`` with ``h``
    the xxhash64 over the gram's k token hashes.  See
    `dup_span_coverage` for the hashing/CSE rationale."""

    def _grams(th):
        # gram hash = xxhash64 over the k token hashes (integer tuple,
        # not a re-joined string): each token is hashed ONCE per doc
        # and each gram hashes k fixed-width bigints — same equality
        # classes as hashing the joined text, ~4x less work
        n = F.size(th)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.xxhash64(
                        *[F.element_at(th, i + j) for j in range(1, k + 1)]
                    ).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))

    # let-bind tokens AND their hash array: Spark does no CSE inside
    # lambda bodies, so unbound they would re-evaluate per gram
    packed = let(
        words(F.col(text_col)),
        lambda ws: F.struct(
            F.size(ws).alias("n"),
            let(
                F.transform(ws, lambda t: F.xxhash64(t)), _grams
            ).alias("grams"),
        ),
    )
    base = df.select(F.col(id_col).alias("id"), packed.alias("p"))
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    return (
        base
        .select(
            "id",
            F.col("p.n").alias("n_tokens"),
            F.explode("p.grams").alias("gr"),
        )
        .select(
            "id", "n_tokens",
            F.col("gr.pos").alias("pos"), F.col("gr.h").alias("h"),
        )
    )


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_words: int = 8,
    checkpoint: bool = True,
) -> DataFrame:
    """Cross-document repeated-span coverage — the ExactSubstr dedup
    signal (Lee et al. 2022, *Deduplicating Training Data Makes
    Language Models Better*) reduced to per-doc interval-union counts.

    A ``gram_words``-word rolling window is "duplicated" when the same
    word sequence occurs in ≥2 DISTINCT documents (within-doc
    repetition is ``repetition_scores``' job).  Per doc the output is
    ``(id, n_tokens, dup_grams, covered_tokens, dup_frac)`` where
    ``covered_tokens`` is the exact union length of all duplicated
    ``[pos, pos+k)`` spans — the fraction of the document a
    remove-duplicate-spans pass would cut.

    Scale shape (three bounded shuffles, no windows, no Python):
    1. gram hashes (8-byte xxhash64, not text — the hash never
       surfaces in output, so it only has to be collision-free, not
       engine-neutral; the oracle's md5 yields identical COUNTS)
       aggregate per hash; "≥2 distinct docs" is decided by
       ``min(id) != max(id)`` — two plain partial-aggregatable
       extrema instead of a two-phase distinct count;
    2. the occurrence rows equi-join the duplicated-hash set on the
       hash — both sides shuffle on a uniform 8-byte key, and a
       boilerplate gram shared by 10^8 docs stays safe: the dup side
       is ONE row per hash, so AQE skew-split replicates it under the
       fat probe partition;
    3. per-doc positions collect and fold IN-ROW (sort_array +
       ``F.aggregate`` running ``cov += min(k, pos - prev)``) — the
       interval union costs zero extra shuffle and no per-doc window.
    Positions are bounded by document length, so the collected array
    is the same order of magnitude as the document itself.

    ``checkpoint`` localCheckpoints the per-doc gram-array frame so the
    dup-set aggregation and the occurrence probe read ONE
    materialization of the (expensive) token/gram hashing instead of
    executing it once per consumer; state is the gram arrays — the
    same order as the token stream, which at cluster scale is the
    standard cache-vs-recompute tradeoff this flag exposes.
    """
    k = gram_words
    g = _dup_gram_occurrences(df, text_col, id_col, k, checkpoint)
    dup = (
        g.groupBy("h")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("h")
    )
    return (
        g.join(dup, "h")
        .groupBy("id")
        .agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("dup_grams"),
            F.sort_array(F.collect_list("pos")).alias("ps"),
        )
        .select(
            "id", "n_tokens", "dup_grams",
            F.aggregate(
                "ps",
                F.struct(
                    F.lit(0).cast("long").alias("cov"),
                    F.lit(-k).cast("int").alias("last"),
                ),
                lambda acc, p: F.struct(
                    (acc["cov"] + F.least(F.lit(k), p - acc["last"]))
                    .alias("cov"),
                    p.alias("last"),
                ),
                lambda acc: acc["cov"],
            ).alias("covered_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("covered_tokens") / F.col("n_tokens"), 6),
        )
    )


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_words: int = 8,
    keep_first: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Cross-document duplicated-gram SPANS — the interval-evidence
    twin of `dup_span_coverage`, shaped for `excise_spans`: one row
    per duplicated k-gram occurrence, ``(doc_id, start_tok,
    end_tok)`` with ``end_tok = start_tok + gram_words`` (0-based
    half-open).

    ``keep_first`` (default, the Lee et al. 2022 ExactSubstr
    discipline: CUT duplicates, keep one copy) suppresses spans in
    each gram's canonical holder — the min-id document — so excision
    removes every copy but one instead of erasing the content from
    the corpus entirely.

    Scale shape: identical to `dup_span_coverage` steps 1–2 (gram
    agg + hash-keyed occurrence join, AQE-safe under boilerplate
    skew) with NO per-doc collect at all — the raw occurrence rows
    ARE the output, and `excise_spans`' own per-doc collect_list is
    bounded by document length.  Overlapping spans need no merging:
    excision cuts a token iff ANY span covers it.
    """
    k = gram_words
    g = _dup_gram_occurrences(df, text_col, id_col, k, checkpoint)
    dup = (
        g.groupBy("h")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("h", "lo")
    )
    j = g.join(dup, "h")
    if keep_first:
        j = j.filter(F.col("id") != F.col("lo"))
    return j.select(
        F.col("id").alias(id_col),
        F.col("pos").cast("long").alias("start_tok"),
        (F.col("pos") + k).cast("long").alias("end_tok"),
    )


def gopher_quality_verdict(
    docs: DataFrame,
    text_col: str = "text",
    lang: str = "pt",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style hard quality rules (Rae et al. 2021 §A1.1) as ONE
    codegen projection: per-document stats + a ``keep`` verdict.

    Rules (defaults = the published thresholds):
    word count in [min_words, max_words]; mean word length in
    [min_mean_wl, max_mean_wl]; symbol-to-word ratio (``#`` and
    ellipsis) ≤ max_symbol_ratio; ≤ max_bullet_frac of lines start
    with a bullet; ≤ max_ellipsis_frac of lines end with an ellipsis;
    ≥ min_alpha_frac of words contain a letter; ≥ min_stop_hits
    DISTINCT stopwords of the target language present (the "stop word"
    sanity rule).

    All stats are per-row string algebra (split / filter / aggregate
    over in-row arrays) — NO shuffle, NO Python; the operator fuses
    into the scan that feeds it and scales linearly with input bytes.
    Ratios are exact rational values computed identically by the
    DuckDB oracle (no cross-row float accumulation), rounded to 6dp
    for display only AFTER the comparisons.
    """
    t = F.col(text_col)
    w = words(t)
    wl = F.lower(t)
    w_lower = words(wl)
    n_words = F.size(w)
    nw_d = n_words.cast("double")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            w, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        ).cast("double")
        / nw_d,
    ).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t)
        - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ell).cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("•")
                | x.startswith("-")
                | x.startswith("*"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda x: x.endswith("...") | x.endswith("…"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / nw_d,
    ).otherwise(F.lit(0.0))
    from ..functions.text import LANG_STOPWORDS

    stop_hits = sum(
        (
            F.array_contains(w_lower, s).cast("int")
            for s in LANG_STOPWORDS[lang]
        ),
        start=F.lit(0),
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_wl)
        & (mean_wl <= max_mean_wl)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return docs.select(
        *docs.columns,
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        keep.alias("keep"),
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Exact corpus-wide top-``k`` most frequent word ``n``-grams —
    the boilerplate/template discovery report every corpus audit runs
    (the heavy hitters are navigation chrome, legal disclaimers, and
    licence blurbs; their doc-frequency feeds stop-gram lists for the
    repetition filters).

    Plan shape / scale: explode → ONE (gram, count) hash aggregation —
    map-side combine absorbs the Zipf head (each partition emits one
    partial row per distinct gram it saw, and the heavy hitters are by
    definition the best-combining keys) — then ``orderBy().limit(k)``
    = TakeOrderedAndProject (per-partition partial top-k before the
    single-partition merge; the full gram vocabulary is never globally
    sorted).  Deterministic tie-break: (count desc, gram asc).
    """
    grams = docs.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


def dsir_weights(
    df: DataFrame,
    target: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
    ndigits: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-n-gram bag is under a TARGET
    distribution (the data you want more of) than under the RAW corpus
    distribution — ``weight = Σ_f log p_target(f) − log p_raw(f)`` over
    the doc's unigram+bigram features hashed into a fixed bucket space.
    Downstream, docs are resampled ∝ exp(weight); this operator emits
    the log-weights, the part that touches the corpus.

    The reference ships everything it scrapes (build_dataset.py:
    204-248); targeted selection is table-stakes for a 100 TB pipeline
    feeding a fixed token budget, so this joins the curation ladder as
    a first-class oracled operator.

    Spark-first shape, scale notes:

    - the feature space is FIXED at ``16^bucket_hex_chars`` buckets
      (default 256): bucket id = first hex chars of ``md5(feature)``,
      the one hash both engines share, so the oracle reproduces it
      byte-for-byte.  DSIR's own implementation uses exactly this
      hashing trick (2^16 buckets) — the point is that both LMs are
      O(buckets), never O(vocab);
    - ONE exploded pass feeds everything: token occurrences collapse
      to per-doc bucket counts ``(id, bucket, n)`` — map-side combine
      bounds each doc's contribution at ≤256 rows BEFORE the only
      corpus-wide shuffle — and that frame is materialized once
      (``localCheckpoint``, the encode-once discipline from the
      Jaccard/span operators) because both consumers below read it;
    - BOTH LMs come from a second, tiny aggregation of the bucket
      counts (≤256 keys; a conditional sum splits target from raw);
      totals ride a 1-row broadcast crossJoin (house pattern — no
      driver collect), add-one smoothing over the fixed bucket count;
    - per-doc weights: bucket counts → BROADCAST log-ratio dim (≤256
      rows, broadcastable at any corpus size) → one (id, sum)
      aggregation of already-partitioned rows.

    Docs with no tokens are dropped (same contract as
    ``unigram_logprob_scores``).  ``target`` is any boolean Column over
    the input row (e.g. ``F.col("lang") == "en"``); at the north-star
    tier it would be a membership flag joined from a curated seed set.
    """
    n_buckets = 16**bucket_hex_chars
    feats = df.select(
        F.col(id_col).alias("id"),
        target.alias("tgt"),
        F.concat(
            words(F.col(text_col)), word_shingles(F.col(text_col), 2)
        ).alias("fs"),
    ).filter(F.size("fs") > 0)
    # hash in-row (transform) so only 2-char bucket ids cross the
    # explode, never the feature strings; collapse occurrences to
    # per-doc bucket counts in the same pass (map-side combine)
    db = (
        feats.select(
            "id",
            "tgt",
            F.explode(
                F.transform(
                    "fs",
                    lambda f: F.substring(F.md5(f), 1, bucket_hex_chars),
                )
            ).alias("b"),
        )
        .groupBy("id", "tgt", "b")
        .agg(F.count("*").alias("n"))
    )
    if checkpoint:
        db = db.localCheckpoint(eager=False)
    bc = db.groupBy("b").agg(
        F.sum("n").alias("raw_cnt"),
        F.sum(F.when(F.col("tgt"), F.col("n")).otherwise(0)).alias(
            "tgt_cnt"
        ),
    )
    st = bc.agg(
        F.sum("raw_cnt").cast("double").alias("total_raw"),
        F.sum("tgt_cnt").cast("double").alias("total_tgt"),
    )
    lm = bc.crossJoin(F.broadcast(st)).select(
        "b",
        (
            F.log10(
                (F.col("tgt_cnt") + 1)
                / (F.col("total_tgt") + F.lit(n_buckets))
            )
            - F.log10(
                (F.col("raw_cnt") + 1)
                / (F.col("total_raw") + F.lit(n_buckets))
            )
        ).alias("lr"),
    )
    return (
        db.join(F.broadcast(lm), "b")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.round(F.sum(F.col("n") * F.col("lr")), ndigits).alias(
                "weight"
            ),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top_k: int = 50_000,
    ndigits: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """CCNet-style head/middle/tail quality tiers: per language, rank
    documents by their LM score (here the ``unigram_logprob_scores``
    perplexity proxy) and split into terciles — ``head`` = the
    best-scoring third, the tier CCNet keeps outright; ``tail`` = the
    third its ladder drops or routes to heavier filtering.

    Spark-first shape, scale notes — the naive formulation is
    ``ntile(3) OVER (PARTITION BY lang ORDER BY score)``, which at web
    scale funnels EVERY doc of a language through one reducer (a
    handful of giant partitions = the worst skew shape there is).
    Instead the terciles come from a bounded histogram, the same
    discipline as ``sketches.histogram_quantiles``:

    - scores round to 3dp → ``groupBy(lang, s3)`` bin counts — the
      dim is ≤ langs × O(1000) rows no matter the corpus size;
    - cumulative counts (best-first) and per-lang totals via windows
      over that TINY dim (single-partition warnings do not apply —
      the frame is bounded by construction);
    - a bin's tier is decided by its cumulative count against
      ``ceil(N/3)`` / ``ceil(2N/3)`` — deterministic, no mid-bin
      splits, identical arithmetic in the DuckDB oracle;
    - docs pick up their tier through a BROADCAST join on
      ``(lang, s3)`` — the corpus never sorts and never skew-shuffles;
    - the scored frame feeds BOTH the tier histogram and the final
      join, so it is materialized once (``localCheckpoint`` — the
      encode-once discipline); without it the whole tokenize + LM +
      per-doc scoring chain would execute twice per call.
    """
    from pyspark.sql import Window

    scores = unigram_logprob_scores(
        df, text_col=text_col, id_col=id_col, top_k=top_k,
        ndigits=ndigits,
    ).join(
        df.select(
            F.col(id_col).alias("id"), F.col(lang_col).alias("lang")
        ),
        "id",
    )
    if checkpoint:
        scores = scores.localCheckpoint(eager=False)
    bins = scores.select(
        "lang", F.round(F.col("mean_logprob"), 3).alias("s3")
    ).groupBy("lang", "s3").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("lang").orderBy(F.desc("s3"))
    w_all = Window.partitionBy("lang")
    tiers = bins.select(
        "lang",
        "s3",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    ).select(
        "lang",
        "s3",
        F.when(
            F.col("cum") <= F.ceil(F.col("n") / F.lit(3.0)), "head"
        )
        .when(
            F.col("cum") <= F.ceil(F.lit(2.0) * F.col("n") / F.lit(3.0)),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )
    return (
        scores.withColumn("s3", F.round(F.col("mean_logprob"), 3))
        .join(F.broadcast(tiers), ["lang", "s3"])
        .select("id", "lang", "n_words", "mean_logprob", "bucket")
    )


# ---------------------------------------------------------------------------
# C4-style line-level page cleaning (Raffel et al. 2020, JMLR 21 §2.2)
# ---------------------------------------------------------------------------

#: a retained line must end in a terminal punctuation mark (period,
#: exclamation, question mark, or closing quotation mark) — C4 rule 1
C4_TERMINAL_RE = '[.!?"”]$'
#: minimum words for a line to be retained — C4 rule ("at least 5 words")
C4_MIN_WORDS_PER_LINE = 5
#: minimum retained lines for the page to survive (C4 drops pages with
#: fewer than 3 sentences; retained-line count is the deterministic
#: cross-engine proxy for the paper's nltk sentence count)
C4_MIN_LINES = 3
#: page-level kill markers — C4 drops pages containing curly braces
#: (code) or the lorem-ipsum placeholder; the paper's "bad words" list
#: is descoped (no vendored list in this environment)
C4_PAGE_KILL = ("lorem ipsum", "{")


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 cleaning pass: line-level retention rules plus page-level
    kill rules, exactly the heuristics of Raffel et al. 2020 §2.2
    (the C4 corpus build) restated as a deterministic cross-engine
    spec.  Per page: split on newlines, whitespace-normalize each
    line, retain lines that (a) end in terminal punctuation, (b) have
    ≥ 5 words, (c) do not contain the word "javascript"
    (case-insensitive); drop the whole page when it mentions
    "lorem ipsum" or contains ``{``, or when fewer than 3 lines
    survive.

    Returns ``(id_col, kept, n_lines_kept, clean_text)`` —
    ``clean_text`` is the retained lines re-joined with newlines, NULL
    for dropped pages.

    Scale/plan: the whole pass is ONE in-row higher-order chain
    (``split`` → ``transform`` → ``filter`` → ``array_join``) — zero
    shuffle, zero Python, fuses into the scan that feeds it.  At
    100 TB this is a map-only stage whose cost is the scan itself.
    The regex lives in the Java∩RE2 dialect so the DuckDB oracle runs
    the same pattern.
    """
    text = F.col(text_col)

    def keep_line(line):
        ws = F.filter(F.split(line, " "), lambda w: w != F.lit(""))
        return (
            F.regexp_like(line, F.lit(C4_TERMINAL_RE))
            & (F.size(ws) >= C4_MIN_WORDS_PER_LINE)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    lines = F.transform(
        F.split(text, "\n"),
        lambda l: F.trim(F.regexp_replace(l, r"\s+", " ")),
    )
    page_bad = F.contains(F.lower(text), F.lit(C4_PAGE_KILL[0])) | F.contains(
        text, F.lit(C4_PAGE_KILL[1])
    )
    bound = let(
        F.filter(lines, keep_line),
        lambda kept: F.struct(
            (~page_bad & (F.size(kept) >= C4_MIN_LINES)).alias("kept"),
            F.size(kept).alias("n_lines_kept"),
            F.when(
                ~page_bad & (F.size(kept) >= C4_MIN_LINES),
                F.array_join(kept, "\n"),
            ).alias("clean_text"),
        ),
    )
    return df.select(F.col(id_col), bound.alias("_c4")).select(
        id_col, "_c4.kept", "_c4.n_lines_kept", "_c4.clean_text"
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    ndigits: int = 6,
) -> DataFrame:
    """Top bigram collocations by pointwise mutual information — the
    classic phrase-discovery statistic (Church & Hanks 1990) used in
    webtext pipelines to mine multi-word expressions for tokenizer
    vocab seeding and boilerplate phrase detection.

    ``PMI(a,b) = log10( p(ab) / (p(a)·p(b)) )`` with ``p(ab)`` over
    the corpus bigram total and ``p(·)`` over the unigram total, both
    computed from the SAME document set (docs with ≥2 tokens, so the
    two denominators describe one population).

    Scale shape:
    - one (bigram, count) aggregation and one (word, count)
      aggregation — both partial-aggregatable map-side, the corpus's
      only full shuffles;
    - ``min_count`` prunes the bigram tail BEFORE any join (Zipf makes
      the surviving set orders of magnitude smaller than the corpus);
    - unigram counts attach via two equi-joins on the word key —
      uniform 8-byte-ish keys, AQE-splittable, never a broadcast of
      an unbounded vocabulary;
    - corpus totals ride a 1-row broadcast crossJoin (no collect);
    - final top-``top_k`` is ``orderBy().limit()`` —
      TakeOrderedAndProject, per-partition partial top-k, no global
      sort.  Ordering ties break on (w1, w2) over the ROUNDED pmi so
      the cut is engine-stable.
    """
    tok = df.select(words(F.col(text_col)).alias("ws")).filter(
        F.size("ws") >= 2
    )
    uni = (
        tok.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    bigrams = F.filter(
        F.zip_with(
            F.col("ws"),
            F.slice(F.col("ws"), F.lit(2), F.size("ws")),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    big = (
        tok.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    totals = tok.agg(
        F.sum(F.size("ws")).cast("double").alias("n_uni"),
        F.sum(F.size("ws") - 1).cast("double").alias("n_big"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    pmi = F.round(
        F.log10(
            (F.col("n_pair") / F.col("n_big"))
            / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
        ),
        ndigits,
    )
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
    ndigits: int = 6,
) -> DataFrame:
    """Mean bigram log10-probability per document under the corpus's
    own add-one-smoothed bigram LM — the next rung above
    ``unigram_logprob_scores`` on the CCNet-style perplexity-filter
    ladder (a bigram model separates scrambled-word gibberish from
    prose that a unigram model scores identically).

    Per in-doc bigram ``(a,b)``:
    ``lp = log10( (c(ab)+1) / (c_LM(a) + V) )`` where ``c(ab)`` is the
    count in the top-``top_k`` bigram LM (0 on miss), ``c_LM(a)`` the
    count in the top-``top_k`` unigram context dim (0 on miss), and
    ``V`` the full corpus vocabulary size.  Unconditional add-one
    smoothing keeps the score total and branch-free, so both engines
    evaluate the identical expression.

    Scale: both LM dims are TOP-K BY CONSTRUCTION
    (TakeOrderedAndProject, deterministic (count desc, key) cut), so
    they broadcast no matter the corpus size; V and the bigram total
    ride the same 1-row-broadcast pattern as
    ``unigram_logprob_scores``.  Shuffles: the two count aggregations
    plus the final per-doc mean — rows, never text.
    """
    tok = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("ws")
    ).filter(F.size("ws") >= 2)
    uni = (
        tok.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("vocab"))
    ctx = (
        uni.orderBy(F.desc("cw"), "w")
        .limit(top_k)
        .select(F.col("w").alias("w1"), F.col("cw").alias("c_ctx"))
    )
    bigrams = F.filter(
        F.zip_with(
            F.col("ws"),
            F.slice(F.col("ws"), F.lit(2), F.size("ws")),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    occ = tok.select("id", F.explode(bigrams).alias("bg")).select(
        "id", "bg.w1", "bg.w2"
    )
    lm = (
        occ.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .orderBy(F.desc("c_ab"), "w1", "w2")
        .limit(top_k)
    )
    lp = F.log10(
        (F.coalesce("c_ab", F.lit(0)) + 1)
        / (F.coalesce("c_ctx", F.lit(0)) + F.col("vocab"))
    )
    return (
        occ.join(F.broadcast(lm), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), ndigits).alias("mean_logprob"),
        )
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_ranks: int = 100,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Zipf rank-frequency fit: least-squares slope of
    ``ln(count) ~ ln(rank)`` over the top ``top_ranks`` words — the
    corpus-health diagnostic (natural prose sits near slope −1;
    machine-generated spam and template farms bend the curve) used to
    triage web sources before expensive curation.

    Determinism across engines: the regression folds IN-ROW over the
    rank-sorted (rank, ln count) array — ``F.aggregate`` left-to-right
    in Spark, list-ordered ``list_aggregate('sum')`` in the oracle —
    so float accumulation order is identical, not
    aggregation-schedule-dependent.

    Scale: one (group, word) count shuffle; the per-group top-k rank
    is a row_number + filter (map-side WindowGroupLimit — each
    partition keeps ≤ ``top_ranks`` rows before the exchange); the
    collected array is ≤ ``top_ranks`` structs per group — bounded by
    construction, never corpus-sized.
    """
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .groupBy("grp", "w")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), "w")
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_ranks
    )
    pts = ranked.groupBy("grp").agg(
        F.array_sort(
            F.collect_list(F.struct("rank", F.log("cnt").alias("y")))
        ).alias("pts")
    )

    def _fsum(expr_fn):
        return lambda arr: F.aggregate(
            arr, F.lit(0.0), lambda acc, s: acc + expr_fn(s)
        )

    n = F.size("pts").cast("double")
    sx = _fsum(lambda s: F.log(s["rank"]))(F.col("pts"))
    sy = _fsum(lambda s: s["y"])(F.col("pts"))
    sxy = _fsum(lambda s: F.log(s["rank"]) * s["y"])(F.col("pts"))
    sxx = _fsum(lambda s: F.log(s["rank"]) * F.log(s["rank"]))(F.col("pts"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pts.select(
        F.col("grp").alias(group_col),
        n.cast("int").alias("n_ranks"),
        F.round(slope, ndigits).alias("slope"),
        F.round((sy - slope * sx) / n, ndigits).alias("intercept"),
    )


def kn_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
    discount: float = 0.75,
    ndigits: int = 6,
) -> DataFrame:
    """Mean bigram log10-probability per document under an
    interpolated Kneser-Ney LM (Kneser & Ney, ICASSP'95; the smoothing
    KenLM ships and the CCNet filter actually uses) trained on the
    corpus itself — the top rung of the n-gram perplexity-filter
    ladder above :func:`bigram_logprob_scores`'s add-one model.
    KN's continuation probability scores a word by HOW MANY contexts
    it follows, not how often, so boilerplate tokens that are frequent
    in one template stop dominating the backoff distribution.

    Per in-doc bigram ``(a, b)`` with the standard interpolated form::

        P(b|a) = max(c(ab) - D, 0)/c(a) + D·N1+(a·)/c(a) · Pcont(b)
        Pcont(b) = (N1+(·b) + 1) / (N_types + V)        # add-one guard
        P(b|a) = Pcont(b)                                when c(a) = 0

    where the type counts ``N1+`` are taken over the top-``top_k``
    bigram LM (pruned-LM semantics, same cut as the other LM dims:
    count desc then key), ``c(a)`` over the top-``top_k`` unigram
    context dim, ``V`` the full vocabulary size, and ``D`` the
    absolute discount.  The +1/+V guard on ``Pcont`` keeps the score
    total for words outside the pruned LM; ``N1+(a·)`` is floored at 1
    so a context present in the unigram dim but absent from the pruned
    bigram table still reserves backoff mass.  Every branch is the
    same CASE in both engines — no engine-private fallback.

    Scale: identical exchange set to ``bigram_logprob_scores`` (two
    count shuffles + the per-doc mean); the KN extras — continuation
    and fertility type counts — are aggregations OVER THE top-k LM
    (≤ ``top_k`` rows), so they stay broadcast-sized by construction
    no matter the corpus.
    """
    tok = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("ws")
    ).filter(F.size("ws") >= 2)
    uni = (
        tok.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("vocab"))
    ctx = (
        uni.orderBy(F.desc("cw"), "w")
        .limit(top_k)
        .select(F.col("w").alias("w1"), F.col("cw").alias("c_ctx"))
    )
    bigrams = F.filter(
        F.zip_with(
            F.col("ws"),
            F.slice(F.col("ws"), F.lit(2), F.size("ws")),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    occ = tok.select("id", F.explode(bigrams).alias("bg")).select(
        "id", "bg.w1", "bg.w2"
    )
    lm = (
        occ.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .orderBy(F.desc("c_ab"), "w1", "w2")
        .limit(top_k)
        .localCheckpoint(eager=False)
    )
    # type counts over the pruned LM — bounded by top_k rows
    fert = lm.groupBy("w1").agg(F.count("*").alias("n_cont"))
    cont = lm.groupBy("w2").agg(F.count("*").alias("n_ctx"))
    ntypes = lm.agg(F.count("*").cast("double").alias("n_types"))
    pcont = (F.coalesce("n_ctx", F.lit(0)) + 1) / (
        F.col("n_types") + F.col("vocab")
    )
    c_a = F.coalesce("c_ctx", F.lit(0)).cast("double")
    p_kn = F.when(
        c_a > 0,
        F.greatest(
            F.coalesce("c_ab", F.lit(0)).cast("double") - F.lit(discount),
            F.lit(0.0),
        )
        / c_a
        + F.lit(discount)
        * F.greatest(F.coalesce("n_cont", F.lit(0)), F.lit(1)).cast("double")
        / c_a
        * pcont,
    ).otherwise(pcont)
    return (
        occ.join(F.broadcast(lm), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(fert), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(ntypes))
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log10(p_kn)), ndigits).alias("mean_logprob"),
        )
    )


def wilson_host_quality(
    df: DataFrame,
    verdict_col: str,
    group_col: str = "source",
    z: float = 1.959963984540054,
    ndigits: int = 6,
) -> DataFrame:
    """Per-host quality score as the Wilson lower confidence bound on
    the fraction of documents passing a quality gate — the host-level
    filtering stage of RefinedWeb/C4-style pipelines, where a host
    with 3/3 good pages must NOT outrank one with 950/1000 (a raw
    ratio does exactly that; the Wilson bound shrinks small-sample
    hosts toward zero).  Downstream, hosts under a bound threshold get
    their crawl budget cut or their documents dropped wholesale —
    cheaper than per-document classification for spam farms.

    ``wilson_low = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1+z²/n)``
    with ``z`` the normal quantile (default 97.5% → 95% two-sided).
    The expression is the same closed form in both engines — doubles
    throughout, one sqrt, rounded at the end.

    Scale: ONE conditional-count aggregation keyed by the group column
    (partial map-side combine; rows out = distinct hosts); the bound
    is in-row algebra on the aggregated frame.  No joins, no second
    exchange.
    """
    agg = df.groupBy(F.col(group_col).alias("host")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col(verdict_col), 1).otherwise(0))
        .cast("double")
        .alias("pos"),
    )
    p = F.col("pos") / F.col("n")
    n = F.col("n")
    z2 = z * z
    low = (
        p
        + F.lit(z2) / (2 * n)
        - F.lit(z) * F.sqrt(p * (1 - p) / n + F.lit(z2) / (4 * n * n))
    ) / (1 + F.lit(z2) / n)
    return agg.select(
        "host",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("pos").cast("bigint").alias("n_good"),
        F.round(p, ndigits).alias("rate"),
        F.round(low, ndigits).alias("wilson_low"),
    )


def mad_outlier_report(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
    z_cut: float = 3.5,
    ndigits: int = 6,
) -> DataFrame:
    """Robust per-group outlier report via median/MAD z-scores.

    Mean/stddev outlier cuts self-destruct on web text (the outliers
    drag the mean); the modified z-score 0.6745·(x−med)/MAD (Iglewicz
    & Hoaglin) keeps a 50% breakdown point, so one mega-document per
    host cannot hide its siblings.  The |z| > 3.5 cut is their
    recommended default.

    Plan: two exact-percentile aggs keyed on the group (median, then
    MAD over the re-joined deviations) + one counting agg; the
    per-group medians are tiny dims, so both re-joins broadcast.
    Groups where MAD = 0 (>50% identical values) report 0 outliers
    rather than dividing by zero.  Returns
    (group, n_docs, med, mad, n_outliers).
    """
    vals = df.select(F.col(group_col).alias("grp"), value.alias("v"))
    med = vals.groupBy("grp").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    dev = vals.join(F.broadcast(med), "grp").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    mad = dev.groupBy("grp").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    z = F.when(
        F.col("mad") > 0, 0.6745 * F.col("d") / F.col("mad")
    ).otherwise(F.lit(0.0))
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp", "med", "mad")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(z > z_cut, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.round("med", ndigits).alias("med"),
            F.round("mad", ndigits).alias("mad"),
            "n_outliers",
        )
    )


def dedup_aware_split(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_splits: int = 10,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Train/eval split that keeps near-duplicate CLUSTERS together.

    Hashing each doc independently into splits leaks: a held-out doc's
    near-duplicate twin lands in train, and the eval set silently
    measures memorization (the benchmark-contamination failure mode
    `contamination_screen` guards against — except self-inflicted by
    the split).  The fix every careful corpus pipeline ships: split by
    the CONNECTED COMPONENT of the near-dup graph (minhash/simhash
    pairs → `dedup.connected_components_star`), so every member of a
    cluster lands on the same side by construction.  Docs with no
    near-dup edge are their own singleton component.

    Split assignment is the engine-neutral md5 fold used across the
    repo (first 4 hex chars mod ``n_splits``) — deterministic across
    engines, sessions, and cluster sizes.  Plan: the O(log n) CC, one
    left join to attach components, in-row hash — the join is the only
    added exchange.

    Returns ``(id, component, split)``.
    """
    from .dedup import connected_components_star

    cc = connected_components_star(
        edges.select(F.col(a_col).alias("a_id"), F.col(b_col).alias("b_id"))
    ).select(F.col("id").alias("_n"), F.col("comp").alias("_c"))
    d = docs.select(F.col(id_col).alias("id"))
    out = (
        d.join(cc, d["id"] == cc["_n"], "left")
        .select(
            "id",
            F.coalesce("_c", F.col("id")).alias("component"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("component").cast("string")), 1, 4),
               16, 10).cast("int") % n_splits
    )
    return out.withColumn("split", bucket)


def quantile_gate(
    scored: DataFrame,
    keep_frac: float,
    group_col: str = "lang",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of docs PER GROUP by score — the
    FineWeb/DCLM curation shape ("top 10% by classifier score, per
    language").  A single global threshold over-prunes low-resource
    groups (their score distribution sits lower than English's, an
    artifact of classifier calibration, not quality) — the per-group
    quantile is the standard fix.

    Determinism: the cut uses ``percent_rank`` over (score DESC, id
    ASC) — exact, tie-stable, engine-neutral — NOT an approximate
    quantile sketch, so the same doc set survives on any engine or
    partitioning.  percent_rank ≤ f keeps ⌈f·(n−1)⌉+1 docs per group
    (both engines define it as (rank−1)/(n−1)).

    Plan: ONE window exchange on the group key.  Skew note: groups are
    languages/sources (10²-10³ of them) with heavy mass on a few; at
    100 TB the window sort spills per group — if a single group
    outgrows a partition's spill budget, pre-aggregate a per-group
    exact threshold via a two-pass rank instead (same result, same
    discipline as politeness.rank_per_host_range).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= keep_frac)
        .drop("pr")
    )


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut token spans out of documents — the REMOVAL half of
    ExactSubstr dedup (Lee et al. 2022 cut duplicated spans, not whole
    docs) and of contamination handling (excise the benchmark overlap,
    keep the document).  `dup_span_coverage` and
    `contamination_screen` produce the evidence; this operator applies
    it.

    ``spans``: ``(id, start_tok, end_tok)`` rows, 0-based token
    half-open intervals — unsorted and OVERLAPPING spans are fine (a
    token is cut iff ANY span covers it, which is exactly interval
    union without computing one).  Docs with no spans pass through
    unchanged.

    Plan: one spans groupBy (collect_list — spans per doc are a
    handful of merged dup regions, bounded), one left join to docs,
    then a pure in-row token filter (`F.exists` over the span array
    per position — no explode, no window).  Output ``(id, n_tokens,
    n_kept, text)`` with ``text`` rebuilt from the kept tokens.
    """
    sp = (
        spans.groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("start_tok").alias("s"),
                    F.col("end_tok").alias("e"),
                )
            ).alias("_spans")
        )
    )
    d = docs.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("ws")
    )
    empty = F.array().cast("array<struct<s:bigint,e:bigint>>")
    joined = d.join(sp, d["id"] == sp["_id"], "left").select(
        "id",
        "ws",
        F.coalesce(
            F.col("_spans").cast("array<struct<s:bigint,e:bigint>>"),
            empty,
        ).alias("spans"),
    )
    # empty-doc guard: sequence(0, -1) would DESCEND ([0, -1]) and the
    # element_at below would hit index 0 (ANSI hard error)
    idx = F.when(
        F.size("ws") > 0, F.sequence(F.lit(0), F.size("ws") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept_idx = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("spans"),
            lambda sp_: (i >= sp_["s"]) & (i < sp_["e"]),
        ),
    )
    return joined.select(
        "id",
        F.size("ws").cast("bigint").alias("n_tokens"),
        F.size(kept_idx).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                kept_idx, lambda i: F.element_at(F.col("ws"), i + 1)
            ),
            " ",
        ).alias("text"),
    )
