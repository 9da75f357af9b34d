"""Inverted-index build — the retrieval-side companion of the corpus
analytics (term → capped posting list + document frequency).

Not in the reference (it ships raw documents), but any
dataset-exploration or search layer over a 100 TB corpus needs postings.

Scale notes:
- Per-doc dedup is ROW-SIDE (``array_distinct`` before explode — same
  discipline as contamination_screen), so the exchange carries one
  (term, doc_id) pair per distinct term occurrence, with map-side
  partial aggregation.
- Posting lists are CAPPED at ``max_postings`` (stop-words would
  otherwise build single-key arrays the size of the corpus); the true
  document frequency is kept alongside so the cap loses no statistics.
  The cap is applied after ``sort_array`` for deterministic content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 64,
) -> DataFrame:
    """term → (df_count, postings array capped+sorted, postings_md5).

    ``postings_md5`` (md5 over the comma-joined capped list) gives a
    scalar fingerprint of the list content for cheap cross-engine
    comparison and downstream change detection.
    """
    pairs = df.select(
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("term"),
        F.col(id_col).alias("id"),
    )
    agg = pairs.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df_count"),
        F.slice(
            F.sort_array(F.collect_list("id")), 1, max_postings
        ).alias("postings"),
    )
    return agg.select(
        "term",
        "df_count",
        "postings",
        F.md5(F.concat_ws(",", F.col("postings"))).alias("postings_md5"),
    )


def merge_indexes(
    base: DataFrame, delta: DataFrame, max_postings: int = 64
) -> DataFrame:
    """Merge two (term, df_count, postings) indexes — the incremental
    maintenance step (nightly delta folded into the base index, same
    discipline as the seen-filter delta log).

    Correctness property (tested + oracle-checked): because each input
    keeps the ``max_postings`` SMALLEST ids per term, the merged capped
    list equals the capped list of a full rebuild — the global k
    smallest elements always lie within the union of each side's k
    smallest (min-k merge).  ``df_count`` adds exactly (inputs must
    partition the corpus).

    Scale: one full-outer equi-join on term; posting arrays are ≤
    2·max_postings long during the merge — bounded memory per row no
    matter the corpus.
    """
    b = base.select(
        "term",
        F.col("df_count").alias("b_df"),
        F.col("postings").alias("b_p"),
    )
    d = delta.select(
        "term",
        F.col("df_count").alias("d_df"),
        F.col("postings").alias("d_p"),
    )
    empty = F.array().cast("array<bigint>")
    merged = b.join(d, "term", "full_outer").select(
        "term",
        (
            F.coalesce("b_df", F.lit(0)) + F.coalesce("d_df", F.lit(0))
        ).cast("bigint").alias("df_count"),
        F.slice(
            F.sort_array(
                F.concat(
                    F.coalesce(F.col("b_p"), empty),
                    F.coalesce(F.col("d_p"), empty),
                )
            ),
            1,
            max_postings,
        ).alias("postings"),
    )
    return merged.select(
        "term", "df_count", "postings",
        F.md5(F.concat_ws(",", F.col("postings"))).alias("postings_md5"),
    )


def inverted_index_salted(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof two-phase inverted index.

    The one-phase build funnels EVERY (term, id) pair of a hot term
    (stopwords hit ~all docs) into a single reducer before the cap —
    the classic straggler at corpus scale.  Here phase 1 aggregates per
    ``(term, salt)`` — each hot term's pairs spread over ``n_salts``
    reducers, each keeping only its k smallest ids + a count — and
    phase 2 merges the ≤ ``n_salts`` bounded partials per term.  The
    min-k merge property (see :func:`merge_indexes`) makes the result
    EXACTLY equal to the one-phase build; phase-2 rows are bounded by
    ``n_salts × max_postings`` ids per term regardless of corpus size.
    """
    pairs = df.select(
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("term"),
        F.col(id_col).alias("id"),
    ).withColumn("s", F.pmod(F.xxhash64("id"), F.lit(n_salts)))
    partial = pairs.groupBy("term", "s").agg(
        F.count("*").cast("bigint").alias("c"),
        F.slice(
            F.sort_array(F.collect_list("id")), 1, max_postings
        ).alias("p"),
    )
    final = partial.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("df_count"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("p"))), 1, max_postings
        ).alias("postings"),
    )
    return final.select(
        "term", "df_count", "postings",
        F.md5(F.concat_ws(",", F.col("postings"))).alias("postings_md5"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-``k`` documents for a small literal query — the
    retrieval query the inverted index exists to serve, here answered
    straight off the corpus in ONE pass.

    Okapi BM25 with ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``; terms
    absent from the corpus get the maximal idf but contribute 0 (their
    tf is 0 everywhere).

    Plan shape (the point of this operator — NO per-term shuffle):
    1. per-document term frequencies are computed IN ROW
       (``size(filter(ws, w == term))`` per query term) — query terms
       are a small literal set, so no explode and no (term, doc)
       exchange exists at all;
    2. the corpus statistics BM25 needs (N, avgdl, per-term document
       frequencies) reduce to ONE global aggregation row — partial
       aggregation does the heavy lifting map-side and the single row
       broadcast-joins back (`crossJoin` of a 1-row frame);
    3. scores are pure codegen arithmetic per row, and the final
       top-``k`` is ``orderBy(...).limit(k)`` — Spark executes it as
       TakeOrderedAndProject (per-partition partial top-k, no global
       sort).

    Scores are rounded to 6dp and tie-broken on ``id`` so the ranking
    is engine-deterministic (double sums are order-dependent).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        words(F.col(text_col)).alias("ws"),
    ).withColumn("dl", F.size("ws").cast("double"))
    def _tf(term: str):  # noqa: ANN202 — one-arg lambda: a 2-arg
        # lambda would be called as (element, index) by F.filter
        return F.size(F.filter(F.col("ws"), lambda w: w == F.lit(term)))

    tf = base.select(
        "id",
        "dl",
        *[
            _tf(t).cast("double").alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = tf.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        t = F.col(f"tf_{i}")
        part = idf * (
            t * (k1 + 1.0)
            / (t + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    return (
        scored.select("id", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Per-document top-``k`` keywords by TF-IDF — the summarization /
    labeling companion of ``bm25_topk`` (that one ranks docs for a
    query; this one ranks terms within each doc).

    ``tf = count(w in d) / |d|``; smoothed
    ``idf = ln((N+1)/(df+1)) + 1`` (scikit-style, never negative).

    Scale shape:
    - one (doc, word) count aggregation — the corpus's only full
      text-derived shuffle; doc length comes from a window SUM over
      the same (id) partitioning, so it re-uses the exchange;
    - document frequency is a (word) aggregation over the already
      one-row-per-(doc,word) frame — counts rows, no distinct pass;
    - df attaches via an equi-join on the word key (unbounded vocab —
      never broadcast; uniform keys, AQE-splittable);
    - N rides a 1-row broadcast crossJoin;
    - the per-doc top-k is row_number ≤ k over (score desc, w) —
      map-side WindowGroupLimit keeps ≤ k rows per doc per partition
      before the exchange.  Ordering uses the ROUNDED score so the
      cut is engine-stable.
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .groupBy("id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    ndocs = df.select(F.col(id_col)).agg(
        F.count("*").cast("double").alias("n_docs")
    )
    wlen = Window.partitionBy("id")
    score = F.round(
        (F.col("cnt") / F.col("doc_len"))
        * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
        ndigits,
    )
    wtop = Window.partitionBy("id").orderBy(
        F.desc("tfidf"), F.asc("w")
    )
    return (
        tf.withColumn(
            "doc_len", F.sum("cnt").over(wlen).cast("double")
        )
        .join(dfreq, "w")
        .crossJoin(F.broadcast(ndocs))
        .select("id", "w", score.alias("tfidf"))
        .withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= k)
        .select(F.col("id"), "w", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


def positional_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_positions: int | None = None,
) -> DataFrame:
    """Positional inverted index: ``(term, id, positions)`` with
    0-based token positions sorted ascending — the postings shape
    phrase and proximity queries need (`inverted_index` keeps only
    doc-level membership).

    One ``posexplode`` + one (term, id)-keyed agg; posting rows are
    per-(term, doc) so the shuffle key is high-cardinality and skew
    concentrates only on genuine stopword terms, the same profile the
    salted builder (`inverted_index_salted`) already handles — compose
    the two if a corpus needs it.  ``max_positions`` (opt-in) caps the
    per-doc position list for stopword rows; phrase search over a
    capped index is approximate for docs longer than the cap, so the
    default keeps every position.
    """
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "term"),
    )
    agg = pairs.groupBy("term", "id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    if max_positions is not None:
        agg = agg.withColumn(
            "positions", F.slice("positions", 1, max_positions)
        )
    return agg


def phrase_search(
    pos_index: DataFrame,
    phrase: list[str],
    ndigits: int = 6,
) -> DataFrame:
    """Exact phrase retrieval over a positional index: docs where the
    tokens of ``phrase`` occur CONSECUTIVELY, with occurrence counts.

    Plan: one filtered scan per distinct phrase term (term literals
    push down to the index scan — on a term-partitioned index at scale
    this is partition pruning, reading |phrase| partitions of a 10^10
    index), k-1 doc-keyed equi-joins to line the postings up, then an
    in-row position intersection: occurrences = |{p in pos(t1) :
    p+i in pos(t_{i+1}) for all i}|.  No window, no explode of
    positions — the intersection is array algebra inside codegen.
    """
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one term")
    base = (
        pos_index.filter(F.col("term") == phrase[0])
        .select(F.col("id"), F.col("positions").alias("p0"))
    )
    acc = base
    for i, term in enumerate(phrase[1:], start=1):
        nxt = pos_index.filter(F.col("term") == term).select(
            F.col("id"), F.col("positions").alias(f"p{i}")
        )
        acc = acc.join(nxt, "id")
    hits = F.col("p0")

    def _adjacent(i: int):
        # real closure: a default-arg lambda would read as Spark's
        # TWO-argument (value, index) higher-order-function form
        return lambda p: F.array_contains(F.col(f"p{i}"), p + i)

    for i in range(1, len(phrase)):
        hits = F.filter(hits, _adjacent(i))
    return (
        acc.select(
            "id", F.size(hits).cast("bigint").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
    )


def ranking_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Per-query ranking quality — MRR and NDCG@k (Järvelin &
    Kekäläinen's graded-gain form with the Burges ``2^rel − 1``
    numerator) — the eval twin the retrieval stack (``bm25_topk``,
    ``phrase_search``, the ANN tiers) needs the way the dedup stack
    has `minhash_recall`/`bcubed`.

    ``ranked``: ``(qid, cid, rnk)`` with rnk 1-based; ``truth``:
    ``(qid, cid, rel)`` graded relevance (absent pair = 0).  Output
    one row per qid IN EITHER INPUT: ``(qid, mrr, dcg, idcg, ndcg)``;
    a query with no relevant docs scores 0 across the board (not
    NULL — eval sweeps aggregate these).

    Plan: one left join of ranked→truth, one truth-side window for the
    ideal ordering (WindowGroupLimit-pruned to k), two qid aggs and a
    full-outer stitch — every step partial-aggregatable, nothing
    driver-side.
    """
    from pyspark.sql import Window

    r = ranked.select(
        "qid", "cid", F.col("rnk").cast("int").alias("rnk")
    ).filter(F.col("rnk") <= k)
    t = truth.select("qid", "cid", F.col("rel").cast("double").alias("rel"))
    joined = r.join(t, ["qid", "cid"], "left").withColumn(
        "rel", F.coalesce("rel", F.lit(0.0))
    )
    gains = joined.groupBy("qid").agg(
        F.coalesce(
            F.max(
                F.when(F.col("rel") > 0, 1.0 / F.col("rnk"))
            ),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2(F.col("rnk") + 1.0)
        ).alias("dcg"),
    )
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    ideal = (
        t.filter(F.col("rel") > 0)
        .withColumn("irnk", F.row_number().over(wi))
        .filter(F.col("irnk") <= k)
        .groupBy("qid")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irnk") + 1.0)
            ).alias("idcg")
        )
    )
    return (
        gains.join(ideal, "qid", "full_outer")
        .select(
            "qid",
            F.round(F.coalesce("mrr", F.lit(0.0)), ndigits).alias("mrr"),
            F.round(F.coalesce("dcg", F.lit(0.0)), ndigits).alias("dcg"),
            F.round(F.coalesce("idcg", F.lit(0.0)), ndigits).alias("idcg"),
            F.round(
                F.when(
                    F.coalesce("idcg", F.lit(0.0)) > 0,
                    F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                ndigits,
            ).alias("ndcg"),
        )
    )
