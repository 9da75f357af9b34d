"""Similarity search over embedding columns (array<float>).

Three tiers, all DataFrame-native:

- ``brute_force_topk``  — exact cosine top-k via a crossJoin + window
  rank.  The correctness baseline; O(Q×N) — fine for small query sets,
  the oracle for the approximate tiers.
- ``lsh_topk``          — sign-random-projection buckets (first-d sign
  bits by default, or seeded hyperplanes) with multi-probe: candidates
  from the query's bucket and its 1-bit-flip neighbors, then exact
  rerank.  Equi-join on bucket → shuffle O(candidates).
- ``ivf_topk``          — inverted-file index: deterministic centroid
  sample, assign each vector to nearest centroid (broadcast centroids,
  JVM fold math), search only the ``nprobe`` nearest cells per query,
  exact rerank inside.  The classic ANN scale path (IVF-Flat).

Dot products use ``zip_with`` + ``aggregate`` left-folds — JVM-side,
vectorized by codegen, no Python.  At 10^9 vectors the cross-join tier
disappears and IVF/LSH carry the load: both shuffle on small keys
(bucket / cell id), with per-cell sizes controlled by the centroid
count, so no partition exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, cid, cosine, rnk)."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        q.crossJoin(c)
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def sign_bucket(vec_col: str, bits: int) -> F.Column:
    """Sign-bit LSH bucket over the first ``bits`` dimensions."""
    return F.concat(
        *[
            F.when(F.element_at(vec_col, i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(1, bits + 1)
        ]
    )


def _flip(bucket, i: int):
    flipped = F.when(
        F.substring(bucket, i, 1) == "1", F.lit("0")
    ).otherwise(F.lit("1"))
    return F.concat(
        F.substring(bucket, 1, i - 1),
        flipped,
        F.substring(bucket, i + 1, 64),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    bits: int = 8,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k: sign-bucket blocking + 1-bit multi-probe +
    exact rerank within candidates.

    ``max_bucket`` (opt-in) drops corpus buckets larger than the cap
    before the candidate join (same degenerate-bucket discipline as
    ``dedup.minhash_lsh_pairs`` / ``dedup.cap_buckets``): with
    correlated embeddings one hot sign-bucket can hold a large corpus
    fraction, and Q queries probing it cost O(Q × |bucket|).  The cap
    bounds per-probe cost at the price of SILENT recall loss for
    queries whose only matching bucket was dropped — which is why it
    defaults to OFF (r3 ADVICE): the caller must choose the recall/
    cost trade explicitly at scale (prefer raising ``bits`` — smaller
    buckets — before capping).
    """
    from .dedup import cap_buckets

    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        sign_bucket(vec_col, bits).alias("bucket"),
    )
    if max_bucket is not None:
        c = cap_buckets(c, "bucket", max_bucket)
    qb = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        sign_bucket(vec_col, bits).alias("b0"),
    )
    probes = [F.col("b0")]
    if multiprobe:
        probes += [_flip(F.col("b0"), i) for i in range(1, bits + 1)][:multiprobe * bits]
    q = qb.select(
        "qid", "qv", F.explode(F.array(*probes)).alias("bucket")
    ).dropDuplicates(["qid", "bucket"])
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        q.join(c, "bucket")
        .dropDuplicates(["qid", "cid"])
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat: deterministic centroids via seeded hash sampling — the
    ``n_cells`` corpus vectors with the smallest ``xxhash64(id)``.
    ``orderBy(h).limit(n)`` compiles to TakeOrderedAndProject (partial
    per-partition top-k merged at n_cells rows), so centroid selection
    never sorts, counts, or single-partitions the corpus — a hash-random
    yet reproducible sample at any scale.  The row_number window that
    assigns cell ids runs over ≤ n_cells rows (like rank_years_desc) and
    is deliberately tiny.  Nearest-cell assignment is a broadcast
    centroid join; queries search their nprobe nearest cells with exact
    rerank inside."""
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    centroids = (
        c.select(F.xxhash64("cid").alias("h"), F.col("cid"), F.col("cv"))
        .orderBy("h", "cid")
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy("h", "cid")).alias("cell"),
            F.col("cv").alias("centroid"),
        )
    )

    cents = F.broadcast(centroids)
    # assign corpus vectors to their single nearest cell
    w_c = Window.partitionBy("cid").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (
        c.crossJoin(cents)
        .withColumn("csim", _cosine(F.col("cv"), F.col("centroid")))
        .withColumn("crn", F.row_number().over(w_c))
        .filter(F.col("crn") == 1)
        .select("cid", "cv", "cell")
    )
    # per query: nprobe nearest cells
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    w_q = Window.partitionBy("qid").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        q.crossJoin(cents)
        .withColumn("qsim", _cosine(F.col("qv"), F.col("centroid")))
        .withColumn("qrn", F.row_number().over(w_q))
        .filter(F.col("qrn") <= nprobe)
        .select("qid", "qv", "cell")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        probes.join(assigned, "cell")
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def recall_at_k(
    queries: DataFrame,
    corpus: DataFrame,
    approx_topk: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result against exact brute
    force — the tuning loop for the ANN index family (`lsh_topk`
    bits/multiprobe/cap, `ivf_topk` n_cells/nprobe): every knob above
    trades recall for cost, and at corpus scale the trade must be
    MEASURED on a query sample, not guessed.  ``approx_topk`` is any
    frame with (qid, cid) — the output shape of ``lsh_topk``/
    ``ivf_topk``.  Returns one row per query: (qid, recall), recall =
    |approx ∩ exact_topk| / k, 0.0 for queries whose approx result was
    empty (e.g. their only bucket was capped away).

    Scale: the exact arm is the expensive part (a full query × corpus
    scan), which is exactly why this runs on a SAMPLED query set —
    recall is a corpus property, not a per-query one, so a few hundred
    queries bound the cost while the estimate's error shrinks as
    1/sqrt(n_queries).  The intersection is a (qid, cid)-keyed
    left-semi join on two k-bounded frames (≤ |queries|·k rows each);
    the per-query fold and the final left join are broadcast-size by
    construction.
    """
    exact = brute_force_topk(
        queries, corpus, k=k, vec_col=vec_col, id_col=id_col
    )
    hits = (
        exact.select("qid", "cid")
        .join(approx_topk.select("qid", "cid"), ["qid", "cid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("hits"))
    )
    return (
        queries.select(F.col(id_col).alias("qid"))
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k), 6
            ).alias("recall"),
        )
    )


# --- int8 scalar quantization -----------------------------------------
# At 10^10-vector scale the embedding column dominates shuffle and
# memory: 64 × float32 = 256 B/vector, while max-abs int8 quantization
# stores 64 B + one scale — 4× less through every exchange, and the
# dot product becomes integer arithmetic.  Cosine over quantized
# vectors is SCALE-FREE (the per-vector scales cancel in the ratio),
# so ranking needs only the int codes; bit-exact across engines
# (max/÷/floor(+0.5) are identical IEEE-double steps in Spark and
# DuckDB, making the oracle integer-exact — no float-ordering risk).


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Max-abs symmetric int8 codes: scale = max|x|/127, code_i =
    floor(x_i/scale + 0.5) ∈ [-127, 127] (round-half-up, engine-
    neutral).  A zero vector gets all-zero codes and scale 0.
    Returns (id, codes array<int>, scale double); pure in-row
    codegen."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    scale = maxabs / F.lit(127.0)
    codes = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + 0.5).cast("int"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        codes.alias("codes"),
        scale.alias("scale"),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k cosine over int8 codes → (qid, cid, rnk).

    The inner loop is an integer dot product (zip_with + aggregate
    over int codes — JVM codegen); cosine = Σqa·qb /
    (√Σqa²·√Σqb²), scales cancelled.  Zero-norm rows score 0.
    Same exhaustive plan shape as ``brute_force_topk`` (the oracle
    tier); the production path buckets first (``lsh_topk`` /
    ``ivf_topk``) and swaps its exact rerank for this 4×-lighter
    arithmetic."""
    q = quantize_int8(queries, vec_col, id_col).select(
        F.col("id").alias("qid"),
        F.col("codes").alias("qc"),
    )
    c = quantize_int8(corpus, vec_col, id_col).select(
        F.col("id").alias("cid"),
        F.col("codes").alias("cc"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, z: acc + z,
        )

    num = dot(F.col("qc"), F.col("cc")).cast("double")
    den = F.sqrt(dot(F.col("qc"), F.col("qc")).cast("double")) * F.sqrt(
        dot(F.col("cc"), F.col("cc")).cast("double")
    )
    sim = F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        q.crossJoin(c)
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", F.col("rnk").cast("int").alias("rnk"))
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for embedding/retriever training (the DPR /
    Contriever / SimCSE recipe): for each anchor, the ``k`` most
    similar corpus items carrying a DIFFERENT label — same-label items
    are positives (or near-duplicates of them), and random negatives
    are trivially separable, so the items that actually teach the
    decision boundary are exactly these near-miss cross-label
    neighbors.  The label column is whatever partitions positives from
    negatives in the pipeline: source, dedup-cluster id
    (`dedup.connected_components`), or a supervision key.

    Exclusion runs BEFORE ranking (a same-label neighbor must not
    consume a rank slot).  This is the exact tier — anchors are a
    bounded training-batch sample, so the crossJoin is
    |anchors|×|corpus| with |anchors| small; at corpus scale compose
    the IVF/LSH tier instead (`ivf_topk`/`lsh_topk` carry any extra
    column through, filter label there, refill from the next probe).

    Returns ``(qid, q_label, cid, c_label, rnk)``, rank 1..k by cosine
    desc with the repo's deterministic cid tie-break.
    """
    q = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("q_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("c_label"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        q.crossJoin(c)
        .filter(F.col("q_label") != F.col("c_label"))
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "q_label", "cid", "c_label", "rnk")
    )


def margin_knn_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ndigits: int = 6,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
    LASER/CCMatrix method behind the largest public parallel corpora):
    score a candidate pair not by raw cosine but by its RATIO margin
    against both sides' neighborhoods,

        margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2),

    where avgF(x) is the mean cosine of x's k nearest targets and
    avgB(y) of y's k nearest sources.  Raw-cosine thresholds fail on
    hubness (some embeddings are near EVERYTHING; their pairs look
    good and are garbage) — the margin divides that hub mass out,
    which is precisely why it wins at web scale.

    Exact tier over bounded sides (training-batch/shard-sized — the
    crossJoin is |src|×|tgt|); the IVF/LSH tiers compose for corpus
    scale by replacing the dense cos matrix with per-probe candidate
    sets (margins only need each side's top-k, which ANN supplies).

    Output: the best target per source, ``(qid, cid, margin)`` with
    margin rounded to ``ndigits`` (window sums of doubles are
    order-dependent at 1 ulp — repo float-parity convention).
    """
    q = src.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = tgt.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    cos = (
        q.crossJoin(c)
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
        .select("qid", "cid", "cosine")
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    wb = Window.partitionBy("cid").orderBy(F.desc("cosine"), F.asc("qid"))
    ranked = cos.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rb", F.row_number().over(wb)
    )
    avg_f = (
        ranked.filter(F.col("rf") <= k)
        .groupBy("qid")
        .agg(F.avg("cosine").alias("af"))
    )
    avg_b = (
        ranked.filter(F.col("rb") <= k)
        .groupBy("cid")
        .agg(F.avg("cosine").alias("ab"))
    )
    m = (
        cos.join(avg_f, "qid")
        .join(avg_b, "cid")
        .withColumn(
            "margin",
            F.col("cosine") / ((F.col("af") + F.col("ab")) / 2.0),
        )
    )
    wbest = Window.partitionBy("qid").orderBy(
        F.desc("margin"), F.asc("cid")
    )
    return (
        m.withColumn("rnk", F.row_number().over(wbest))
        .filter(F.col("rnk") == 1)
        .select("qid", "cid", F.round("margin", ndigits).alias("margin"))
    )
