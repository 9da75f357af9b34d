"""Deduplication operators for corpus building at 100 TB scale.

The reference deduplicates once, offline, with pandas
(`drop_duplicates(subset=["document_url"])`,
/root/reference/src/datasets/build_dataset.py:204).  A web-scale corpus
needs the full ladder, each expressed as DataFrame ops over JVM
built-ins (md5/array/window — no Python in the hot path):

- exact            — fingerprint groupBy, deterministic survivor
- minhash_lsh      — shingle → MinHash signature → banded buckets →
                     bucket self-join (candidate pairs without the
                     quadratic cross-join)
- simhash          — 16-bit signature; near-dup pairs via the
                     pigeonhole band trick (hamming ≤ k ⇒ some chunk of
                     k+1 chunks equal) so the join is equi, not theta
- ngram_jaccard    — exact word-set Jaccard within blocking keys
- embedding_cosine — near-dup by cosine ≥ τ within LSH sign-buckets

Scale notes: every pair-producer is a *blocked equi self-join* —
shuffle keyed by bucket/block, never a cross-join; skewed buckets
(boilerplate shingles) are the operational risk, so bucket sizes are
capped (``max_bucket`` drops degenerate buckets, the standard LSH
practice) and AQE skew-join handles the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One survivor (min id) per normalized-text fingerprint."""
    fp = T.fingerprint(F.col(text_col)).alias("fp")
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        df.select("*", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )


def pair_expansion(ids: Column) -> Column:
    """All (a_id, b_id) pairs, a before b, from a sorted id array.

    The in-array replacement for an LSH bucket self-join: one shuffle
    (the groupBy that built ``ids``) instead of shuffling the signature
    pipeline twice, and the upstream minhash work is computed once.
    Safe only because bucket sizes are capped upstream.
    """
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) sharing ≥1 LSH bucket.

    Bucket → collect_set → in-array pair expansion (no self-join): the
    shingle→minhash→band pipeline is evaluated exactly once per doc, and
    the degenerate-bucket cap is a free ``size(ids)`` filter instead of a
    window count.  The short-doc filter runs on a cheap token-count
    predicate *before* the shingle projection so predicate pushdown
    cannot duplicate the expensive expression.
    """
    rows = num_hashes // bands
    sig = (
        df.filter(F.size(T.words(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            T.word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .select("id", T.minhash_sig(F.col("sh"), num_hashes).alias("sig"))
    )
    buckets = sig.select(
        "id", F.explode(T.lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    )
    grouped = buckets.groupBy("bk").agg(
        F.array_sort(F.collect_set("id")).alias("ids")
    )
    return (
        grouped.filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
        )
        .select(F.explode(pair_expansion(F.col("ids"))).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )


def minhash_lsh_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Star edges per LSH bucket — (a_id = bucket min, b_id = member) —
    the CLUSTERING path to near-dup components at corpus scale.

    :func:`minhash_lsh_pairs` expands every C(k,2) pair inside a
    bucket, which is what a pairwise-verification consumer needs but is
    quadratic in duplicate-cluster size: the 8.19M-URL rehearsal world
    produced **331.6M pairs from 8.0M pages** (54× the 1.02M world's
    6.1M — template families grow linearly with the corpus, their pair
    counts quadratically), and connected-components over those pairs
    took 14.6 min.  For dedup clustering the pairs are overkill: every
    member of a bucket lands in the same component either way, so one
    star edge per member — to the bucket minimum — yields IDENTICAL
    components with Σ(k−1) edges instead of Σ k(k−2)/2
    (equivalence asserted in tests/test_dedup.py).

    Plan shape: the bucket-min side is a groupBy agg; members re-attach
    via an equi-join on the bucket key rather than a collect_set row —
    a degenerate bucket (site-wide boilerplate shingle band) becomes a
    skewed JOIN key that AQE skew-join splits across tasks, never a
    single multi-GB array row on one executor.  ReuseExchange feeds
    both sides from one shuffle of the bucket table.  No ``max_bucket``
    cap is needed (or taken): edges stay linear in bucket size, and at
    clustering time a huge bucket is signal, not noise.
    """
    rows = num_hashes // bands
    sig = (
        df.filter(F.size(T.words(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            T.word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .select("id", T.minhash_sig(F.col("sh"), num_hashes).alias("sig"))
    )
    buckets = sig.select(
        "id", F.explode(T.lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    )
    mins = buckets.groupBy("bk").agg(
        F.min("id").alias("a_id"), F.count("*").alias("k")
    )
    return (
        buckets.join(mins.filter(F.col("k") >= 2).drop("k"), "bk")
        .filter(F.col("id") != F.col("a_id"))
        .select("a_id", F.col("id").alias("b_id"))
        .distinct()
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs with SimHash16 hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 16-bit signature into (max_hamming+1)
    chunks; any pair within the distance budget must agree on at least
    one whole chunk → bucket on (chunk_idx, chunk_value), then the
    exact hamming filter.

    Bucketing runs the minhash discipline — groupBy → capped
    collect_set → in-array pair expansion — NOT a bucket self-join:
    a 4-bit chunk has only 16 possible values, so on any large corpus
    every chunk bucket saturates and a self-join is O(n²/16) by
    construction (measured: 147k docs → 10^9 candidate pairs, 2 min on
    32 cores for what should be a seconds-scale job).  The
    ``max_bucket`` cap makes the blowup impossible and, exactly as in
    ``minhash_lsh_pairs``, documents the recall contract: a bucket
    bigger than the cap carries no discriminating information at this
    signature width (16-bit SimHash is a teaching width — production
    near-dup uses 64-bit signatures, whose 16-bit chunks give 65 536
    bucket values).  The signature pipeline is computed ONCE (single
    consumer — no self-join sides to feed).
    """
    chunks = max_hamming + 1
    width = 16 // chunks
    sig = df.select(
        F.col(id_col).alias("id"),
        T.simhash16(F.col(text_col)).alias("sh16"),
    )
    parts = sig.select(
        "id",
        "sh16",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.substring("sh16", i * width + 1, width).alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "sh16", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    grouped = parts.groupBy("ci", "cv").agg(
        F.array_sort(
            F.collect_set(F.struct(F.col("id"), F.col("sh16")))
        ).alias("ms")
    )
    cand = (
        grouped.filter(
            (F.size("ms") >= 2) & (F.size("ms") <= max_bucket)
        )
        .select(F.explode(pair_expansion(F.col("ms"))).alias("p"))
        .select(
            F.col("p.a_id.id").alias("a_id"),
            F.col("p.a_id.sh16").alias("a_sh"),
            F.col("p.b_id.id").alias("b_id"),
            F.col("p.b_id.sh16").alias("b_sh"),
        )
        # collect_set dedups (id, sh16) STRUCTS — a duplicated doc_id
        # with different texts keeps both structs, so the expansion can
        # emit an id-level self-pair; drop it (r3 ADVICE)
        .filter(F.col("a_id") != F.col("b_id"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", T.hamming16(F.col("a_sh"), F.col("b_sh")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_bitset_bits: int = 512,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold within blocking keys.

    One of two physical representations is chosen from the measured
    vocabulary size:

    - **bitset path** (vocab ≤ ``max_bitset_bits``): tokens are
      dictionary-encoded (the dict is tiny by construction — it fits
      ``max_bitset_bits`` rows — so the encode join broadcasts it) and
      each doc's token set becomes ⌈vocab/64⌉ LONG columns; per-pair
      intersection is ``bit_count(a & b)`` — pure scalar
      whole-stage-codegen, no array allocation per pair.  This is the
      dictionary-+-bitmap trick from the set-similarity-join
      literature, exact for any vocab that fits.
    - **hash path** (fallback): tokens encode as ``xxhash64(token)``
      IN ROW — no dictionary, no broadcast, no join (a web-scale vocab
      of 10^8–10^9 distinct tokens has no broadcastable dict); pairs
      compare sorted hash arrays with one ``array_intersect``
      (|A∪B| = |A|+|B|−|A∩B|).  64-bit collisions are negligible
      (P ≈ tokens²/2⁶⁵ per doc) and only ever merge two tokens.

    Both paths produce identical pairs (tests force each).  Docs with
    empty token sets can never reach the threshold and drop out at the
    encode step.

    ``checkpoint`` (default on) localCheckpoints the encoded frame so
    the self-join's two sides read ONE materialization instead of
    recomputing the whole explode/encode/aggregate subtree per side
    (the executed plan otherwise duplicates it — measured ~35% of the
    query).  Plan-shape tests pass False to inspect the full subtree.
    """
    tok = df.select(
        *block_cols,
        F.col(id_col).alias("id"),
        F.array_distinct(T.words(F.col(text_col))).alias("ws"),
    )
    distinct_toks = tok.select(F.explode("ws").alias("t")).distinct()
    # one tiny driver action decides the physical plan (Iceberg analogue:
    # column NDV stats from the manifest)
    vocab = distinct_toks.count()

    if vocab <= max_bitset_bits:
        # dense ids 0..vocab-1 (the window is over the tiny dict only —
        # single-partition is fine at ≤ max_bitset_bits rows)
        dict_df = distinct_toks.select(
            "t",
            (F.row_number().over(Window.orderBy("t")) - 1).alias("tid"),
        )
        nlongs = (vocab + 63) // 64
        exploded = tok.select(*block_cols, "id", F.explode("ws").alias("t")).join(
            F.broadcast(dict_df), "t"
        )
        # per-doc masks: sum of distinct bits == bitwise OR (tids unique
        # within a doc because ws is array_distinct'd)
        mask_aggs = [
            F.sum(
                F.when(
                    (F.col("tid") / 64).cast("int") == j,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias(f"m{j}")
            for j in range(nlongs)
        ]
        enc = (
            exploded.groupBy(*block_cols, "id")
            .agg(*mask_aggs, F.count("*").alias("n"))
        )
        if checkpoint:
            enc = enc.localCheckpoint(eager=False)
        a = enc.select(
            *block_cols, F.col("id").alias("a_id"), F.col("n").alias("a_n"),
            *[F.col(f"m{j}").alias(f"a_m{j}") for j in range(nlongs)],
        )
        b = enc.select(
            *block_cols, F.col("id").alias("b_id"), F.col("n").alias("b_n"),
            *[F.col(f"m{j}").alias(f"b_m{j}") for j in range(nlongs)],
        )
        inter = sum(
            (
                F.bit_count(F.col(f"a_m{j}").bitwiseAND(F.col(f"b_m{j}")))
                for j in range(nlongs)
            ),
            F.lit(0),
        )
        union = F.col("a_n") + F.col("b_n") - inter
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(
            F.lit(0.0)
        )
        ratio_ok = (
            F.col("a_n") * F.lit(1.0) >= F.lit(threshold) * F.col("b_n")
        ) & (F.col("b_n") * F.lit(1.0) >= F.lit(threshold) * F.col("a_n"))
        return (
            a.join(b, block_cols)
            .filter((F.col("a_id") < F.col("b_id")) & ratio_ok)
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", "jaccard")
        )

    # -- hash fallback (large vocabulary) -----------------------------------
    # per-row encode: sorted distinct xxhash64 values stand in for the
    # token ids — zero shuffles between the scan and the pair join
    enc = tok.filter(F.size("ws") > 0).select(
        *block_cols,
        "id",
        F.array_sort(
            F.array_distinct(F.transform("ws", lambda t: F.xxhash64(t)))
        ).alias("ws"),
    )
    if checkpoint:
        enc = enc.localCheckpoint(eager=False)
    a = enc.select(*block_cols, F.col("id").alias("a_id"), F.col("ws").alias("a_ws"))
    b = enc.select(*block_cols, F.col("id").alias("b_id"), F.col("ws").alias("b_ws"))
    # |A∪B| = |A|+|B|−|A∩B|: one array_intersect per pair, no array_union.
    # Plain expressions only — a lambda binder here would knock the join
    # out of whole-stage codegen (measured 2× slower).  The size-ratio
    # prune (jaccard ≥ t ⇒ min/max size ratio ≥ t) is O(1) per pair and
    # runs before the intersect.
    inter = F.size(F.array_intersect("a_ws", "b_ws"))
    union = F.size("a_ws") + F.size("b_ws") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    ratio_ok = (
        F.size("a_ws") * F.lit(1.0) >= F.lit(threshold) * F.size("b_ws")
    ) & (F.size("b_ws") * F.lit(1.0) >= F.lit(threshold) * F.size("a_ws"))
    return (
        a.join(b, block_cols)
        .filter((F.col("a_id") < F.col("b_id")) & ratio_ok)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs: (id, comp) where comp
    is the minimum id in the component — the step from candidate PAIRS
    to dedup CLUSTERS (pick one survivor per comp).

    Iterative min-label propagation — BFS-over-DataFrames exactly like
    the crawl loop: each round every node adopts the smallest label in
    its neighborhood; converged when no label changes (checked with one
    small driver action per round).  O(diameter) rounds; near-dup
    cluster diameters are tiny in practice.  For adversarial long-chain
    graphs the O(log n) large-star/small-star variant slots in here
    unchanged (same edges/labels tables).  Label state is cached per
    round and unpersisted after — the working set is 2 columns.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(b_col).alias("src"), F.col(a_col).alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
                (F.coalesce("ncomp", F.col("comp")) < F.col("comp")).alias(
                    "chg"
                ),
            )
        ).localCheckpoint()  # eager: truncates lineage at each round
        changed = new_labels.filter("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 30,
    return_rounds: bool = False,
) -> DataFrame:
    """Connected components in O(log n) rounds via alternating
    large-star / small-star (Kiveris et al., *Connected Components in
    MapReduce and Beyond*, SoCC'14): (id, comp) with comp = min id.

    :func:`connected_components` (min-label propagation) needs
    O(diameter) rounds — fine for near-dup clusters (tiny diameters),
    quadratic-ish wall time on adversarial chain graphs such as
    template spam where one cluster is a 10^5-long path.  The star
    operations contract any graph to stars in O(log n) alternations:

    - **large-star** — every node's *larger* neighbors re-attach to the
      minimum of its closed neighborhood;
    - **small-star** — every node's smaller-or-equal neighbors (and the
      node) attach to that minimum.

    Each round is one groupBy shuffle over the current edge set (edges
    shrink toward one-per-node) plus a scalar checksum action for the
    convergence test; ``localCheckpoint`` truncates lineage per round,
    exactly like the crawl loop."""
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select("u").unionByName(e.select(F.col("v").alias("u"))).distinct()
    )

    # Both stars emit (x, m) STRUCTS built inside a transform with the
    # neighborhood minimum let-bound: after the graph contracts to
    # stars, a mega-component's center has degree = component size, and
    # any unbound array_min reachable from the explode's output
    # projection is re-evaluated PER EMITTED EDGE (CollapseProject
    # inlines project exprs into/after the Generate) — O(deg²) on
    # exactly the row that already dominates the round.  Measured on a
    # 40k-doc template cluster: 150 s/round unbound, <3 s/round bound.
    # functions/text.let is the repo-wide binder (no CSE in HOF
    # lambdas); post-explode projection is pure struct-field access.
    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        g = sym.groupBy("u").agg(F.collect_set("v").alias("ns"))
        pairs_arr = T.let(
            F.least(F.col("u"), F.array_min("ns")),
            lambda m: F.transform(
                F.filter(F.col("ns"), lambda x: x > F.col("u")),
                lambda x: F.struct(x.alias("x"), m.alias("m")),
            ),
        )
        return (
            g.select(F.explode(pairs_arr).alias("p"))
            .filter(F.col("p.x") != F.col("p.m"))
            .select(F.col("p.x").alias("u"), F.col("p.m").alias("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        d = (
            edges.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        g = d.groupBy("u").agg(F.collect_set("v").alias("ns"))
        pairs_arr = T.let(
            F.array_min("ns"),
            lambda mn: F.transform(
                F.array_union(
                    F.filter(F.col("ns"), lambda x: x != mn),
                    F.array(F.col("u")),
                ),
                lambda x: F.struct(x.alias("x"), mn.alias("m")),
            ),
        )
        return (
            g.select(F.explode(pairs_arr).alias("p"))
            .filter(F.col("p.x") != F.col("p.m"))
            .select(F.col("p.x").alias("u"), F.col("p.m").alias("v"))
            .distinct()
        )

    prev_sig = None
    rounds = 0
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint()
        rounds += 1
        sig = e.agg(
            F.count("*").alias("n"),
            # xor-fold: order-independent and overflow-free under ANSI
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edge set is a union of stars (member → root); roots
    # label themselves.  The nodes join is insurance that every input
    # node gets a label even in the degenerate single-node case.
    star = e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("comp")).distinct()
    labels = nodes.select(F.col("u").alias("id")).join(
        star.unionByName(roots).groupBy("id").agg(F.min("comp").alias("comp")),
        "id",
        "left",
    ).select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    if return_rounds:
        return labels, rounds
    return labels


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cap_buckets(
    e: DataFrame, bucket_col: str, max_bucket: int
) -> DataFrame:
    """Drop degenerate LSH buckets (> ``max_bucket`` members) before a
    bucket self-join — the same discipline as ``minhash_lsh_pairs``.

    Sign-bucket spaces are tiny (≤ 2^sign_bits distinct values), so the
    surviving-bucket dim is always broadcastable; the guarded corpus
    never shuffles for the cap itself.  Without this, one hot bucket
    over correlated embeddings (8 sign bits ⇒ 256 buckets) turns the
    self-join quadratic: ~N²/256 pairs at worst.
    """
    ok = (
        e.groupBy(bucket_col)
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket)
        .select(bucket_col)
    )
    return e.join(F.broadcast(ok), bucket_col)


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    sign_bits: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold, blocked by sign-bit LSH.

    Sign-bucket blocking is recall-lossy near the threshold (standard
    SRP-LSH trade-off); raise recall by lowering ``sign_bits`` or by
    multi-probe (union over several bit-flip probes).  Buckets larger
    than ``max_bucket`` are dropped before the self-join
    (:func:`cap_buckets`) — at web scale a single degenerate bucket is
    the difference between O(matches) and O(N²) pair expansion.
    """
    bits = F.concat(
        *[
            F.when(F.element_at(vec_col, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(1, sign_bits + 1)
        ]
    )
    e = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bits.alias("bucket")
    )
    if max_bucket is not None:
        e = cap_buckets(e, "bucket", max_bucket)
    a = e.select("bucket", F.col("id").alias("a_id"), F.col("v").alias("a_v"))
    b = e.select("bucket", F.col("id").alias("b_id"), F.col("v").alias("b_v"))
    sim = _dot(F.col("a_v"), F.col("b_v")) / (
        F.sqrt(_dot(F.col("a_v"), F.col("a_v")))
        * F.sqrt(_dot(F.col("b_v"), F.col("b_v")))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    sign_bits: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop documents whose EMBEDDING has
    a near-identical earlier neighbor — semantic duplicates that
    lexical minhash/simhash misses (translations, paraphrases,
    templated rewrites), the dedup tier the paper showed removes
    20-50% of web corpora with no quality loss.

    Survivor rule: a doc is KEPT iff no smaller-id doc sits within
    ``threshold`` cosine in its LSH bucket — i.e. the earliest doc of
    every duplicate pair survives.  On transitive chains (a~b, b~c,
    a̸~c) this drops both b and c: strictly more aggressive than
    greedy-sequential (which would re-admit c after dropping b) and
    order-free, so it parallelizes without a sequential scan; the
    paper's per-cluster variant is the same rule with cluster-centroid
    distance as the tie-break.

    Plan shape / scale: pair generation is
    :func:`embedding_cosine_pairs` (sign-bucket LSH); the drop set is
    ``DISTINCT b_id`` of those pairs, and the verdict lands as one
    id-keyed left join emitting ``(id, kept)`` — rows, never vectors,
    cross that shuffle.

    ``max_bucket`` defaults to None (opt-in, the ``lsh_topk``
    convention from the r3 advice): a capped bucket here would mark
    its entire membership kept=True — silently returning ~0% removal
    on exactly the template families that needed dedup most.  Callers
    at web scale should RAISE ``sign_bits`` (more, smaller buckets)
    rather than cap, and treat a still-degenerate bucket as a signal
    the corpus needs the minhash tier first.
    """
    pairs = embedding_cosine_pairs(
        df,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        sign_bits=sign_bits,
        max_bucket=max_bucket,
    )
    dropped = (
        pairs.select(F.col("b_id").alias("id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(dropped, "id", "left")
        .select("id", F.coalesce(~F.col("dup"), F.lit(True)).alias("kept"))
    )


def host_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "source",
    gram_words: int | None = 8,
    max_hosts: int = 100,
) -> DataFrame:
    """Host pairs serving identical content — mirror / shared-template
    detection for the crawl planner (mirrored hosts waste fetch budget;
    a detected pair lets the scheduler crawl one and sample the other).

    Granularity: with ``gram_words=None`` the unit is the whole-page
    fingerprint (strict mirrors, ``doc_fingerprints`` convention);
    with ``gram_words=k`` it is the rolling k-word gram (shared
    boilerplate/templates — how real mirrors usually surface, since
    mirrored pages differ in ads/timestamps).  Output:
    ``(host_a, host_b, shared)`` with host_a < host_b, ``shared`` =
    distinct common fingerprints.

    Plan shape (all join-free, the minhash_lsh_pairs discipline):
    distinct (hash, host) → one exchange; collect_set(host) per hash
    with the ``max_hosts`` degenerate-key cap (an empty-page hash
    shared by every host of the web must not expand to |hosts|²
    pairs); in-array ``pair_expansion``; count per pair — the final
    shuffle moves only (host_a, host_b) keys, bounded by |hosts|².
    """
    if gram_words is None:
        key = F.md5(
            F.lower(
                F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
            )
        )
        occ = df.select(key.alias("h"), F.col(host_col).alias("host"))
    else:
        k = gram_words
        # token hashes bound once per doc (no CSE inside lambdas), gram
        # key = xxhash64 over the k-tuple of token hashes — identical
        # equality classes to hashing the joined gram text, no string
        # rebuild per gram (same discipline as dup_span_coverage)
        grams = T.let(
            T.words(F.col(text_col)),
            lambda ws: T.let(
                F.transform(ws, lambda t: F.xxhash64(t)),
                lambda th: F.when(
                    F.size(th) >= k,
                    F.transform(
                        F.sequence(F.lit(0), F.size(th) - k),
                        lambda i: F.xxhash64(
                            *[
                                F.element_at(th, i + j)
                                for j in range(1, k + 1)
                            ]
                        ),
                    ),
                ).otherwise(F.array().cast("array<bigint>")),
            ),
        )
        occ = df.select(
            F.explode(grams).alias("h"), F.col(host_col).alias("host")
        )
    grouped = (
        occ.distinct()
        .groupBy("h")
        .agg(F.array_sort(F.collect_set("host")).alias("hosts"))
        .filter((F.size("hosts") >= 2) & (F.size("hosts") <= max_hosts))
    )
    return (
        grouped.select(F.explode(pair_expansion(F.col("hosts"))).alias("p"))
        .groupBy(
            F.col("p.a_id").alias("host_a"), F.col("p.b_id").alias("host_b")
        )
        .agg(F.count("*").cast("bigint").alias("shared"))
    )


# ---------------------------------------------------------------------------
# Asymmetric shingle containment (quote / near-inclusion detection)
# ---------------------------------------------------------------------------


def containment_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    threshold: float = 0.9,
    checkpoint: bool = True,
) -> DataFrame:
    """Directional containment pairs: emit ``(a_id, b_id, containment)``
    whenever |S(A) ∩ S(B)| / |S(A)| ≥ threshold over distinct
    ``shingle_n``-word shingles — A is (near-)INCLUDED in B.  The
    asymmetric cousin of Jaccard: a short quote, syndicated excerpt, or
    page embedded in a larger template scores ~1.0 here while its
    Jaccard stays low, so this is the quote/inclusion detector of
    web-corpus provenance pipelines (cf. Broder 1997's resemblance vs
    containment split).

    Candidate generation is SSJoin/PPJoin prefix filtering (Chaudhuri
    2006; Xiao 2008): each doc's shingle set is canonically sorted and
    only its PREFIX of ⌊(1−t)·|A|⌋+1 shingles is exploded into the
    probe side — if A⊆~B shares ≥⌈t|A|⌉ shingles with B, at least one
    lies in that prefix, so no qualifying pair is missed (classic
    pigeonhole).  The index side carries all shingles.  Ordering is
    lexicographic over the shingle strings rather than
    ascending-document-frequency: correctness is order-independent
    (any fixed total order works for the pigeonhole), df-order only
    tightens pruning; lexicographic keeps the op one-pass with no df
    precomputation.

    Plan shape at 100 TB: one explode+equi-join on (block, shingle) —
    the probe side is the small prefix fraction of the corpus — then
    one distinct and two id-equi-joins back to the (localCheckpoint'd)
    shingle-set table for the exact ``array_intersect`` verify.
    Blocking keys bound the join fan-out exactly as in
    :func:`ngram_jaccard_pairs`; a stopword-shingle hot key is shared
    template text, which blocking plus AQE skew-split absorbs.
    """
    tok = df.select(
        *block_cols,
        F.col(id_col).alias("id"),
        F.array_sort(
            F.array_distinct(T.word_shingles(F.col(text_col), shingle_n))
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    if checkpoint:
        tok = tok.localCheckpoint(eager=False)
    # prefix length |A| − ⌈t·|A|⌉ + 1  (≥1 always)
    plen = (
        F.size("sh") - F.ceil(F.lit(threshold) * F.size("sh")).cast("int") + 1
    )
    probe = tok.select(
        *block_cols,
        F.col("id").alias("a_id"),
        F.explode(F.slice("sh", 1, plen)).alias("s"),
    )
    index = tok.select(
        *block_cols,
        F.col("id").alias("b_id"),
        F.explode("sh").alias("s"),
    )
    cand = (
        probe.join(index, [*block_cols, "s"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(*block_cols, "a_id", "b_id")
        .distinct()
    )
    a = tok.select(*block_cols, F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = tok.select(*block_cols, F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
    return (
        cand.join(a, [*block_cols, "a_id"])
        .join(b, [*block_cols, "b_id"])
        .select(
            "a_id",
            "b_id",
            (
                F.size(F.array_intersect("a_sh", "b_sh")) / F.size("a_sh")
            ).alias("_raw"),
        )
        # threshold on the RAW ratio (rounding first could pull a
        # sub-threshold pair over the bar), round only for output
        .filter(F.col("_raw") >= threshold)
        .select("a_id", "b_id", F.round("_raw", 6).alias("containment"))
    )


def lsh_pair_eval(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate generator against
    exact shingle-set Jaccard ground truth — the dedup-tuning
    measurement (the banding theorem gives the EXPECTED capture curve
    s^(1/bands); this measures the realized one on actual data, the
    same role :func:`~..operators.similarity.recall_at_k` plays for
    ANN).  Returns ONE row: ``(n_true, n_cand, n_hit, precision,
    recall)``.

    Ground truth is a brute-force within-block self-join (quadratic
    per block) — this is an EVAL-tier operator like brute-force ANN:
    run it on a sampled block, not the corpus.  Candidates come from
    the production generator (:func:`minhash_lsh_pairs`, uncapped so
    the measurement sees the generator itself, not the cap) and are
    restricted to within-block pairs so both sides range over the same
    pair universe.  Precision/recall of an empty denominator is 0.
    """
    sh = df.select(
        *block_cols,
        F.col(id_col).alias("id"),
        F.array_sort(
            F.array_distinct(T.word_shingles(F.col(text_col), shingle_n))
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    sh = sh.localCheckpoint(eager=False)
    a = sh.select(
        *block_cols, F.col("id").alias("a_id"), F.col("sh").alias("a_sh")
    )
    b = sh.select(
        *block_cols, F.col("id").alias("b_id"), F.col("sh").alias("b_sh")
    )
    truth = (
        a.join(b, block_cols)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (
                F.size(F.array_intersect("a_sh", "b_sh"))
                / (
                    F.size("a_sh")
                    + F.size("b_sh")
                    - F.size(F.array_intersect("a_sh", "b_sh"))
                )
            ).alias("j"),
        )
        .filter(F.col("j") >= jaccard_threshold)
        .select("a_id", "b_id")
    )
    ids = sh.select(*block_cols, F.col("id"))
    cand = (
        minhash_lsh_pairs(
            df,
            text_col=text_col,
            id_col=id_col,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket=1 << 31,
        )
        .join(ids.select(*block_cols, F.col("id").alias("a_id")), "a_id")
        .join(
            ids.select(
                *[F.col(c).alias(f"_b_{c}") for c in block_cols],
                F.col("id").alias("b_id"),
            ),
            "b_id",
        )
    )
    # same-block restriction (conjunction over block cols)
    for c in block_cols:
        cand = cand.filter(F.col(c) == F.col(f"_b_{c}"))
    cand = cand.select("a_id", "b_id")
    joined = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)), ["a_id", "b_id"], "full_outer"
    )
    return joined.agg(
        F.count("t").alias("n_true"),
        F.count("c").alias("n_cand"),
        F.count(F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1)).alias(
            "n_hit"
        ),
    ).select(
        "n_true",
        "n_cand",
        "n_hit",
        F.round(
            F.when(F.col("n_cand") > 0, F.col("n_hit") / F.col("n_cand"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("n_true") > 0, F.col("n_hit") / F.col("n_true"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("recall"),
    )


def _lsh_band_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(id, bk) — one row per LSH band key, the shared front half of
    every minhash path here (same lane construction as
    :func:`minhash_lsh_pairs`)."""
    rows = num_hashes // bands
    sig = (
        df.filter(F.size(T.words(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            T.word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .select("id", T.minhash_sig(F.col("sh"), num_hashes).alias("sig"))
    )
    return sig.select(
        "id", F.explode(T.lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    )


def incremental_minhash_dedup(
    new: DataFrame,
    old: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Flag each NEW document that near-duplicates the EXISTING corpus.

    The daily-ingest shape at 100 TB: dedup a fresh crawl batch against
    an already-deduped corpus WITHOUT re-pairing the corpus with itself.
    Both sides run the same shingle→minhash→band pipeline; a new doc is
    a duplicate iff any of its band keys exists on the old side.  The
    old side collapses to DISTINCT band keys (no payload ever crosses
    the shuffle), the new side left-joins those keys ONCE and folds to
    per-id ``max(hit)`` — the new corpus' expensive minhash subtree
    executes exactly once, and no pair list materializes.  new-vs-new
    collisions are deliberately NOT flagged (run
    :func:`minhash_lsh_pairs` within the batch for that).

    Scale shape: one equi-join keyed on ``bk`` + one agg keyed on id.
    The old side at corpus scale is the big input — its distinct band
    table is the thing to persist (bucketed on ``bk``) between ingests
    so each batch pays only its own minhash pass plus a co-located
    probe.

    Returns one row per new doc that survived the shingle-length
    filter: (id, is_dup).
    """
    new_bands = _lsh_band_table(
        new, text_col, id_col, shingle_n, num_hashes, bands
    )
    old_keys = (
        _lsh_band_table(old, text_col, id_col, shingle_n, num_hashes, bands)
        .select("bk")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        new_bands.join(old_keys, "bk", "left")
        .groupBy("id")
        .agg((F.max(F.coalesce("hit", F.lit(0))) == 1).alias("is_dup"))
        .select("id", "is_dup")
    )
