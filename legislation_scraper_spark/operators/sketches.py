"""Cardinality sketches — HyperLogLog with cross-engine-deterministic
bit extraction.

A 10^10-URL frontier needs distinct counts (seen URLs, vocab size,
host fan-out) without a count-distinct shuffle of the full key set.
Spark ships `approx_count_distinct`, but its register layout is
engine-private — no independent system can check it.  This HLL is
built from md5 (which every engine computes identically), so DuckDB
can replay the EXACT register state and estimate, making the sketch
oracle-checkable, not just plausible:

- **hash** = hex md5 of the key.  Bucket = first 3 hex chars (p = 12,
  m = 4096 registers).  Rank window = next 13 hex chars (52 bits).
- **rank** (leading-zero count + 1) is computed on the HEX STRING:
  each leading '0' char is 4 zero bits; the first non-zero hex digit
  adds 0-3 more by its high bits.  Pure string algebra — identical in
  any engine, no 64-bit unsigned arithmetic anywhere.
- **harmonic sum in fixed point**: sum over registers of
  2^(50 - min(rank, 50)) as BIGINT (≤ 4096·2^50 < 2^63 — exact), so
  the aggregate is integer-exact and order-independent; floats appear
  only in the final one-division estimate.  This is what makes the
  estimate bit-reproducible across engines — a double harmonic sum
  would be summation-order-dependent.
- **small-range correction** (Flajolet et al. 2007 §4): linear
  counting m·ln(m/V) when the raw estimate < 2.5m and V empty
  registers remain.

Scale shape: one map-side-combinable groupBy(bucket) over ≤ m rows per
partition, then a 4096-row final agg.  The shuffle moves O(m) rows no
matter the input size — the whole point of a sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_BITS = 12
M = 1 << P_BITS          # 4096 registers
RANK_CAP = 50            # fixed-point exponent cap: 4096·2^50 < 2^63
WINDOW = 13              # hex chars of rank window (52 bits)
ALPHA_M = 0.7213 / (1.0 + 1.079 / M)


def hll_register(col: Column) -> tuple[Column, Column]:
    """(bucket, rank) register coordinates for one key."""
    h = F.md5(col.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    w = F.substring(h, 4, WINDOW)
    trimmed = F.regexp_replace(w, "^0+", "")
    lz = F.length(w) - F.length(trimmed)
    first = F.substring(trimmed, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first == "", 0)  # all-zero window; lz already = 4*WINDOW
        .otherwise(0)
    )
    rank = lz * 4 + extra + 1
    return bucket, rank


def hll_cardinality(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame: exact distinct count (for reference),
    register-state integers, and the HLL estimate.

    Columns: ``n_exact`` bigint, ``m`` int, ``v_empty`` bigint (empty
    registers), ``s_fixed`` bigint (fixed-point harmonic sum), ``est``
    double rounded to 2dp (corrected estimate actually used).
    """
    bucket, rank = hll_register(F.col(col))
    regs = (
        df.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("mr"))
    )
    # 2^(50-mr) as bigint: exact — pow of two up to 2^50 is an exact
    # double, and the cast truncates nothing
    term = F.pow(
        F.lit(2.0),
        (F.lit(RANK_CAP) - F.least(F.col("mr"), F.lit(RANK_CAP)))
        .cast("double"),
    ).cast("bigint")
    agg = regs.agg(
        F.count("*").alias("n_buckets"),
        F.sum(term).alias("s_used"),
    )
    exact = df.agg(F.count_distinct(F.col(col)).alias("n_exact"))
    out = agg.crossJoin(exact).select(
        "n_exact",
        F.lit(M).alias("m"),
        (F.lit(M) - F.col("n_buckets")).cast("bigint").alias("v_empty"),
        (
            F.col("s_used")
            + (F.lit(M) - F.col("n_buckets")).cast("bigint")
            * F.lit(1 << RANK_CAP)
        ).alias("s_fixed"),
        "n_buckets",
    )
    raw = (
        F.lit(ALPHA_M * M * M)
        * F.pow(F.lit(2.0), F.lit(RANK_CAP))
        / F.col("s_fixed").cast("double")
    )
    v = F.col("v_empty").cast("double")
    corrected = F.when(
        (raw < 2.5 * M) & (F.col("v_empty") > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v),
    ).otherwise(raw)
    return out.select(
        "n_exact", "m", "v_empty", "s_fixed",
        F.round(corrected, 2).alias("est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — frequency estimation with the same cross-engine
# register discipline as the HLL above.
# ---------------------------------------------------------------------------

CMS_D = 4                # hash rows
CMS_W = 1024             # buckets per row


def cms_buckets(col: Column, d: int = CMS_D, w: int = CMS_W) -> list[Column]:
    """Row-i bucket = (3 hex chars of md5 starting at 1+3i) mod w —
    d independent-enough hash rows, every engine computes them
    identically (md5 + substring + base-16 digits)."""
    h = F.md5(col.cast("string"))
    return [
        (F.conv(F.substring(h, 1 + 3 * i, 3), 16, 10).cast("int") % w)
        for i in range(d)
    ]


def cms_counts(
    df: DataFrame,
    col: str,
    probes: list[str],
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Count-Min frequency estimates for ``probes`` over ``df[col]``.

    Output: one row per probe — ``(key, n_exact, est)`` with the CMS
    guarantee ``est >= n_exact`` (collisions only ever ADD).

    Scale shape: the register build explodes each occurrence into its
    ``d`` (row, bucket) cells, but the groupBy's map-side partial
    aggregation caps every partition's exchange contribution at
    ``d x w`` rows — the shuffle is O(d·w), input-size-independent,
    the same property as the HLL.  The probe-side estimate joins the
    ≤ d·w register rows (broadcast) against the literal probe set and
    takes ``min`` per key — no second pass over the data.
    """
    c = F.col(col)
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("r"), b.alias("b"))
            for i, b in enumerate(cms_buckets(c, d, w))
        ]
    )
    regs = (
        df.select(F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    spark = df.sparkSession
    pr = spark.createDataFrame([(p,) for p in probes], "key string")
    pr_cells = pr.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), b.alias("b"))
                    for i, b in enumerate(
                        cms_buckets(F.col("key"), d, w)
                    )
                ]
            )
        ).alias("rb"),
    ).select("key", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        pr_cells.join(F.broadcast(regs), ["r", "b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("est"))
    )
    exact = (
        df.filter(c.isin(probes))
        .groupBy(c.alias("key"))
        .agg(F.count("*").cast("bigint").alias("n_exact"))
    )
    return (
        est.join(F.broadcast(exact), "key", "left")
        .select(
            "key",
            F.coalesce("n_exact", F.lit(0)).cast("bigint").alias("n_exact"),
            "est",
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles — the quantile member of the sketch
# family (HLL = distinct, CMS = frequency, histogram = quantiles).
# ---------------------------------------------------------------------------


def hist_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1024,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from a fixed-bin histogram.

    ``approx_percentile``'s sketch is engine-private; this histogram is
    plain integer binning, so an independent engine replays the EXACT
    bin counts and estimates.  Output: one row per requested quantile —
    ``(q, n, bin, est)`` where ``bin`` is the smallest bin whose
    cumulative count reaches ``ceil(q*n)`` and ``est`` its right edge.

    Scale shape: the only data-sized operation is the bin groupBy,
    whose map-side partial aggregation caps the exchange at ``bins``
    rows per partition; the cumulative window and the quantile probe
    run over ≤ ``bins`` rows (the documented bounded-frame exception
    to the no-global-window rule).  Estimate error is bounded by one
    bin width — callers pick (lo, hi, bins) from schema knowledge.
    """
    from pyspark.sql import Window

    step = (hi - lo) / bins
    v = F.col(col).cast("double")
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((v - F.lit(lo)) / F.lit(step)).cast("int")
        ),
    )
    h = df.select(b.alias("bin")).groupBy("bin").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.withColumn("cum", F.sum("c").over(w)).crossJoin(
        F.broadcast(h.agg(F.sum("c").cast("bigint").alias("n")))
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = qdf.join(
        F.broadcast(cum),
        F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        "left",
    )
    return (
        hit.groupBy("q")
        .agg(
            F.max("n").alias("n"),
            F.min("bin").alias("bin"),
        )
        .select(
            "q",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            "bin",
            F.round(
                F.lit(lo) + (F.col("bin") + 1) * F.lit(step), 6
            ).alias("est"),
        )
    )


def psi_report(
    df: DataFrame,
    ts_col: str = "ts",
    cat_col: str = "event_type",
    ndigits: int = 6,
) -> DataFrame:
    """Population-stability-index drift report: the event stream is
    split at the midpoint of its time range and each category's share
    is compared across the two halves — the standard
    data-quality/monitoring statistic for detecting distribution
    drift between crawl (or training-data) snapshots before it
    poisons downstream mixtures.

    Per category ``psi_term = (p2 − p1)·ln(p2/p1)`` with add-one
    (Laplace) smoothed shares ``p_i = (c_i + 1)/(n_i + K)`` (``K`` =
    number of categories), so never-seen-in-one-half categories stay
    finite and both engines evaluate the identical branch-free
    expression.  Σ psi_term < 0.1 is the conventional "stable" bar.

    Determinism: the split predicate is INTEGER microsecond
    arithmetic (``2·us ≤ min_us + max_us``) — no float midpoint, no
    timestamp-cast precision loss.

    Scale: one (category) aggregation with conditional sums (single
    pass over the stream, map-side combine); the time range and the
    category count ride 1-row broadcast crossJoins.  Category
    cardinality is the output size — a drift report is small by
    construction.
    """
    # parquet may surface TIMESTAMP_NTZ; the split predicate is
    # shift-invariant (2·us ≤ min+max), so the cast's timezone offset
    # cancels exactly
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rng = df.agg(
        F.min(us).alias("min_us"), F.max(us).alias("max_us")
    )
    halves = (
        df.crossJoin(F.broadcast(rng))
        .select(
            F.col(cat_col).alias("cat"),
            (us * 2 <= F.col("min_us") + F.col("max_us")).alias("h1"),
        )
        .groupBy("cat")
        .agg(
            F.sum(F.when(F.col("h1"), 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("h1"), 0).otherwise(1)).alias("c2"),
        )
    )
    tot = halves.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.count("*").cast("double").alias("k_cats"),
    )
    p1 = (F.col("c1") + 1) / (F.col("n1") + F.col("k_cats"))
    p2 = (F.col("c2") + 1) / (F.col("n2") + F.col("k_cats"))
    return (
        halves.crossJoin(F.broadcast(tot))
        .select(
            F.col("cat").alias(cat_col),
            "c1",
            "c2",
            F.round(p1, ndigits).alias("p1"),
            F.round(p2, ndigits).alias("p2"),
            F.round((p2 - p1) * F.log(p2 / p1), ndigits).alias("psi_term"),
        )
    )


def _hll_estimate(nb: Column, su: Column) -> tuple[Column, Column, Column]:
    """(v_empty, s_fixed, est) from used-register count + used-register
    fixed-point sum — the shared tail of hll_cardinality/hll_cumulative."""
    v_empty = (F.lit(M) - nb).cast("bigint")
    s_fixed = su + v_empty * F.lit(1 << RANK_CAP)
    raw = (
        F.lit(ALPHA_M * M * M)
        * F.pow(F.lit(2.0), F.lit(RANK_CAP))
        / s_fixed.cast("double")
    )
    v = v_empty.cast("double")
    corrected = F.when(
        (raw < 2.5 * M) & (v_empty > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v),
    ).otherwise(raw)
    return v_empty, s_fixed, F.round(corrected, 2)


def hll_cumulative(
    df: DataFrame, col: str, day_col: str = "day"
) -> DataFrame:
    """Cumulative-distinct growth curve via HLL register merge.

    The mergeability demo: per-day register states (max rank per
    bucket) OR together by plain max, so the as-of-day-d estimate
    is computable from day summaries alone — the incremental-ingest
    shape (yesterday's registers + today's batch; never re-scan the
    corpus).  Same md5 register discipline as :func:`hll_cardinality`,
    so DuckDB replays the exact state.

    Plan: one (day, bucket) agg over the input — the only exchange
    that sees input-cardinality rows; from there everything operates
    on register space (≤ days·m rows): a broadcast ≤-day range join
    fans registers to the as-of days, then per-day register agg.  The
    exact reference curve comes from first-day-per-key (one key agg)
    rolled forward the same way.

    Returns (day, n_exact, v_empty, s_fixed, est) — one row per
    distinct day, curve non-decreasing.
    """
    bucket, rank = hll_register(F.col(col))
    regs = (
        df.select(
            F.col(day_col).alias("day"),
            bucket.alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("mr"))
    )
    days = regs.select("day").distinct().withColumnRenamed("day", "as_of")
    cum = (
        regs.join(F.broadcast(days), F.col("day") <= F.col("as_of"))
        .groupBy("as_of", "bucket")
        .agg(F.max("mr").alias("mr"))
    )
    term = F.pow(
        F.lit(2.0),
        (F.lit(RANK_CAP) - F.least(F.col("mr"), F.lit(RANK_CAP)))
        .cast("double"),
    ).cast("bigint")
    agg = cum.groupBy("as_of").agg(
        F.count("*").alias("nb"), F.sum(term).alias("su")
    )
    firsts = (
        df.select(F.col(col).alias("k"), F.col(day_col).alias("day"))
        .groupBy("k")
        .agg(F.min("day").alias("fd"))
        .groupBy("fd")
        .agg(F.count("*").alias("nf"))
    )
    exact = (
        firsts.join(F.broadcast(days), F.col("fd") <= F.col("as_of"))
        .groupBy("as_of")
        .agg(F.sum("nf").alias("n_exact"))
    )
    v_empty, s_fixed, est = _hll_estimate(F.col("nb"), F.col("su"))
    return (
        agg.join(exact, "as_of")
        .select(
            F.col("as_of").alias("day"),
            "n_exact",
            v_empty.alias("v_empty"),
            s_fixed.alias("s_fixed"),
            est.alias("est"),
        )
    )
