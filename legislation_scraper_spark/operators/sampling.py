"""Deterministic, engine-neutral sampling.

``df.sample()`` is seed-and-partitioning dependent — rerun the job
with a different partition layout and you get a different sample,
which breaks resumable pipelines, cross-engine oracles, and any
"recompute the eval on the same sample" workflow.  Everything here
derives membership from the ROW KEY via md5 (computed identically by
every engine, same trick as ``operators/sketches``): a row is in or
out of the sample as a pure function of its key and the salt, no
matter the cluster size, partitioning, or execution order.

Reference anchor: the reference scraper has no sampling stage (it
scrapes exhaustively); this module exists for the eval/curation tier
this engine adds — quadratic ground-truth evals
(``dedup.lsh_pair_eval``), per-language mixture rebalancing, and
debug slices at 100 TB, where "deterministic 1-in-k of each stratum"
is the only sample you can reproduce next week.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Buckets per key — 4 md5 nibbles.  16-bit space keeps the DuckDB
#: twin a 4-character hex fold while giving 0.0015% rate granularity.
BUCKETS = 1 << 16


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Engine-neutral bucket in ``[0, BUCKETS)``: first 4 hex chars of
    ``md5(salt || key)`` parsed base-16 — byte-identical in Spark and
    DuckDB (both hash the UTF-8 string)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    key_col: str,
    stratum_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    key's bucket falls under its stratum's rate — ``bucket(key) <
    rate * BUCKETS``.  ``rates`` is ``(stratum, rate)`` with rate in
    [0, 1]; strata absent from ``rates`` are DROPPED (rate 0), the
    conservative default for an allowlist-style mixture spec.

    Used for mixture rebalancing (downsample the head language the way
    CC-derived corpora cut English before training) and for carving
    reproducible eval slices: membership depends only on (salt, key),
    so a 1000-executor rerun, a repartitioned rerun, and the DuckDB
    oracle all select the SAME rows.  Nested rates compose: a 10%
    sample with salt A then 50% with salt B is a reproducible 5%.

    Scale: the rate table is mixture config (≤ thousands of rows) —
    broadcast inner join, zero shuffle on the fact side; the bucket
    predicate is pure JVM codegen.  No window, no per-stratum count
    pass: exact-count stratified sampling needs a rank per stratum,
    Bernoulli-by-hash needs nothing — at 10^10 rows the law of large
    numbers closes the gap while keeping the plan map-only.
    """
    r = rates.select(
        F.col(rates.columns[0]).alias("_stratum"),
        F.col(rates.columns[1]).cast("double").alias("_rate"),
    )
    keep = sample_bucket(F.col(key_col), salt) < F.col("_rate") * BUCKETS
    return (
        df.join(
            F.broadcast(r),
            df[stratum_col] == r["_stratum"],
            "inner",
        )
        .filter(keep)
        .drop("_stratum", "_rate")
    )


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    stratum_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted top-k sample per stratum (A-ES).

    Efraimidis & Spirakis (IPL 2006): draw u ~ U(0,1] per row and keep
    the k largest ``u^(1/w)`` — exactly a weighted sample WITHOUT
    replacement, in one pass, mergeable across partitions.  Here u is
    md5-derived from the row key (same engine-neutral discipline as
    :func:`sample_bucket`), so the selected set is a pure function of
    (keys, weights, salt): reruns, repartitions, and the DuckDB oracle
    agree row-for-row.

    Plan: in-row key computation + one per-stratum top-k window.  The
    map-side WindowGroupLimit pushes ``rank <= k`` below the sort, so
    no stratum's full population ever sorts on one task.  Rows with
    weight <= 0 never qualify.  Returns the input columns plus
    ``es_key`` (rounded 6dp) and ``sample_rank``.
    """
    from pyspark.sql import Window

    # u in (0,1]: (first 8 md5 nibbles + 1) / 2^32
    u = (
        F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    es = F.when(weight > 0, F.pow(u, 1.0 / weight)).otherwise(F.lit(None))
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("_es").desc(), key.cast("string")
    )
    return (
        df.withColumn("_es", es)
        .filter(F.col("_es").isNotNull())
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .withColumn("es_key", F.round(F.col("_es"), 6))
        .drop("_es")
    )
