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
