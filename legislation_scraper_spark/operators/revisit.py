"""Revisit scheduling — per-URL change-rate estimation from capture
history (the incremental-crawl freshness tier).

A 10^10-URL frontier cannot re-fetch everything each cycle; the
standard solution (Cho & Garcia-Molina, "Estimating frequency of
change", ACM TOIT 3(3) 2003) models each page as a Poisson process and
estimates its change rate from the capture history the CDX index
already carries (``sources/cdx.py``): n observation intervals, X of
which showed a digest change, give the bias-corrected estimator

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / avg_interval

and the expected staleness after a horizon h is ``1 - exp(-lambda*h)``
— the revisit priority.  The reference repo re-crawls every source
unconditionally each run (its only freshness signal is the ``situation``
column diff); this operator is the scale replacement.

Spark-first & scale notes:
- ONE shuffle total: the ``groupBy(key)``.  The capture history is
  ordered IN-ROW (``array_sort`` over collected (ts, digest) structs)
  rather than with a window — no second Exchange, no per-key sort
  spill, and the adjacent-change count is a codegen higher-order
  ``filter``/``transform`` fold, never Python.
- The collected history per URL is bounded by the index's capture
  retention (Common Crawl keeps ~O(10) captures per monthly index;
  curated rollups keep fewer), so the in-row array is small by
  construction.  For an adversarial unbounded history, pre-truncate
  with ``latest_captures``-style max_by sampling before calling this.
- Outputs are rounded to 6dp (repo convention for float aggregates) so
  Spark/DuckDB double-sum order differences cannot flip parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SECS_PER_DAY = 86400


def change_rates(
    captures: DataFrame,
    key: str = "urlkey",
    ts_col: str = "ts",
    digest_col: str = "digest",
    horizon_days: float = 7.0,
) -> DataFrame:
    """Per-``key`` Poisson change-rate estimate from capture history.

    Input: one row per capture with (key, ts_col: timestamp,
    digest_col: string).  Output: one row per key with ≥2 captures and
    a positive time span —
    (key, n_captures, n_changes, span_secs, lambda_per_day,
    staleness): ``lambda_per_day`` is the estimated changes/day,
    ``staleness`` the probability the page changed within
    ``horizon_days`` of the last capture.  Keys with a single capture
    or zero span carry no rate information and are dropped (callers
    schedule those by default priority).
    """
    hist = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                F.col(digest_col).alias("digest")))
    )
    g = (
        captures.groupBy(F.col(key).alias("k"))
        .agg(hist.alias("h"))
        .select(
            "k",
            F.size("h").cast("bigint").alias("n_captures"),
            # adjacent-digest change count over the sorted history:
            # X = |{ i in 1..n-1 : h[i].digest != h[i-1].digest }|
            # guarded: sequence(1, 0) is DESCENDING in Spark and ANSI
            # mode errors on out-of-bounds subscripts, so single-capture
            # histories short-circuit to 0 before the fold
            F.expr(
                "cast(case when size(h) < 2 then 0 else"
                " size(filter(sequence(1, size(h) - 1),"
                " i -> h[i].digest != h[i-1].digest)) end as bigint)"
            ).alias("n_changes"),
            (
                F.unix_timestamp(F.element_at("h", -1).getField("ts"))
                - F.unix_timestamp(F.element_at("h", 1).getField("ts"))
            ).alias("span_secs"),
        )
        .filter((F.col("n_captures") >= 2) & (F.col("span_secs") > 0))
    )
    n = (F.col("n_captures") - 1).cast("double")  # observation intervals
    x = F.col("n_changes").cast("double")
    avg_iv_days = F.col("span_secs") / n / F.lit(float(SECS_PER_DAY))
    lam = -F.log((n - x + 0.5) / (n + 0.5)) / avg_iv_days
    return g.select(
        F.col("k").alias(key),
        "n_captures",
        "n_changes",
        "span_secs",
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(1.0 - F.exp(-lam * F.lit(float(horizon_days))), 6).alias(
            "staleness"
        ),
    )


def revisit_priorities(
    rates: DataFrame,
    budget: int,
    key: str = "urlkey",
) -> DataFrame:
    """Top-``budget`` keys by staleness (tie-broken by key for
    determinism) — the fetch list for the next incremental cycle.
    ``orderBy().limit()`` compiles to TakeOrderedAndProject (partial
    per-partition top-k, no global sort), the same pattern the IVF
    centroid pick uses."""
    return (
        rates.orderBy(F.col("staleness").desc(), F.col(key))
        .limit(budget)
        .select(key, "staleness", "lambda_per_day")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Cross-crawl snapshot diff: classify every URL seen in either
    crawl as ``added`` (new only), ``removed`` (old only), ``changed``
    (both, different payload digest) or ``unchanged`` — the incremental
    view a recrawl pipeline feeds to revisit scheduling (changed →
    raise the change-rate estimate) and to dataset builds (added/
    changed are the only rows worth re-extracting).

    Plan shape / scale: ONE full-outer equi-join on the URL key,
    shuffling (url, digest) pairs only — never payloads.  At the
    10^10-URL tier both snapshot tables live bucketed by url hash
    (Iceberg bucket partitioning, the repo-wide frontier convention),
    making this join co-located and shuffle-free; digests are compared
    JVM-side, no Python.
    """
    o = old.select(F.col(key).alias(key), F.col(digest_col).alias("old_digest"))
    n = new.select(F.col(key).alias(key), F.col(digest_col).alias("new_digest"))
    return o.join(n, key, "full_outer").select(
        key,
        "old_digest",
        "new_digest",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def saturation_curve(
    df: DataFrame,
    key_col: str,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Discovery-saturation curve: per key, the count of NEW entities
    first seen each day and the cumulative total — the
    diminishing-returns signal a crawl scheduler reads to throttle
    exhausted hosts (new-URL yield per crawl day flattening ⇒ the
    host's reachable set is saturated; cf. the frontier-yield plots in
    the IRLbot and ClueWeb crawl reports) and a budget input to
    :func:`~.politeness.allocate_budgets`.

    Plan: first-seen day per (key, entity) is ONE partial-aggregated
    groupBy (min over the date — entities pre-combine map-side);
    per-day counts ride the same exchange's second agg, and the
    cumulative sum is a per-key window over the DAY-level rollup —
    O(days) rows per key, never O(events), so the window sort is over
    a tiny frame even for a 10^10-event log.
    """
    first = df.groupBy(
        F.col(key_col).alias("key"), F.col(entity_col).alias("entity")
    ).agg(F.min(F.to_date(F.col(ts_col))).alias("day"))
    daily = first.groupBy("key", "day").agg(
        F.count("*").alias("new_entities")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn(
        "cum_entities", F.sum("new_entities").over(w)
    )
