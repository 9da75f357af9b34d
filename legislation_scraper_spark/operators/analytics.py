"""Event-sequence analytics: ordered funnels and cohort retention.

The crawl/curation engine's event log (fetch → parse → extract →
publish per URL, or user events in the synthetic ``events`` table) is
a classic event stream; the two queries every event pipeline grows are
the ORDERED funnel (how many subjects reach stage k, in order) and the
cohort-retention matrix (of the subjects first seen in week w, how
many were active w+k).  Both are here as one-shuffle plans.

Scale notes:
- ``funnel_stages`` does ONE groupBy on the subject key; the ordered
  stage walk is an in-row fold over the subject's time-sorted event
  types (per-subject event counts are bounded in practice — a crawl
  URL has a handful of lifecycle events), so no window, no self-join,
  no per-stage pass.  The final stage histogram is a ≤ n_stages-row
  agg.
- ``cohort_retention`` is two aggs sharing the subject-key
  partitioning: first-seen per subject, then (cohort week, offset)
  distinct counts.  The cohort dim re-join is subject-keyed and
  co-partitioned with the first agg's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: subjects reaching each stage prefix.

    A subject reaches stage k iff its event stream contains
    ``stages[0] … stages[k-1]`` in time order (classic windowless
    ordered-funnel semantics; events of other types interleave
    freely).  Returns one row per stage:
    (stage_idx, stage, n_users, conversion) where conversion is
    n_users / stage-1 reach, rounded to 6dp.

    Plan: one subject-keyed groupBy collecting (ts, type) structs —
    the only exchange — then an in-row fold over the time-sorted
    array advancing a stage cursor, then a tiny stage histogram agg
    (≤ len(stages) rows) with the prefix sums computed by a second
    in-row pass over the collected histogram (1-row frame).
    """
    ev = events.filter(
        F.col(type_col).isin(*stages)
    ).select(
        F.col(user_col).alias("uid"),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")).alias("e"),
    )
    stage_arr = F.array(*[F.lit(s) for s in stages])
    per_user = ev.groupBy("uid").agg(
        F.aggregate(
            F.array_sort(F.collect_list("e")),
            F.lit(0),
            lambda acc, e: F.when(
                (acc < F.lit(len(stages)))
                & (e["et"] == F.get(stage_arr, acc)),
                acc + 1,
            ).otherwise(acc),
        ).alias("stage_reached")
    )
    hist = per_user.groupBy("stage_reached").agg(
        F.count("*").alias("n")
    )
    # prefix-sum the tiny histogram in one row: reach(k) = Σ n[j≥k]
    packed = hist.agg(
        F.collect_list(F.struct("stage_reached", "n")).alias("h")
    )
    reach = packed.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(len(stages))),
                lambda k: F.struct(
                    k.alias("stage_idx"),
                    F.aggregate(
                        F.filter(F.col("h"), lambda s: s["stage_reached"] >= k),
                        F.lit(0).cast("bigint"),
                        lambda acc, s: acc + s["n"],
                    ).alias("n_users"),
                ),
            )
        ).alias("r")
    ).select("r.stage_idx", "r.n_users")
    prev = reach.select(
        (F.col("stage_idx") + 1).alias("stage_idx"),
        F.col("n_users").alias("prev_users"),
    )
    return (
        reach.join(prev, "stage_idx", "left")
        .select(
            "stage_idx",
            F.get(stage_arr, F.col("stage_idx") - 1).alias("stage"),
            "n_users",
            F.round(
                F.when(
                    F.coalesce("prev_users", F.lit(0)) > 0,
                    F.col("n_users") / F.col("prev_users"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix.

    Cohort = ISO week of the subject's first event; a subject is
    retained at offset k if it has any event in cohort-week + k.
    Returns (cohort_week DATE, week_offset, n_users, retention) with
    retention = n_users / cohort size (offset-0 row), rounded 6dp.

    Plan: min-ts per subject (agg 1), distinct (subject, week) activity
    re-joined on the subject key (co-partitioned with agg 1's output —
    one partitioning serves both), then the (cohort, offset) count
    (agg 2, output rows = weeks²) and a broadcast of the offset-0
    cohort sizes for the rate.
    """
    first = events.groupBy(F.col(user_col).alias("uid")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col).alias("uid"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        )
        .distinct()
    )
    cells = (
        active.join(first, "uid")
        .groupBy(
            "cohort_week",
            ((F.datediff("week", "cohort_week") / 7).cast("int")).alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("uid").alias("n_users"))
    )
    base = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return cells.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
    )
