"""As-of join: each left row gets the latest right row with
``right.ts <= left.ts`` within its key group.

Spark has no native ASOF JOIN (DuckDB/Pandas do); a naive theta join
(``l.ts >= r.ts`` + window) explodes to O(|L|·|R|) per key.  This
implementation is the standard union-and-carry construction — ONE
shuffle on the join key, linear work:

1. tag right rows (payload) and left rows (null payload), union;
2. sort each key group by (ts, side) — right rows first at equal ts so
   a left row sees a same-timestamp right row (ASOF's ``>=``);
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   running window carries the latest right payload forward;
4. keep only left rows.

Training-data pipelines use this shape to align events with the most
recent metadata/dimension snapshot (model version, doc revision, price)
without a point-in-time dimension table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: all ``left`` columns plus, for each value column
    ``v`` of ``right``, ``asof_v`` = the value from the latest right row
    at or before the left row's timestamp (null if none).

    ``right`` must be unique per (by, ts) — pre-aggregate otherwise.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, ts_col)
    ]
    payload = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),  # right sorts first at equal ts (>=)
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, ts_col)],
    )
    l = left.select(
        F.col(by),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left.columns if c not in (by, ts_col)],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_carry", F.last("_p", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_carry.{v}").alias(f"asof_{v}") for v in value_cols],
    )
    return out
