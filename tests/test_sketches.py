"""HyperLogLog sketch (operators/sketches.py)."""

import hashlib

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.sketches import (
    M,
    WINDOW,
    hll_cardinality,
    hll_register,
)


def _py_register(key: str):
    h = hashlib.md5(key.encode()).hexdigest()
    bucket = int(h[:3], 16)
    w = h[3:3 + WINDOW]
    trimmed = w.lstrip("0")
    lz = len(w) - len(trimmed)
    first = trimmed[:1]
    extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
        first, 0
    )
    return bucket, lz * 4 + extra + 1


def test_register_matches_python_twin(spark):
    keys = [f"url-{i}-ção" for i in range(200)] + ["", "a", " ", "0" * 40]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    b, r = hll_register(F.col("k"))
    got = df.select("k", b.alias("b"), r.alias("r")).collect()
    for row in got:
        assert (row.b, row.r) == _py_register(row.k), row.k
    assert all(0 <= row.b < M for row in got)


def test_estimate_accuracy_both_branches(spark):
    # linear-counting regime (n << m) and raw-HLL regime (n > 2.5m)
    for n, tol in ((500, 0.05), (40000, 0.05)):
        df = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k")
        )
        r = hll_cardinality(df, "k").collect()[0]
        assert r.n_exact == n
        assert abs(r.est - n) / n < tol, (n, r.est)


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    dup = base.union(base).union(base)
    a = hll_cardinality(base, "k").collect()[0]
    b = hll_cardinality(dup, "k").collect()[0]
    assert (a.s_fixed, a.v_empty, a.est) == (b.s_fixed, b.v_empty, b.est)
