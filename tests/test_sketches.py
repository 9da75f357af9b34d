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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _py_cms_bucket(key: str, r: int, w: int = 1024) -> int:
    import hashlib

    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[3 * r:3 * r + 3], 16) % w


def test_cms_matches_python_twin_and_overcounts(spark):
    from collections import Counter

    from legislation_scraper_spark.operators.sketches import cms_counts

    items = (
        ["alpha"] * 50 + ["beta"] * 7 + ["gamma"] * 1
        + [f"noise-{i}" for i in range(3000)]
    )
    df = spark.createDataFrame([(x,) for x in items], "k string")
    probes = ["alpha", "beta", "gamma", "absent"]
    got = {r["key"]: (r["n_exact"], r["est"])
           for r in cms_counts(df, "k", probes).collect()}
    assert set(got) == set(probes)

    # python twin: replay the registers exactly
    regs: Counter = Counter()
    for x in items:
        for r in range(4):
            regs[(r, _py_cms_bucket(x, r))] += 1
    for p in probes:
        exact = items.count(p)
        est = min(regs.get((r, _py_cms_bucket(p, r)), 0) for r in range(4))
        assert got[p] == (exact, est), p
        # CMS guarantee: never undercounts
        assert got[p][1] >= got[p][0], p


def test_cms_register_shuffle_is_bounded(spark):
    # the register build must aggregate map-side: the exchange carries
    # (r, b) partial counts, never raw occurrences
    from legislation_scraper_spark.operators.sketches import cms_counts

    df = spark.range(5000).select(
        F.concat(F.lit("k"), (F.col("id") % 17)).alias("k")
    )
    out = cms_counts(df, "k", ["k1", "k2"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # partial HashAggregate below the exchange on the register build
    assert "HashAggregate" in plan
    # probe-side joins are broadcast (registers are <= d*w rows)
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Histogram quantiles
# ---------------------------------------------------------------------------


def test_hist_quantiles_within_one_bin_of_exact(spark):
    import numpy as np

    from legislation_scraper_spark.operators.sketches import hist_quantiles

    vals = [float(i % 997) for i in range(10000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["q"]: r for r in
            hist_quantiles(df, "v", lo=0.0, hi=1000.0, bins=500).collect()}
    arr = np.sort(np.array(vals))
    for q, r in rows.items():
        exact = arr[min(len(arr) - 1, int(np.ceil(q * len(arr))) - 1)]
        assert r["n"] == len(vals)
        # estimate = right bin edge -> within one bin width above exact
        assert 0 <= r["est"] - exact <= 2.0, (q, r["est"], exact)


def test_hist_quantiles_clamps_out_of_range(spark):
    from legislation_scraper_spark.operators.sketches import hist_quantiles

    df = spark.createDataFrame(
        [(-50.0,), (0.0,), (5.0,), (999.0,), (10_000.0,)], "v double"
    )
    rows = {r["q"]: r for r in
            hist_quantiles(df, "v", lo=0.0, hi=100.0, bins=100,
                           qs=(0.01, 0.99)).collect()}
    # out-of-range values land in the edge bins, never drop
    assert all(r["n"] == 5 for r in rows.values())
    assert rows[0.01]["bin"] == 0
    assert rows[0.99]["bin"] == 99
