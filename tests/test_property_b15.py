"""Differential property tests for the batch-14/15 column kernels:
random inputs checked against independent straight-line Python
implementations.  Examples are BATCHED into one DataFrame per
hypothesis call (a Spark job per example would be 100x slower)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from legislation_scraper_spark.functions.urls import (
    PUBLIC_SUFFIXES,
    registrable_domain,
)

label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

hostname = st.builds(
    lambda labels, suffix: ".".join(labels + ([suffix] if suffix else [])),
    st.lists(label, min_size=1, max_size=4),
    st.one_of(st.sampled_from(PUBLIC_SUFFIXES), st.just(""), label),
)


def _psl_fold_py(host: str) -> str:
    """Independent straight-line PSL longest-match fold."""
    parts = host.lower().split(".")
    best = None
    for s in PUBLIC_SUFFIXES:
        sp = s.split(".")
        if len(parts) > len(sp) and parts[-len(sp):] == sp:
            if best is None or len(sp) > len(best):
                best = sp
    if best is not None:
        return ".".join(parts[-(len(best) + 1):])
    if len(parts) > 1:
        return ".".join(parts[-2:])  # implicit-* rule
    return parts[0]


@settings(max_examples=4, deadline=None)
@given(st.lists(hostname, min_size=1, max_size=150))
def test_registrable_domain_matches_straightline_psl(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    for h in set(hosts):
        assert got[h] == _psl_fold_py(h), h


token = st.text(
    alphabet="abcdefghij", min_size=1, max_size=5
)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(token, min_size=2, max_size=6),  # base tokens
            st.integers(min_value=0, max_value=5),    # edit position seed
            st.sampled_from(["sub", "del", "two_edits"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_dust_rules_recover_planted_single_edits(spark, cases):
    """Every single-token substitution/deletion pair yields exactly its
    rule; every two-edit pair yields nothing.  Checked via per-digest
    isolation (one case per digest) against a straight-line predictor."""
    from legislation_scraper_spark.operators.dust import dust_rules

    rows, expected = [], {}
    for i, (toks, pos_seed, kind) in enumerate(cases):
        digest = f"d{i}"
        a = "/".join(toks)
        p = pos_seed % len(toks)
        if kind == "sub":
            bt = list(toks)
            bt[p] = bt[p] + "x"  # guaranteed-different token
            b = "/".join(bt)
            expected[digest] = (
                max(toks[p], bt[p]), min(toks[p], bt[p]),
            )
        elif kind == "del":
            bt = [t for j, t in enumerate(toks) if j != p]
            b = "/".join(bt)
            # deletion is detected iff removing the FIRST mismatching
            # token of the long side yields the short side; with
            # repeated tokens the first mismatch may come earlier but
            # removal there still works (e.g. a/a/b drop first a ->
            # a/b).  The rule token = long[first_mismatch].
            la, lb = toks, bt
            d = next(
                (k for k in range(len(lb)) if la[k] != lb[k]), len(lb)
            )
            if la[:d] + la[d + 1:] == lb:
                expected[digest] = (la[d], "")
            else:
                expected[digest] = None
        else:  # two edits -> no rule
            if len(toks) < 3:
                continue
            bt = list(toks)
            bt[0] = bt[0] + "x"
            bt[-1] = bt[-1] + "y"
            b = "/".join(bt)
            expected[digest] = None
        rows += [(digest, a), (digest, b)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "digest string, url string")
    # min_support=1: each digest holds exactly one pair
    got = {}
    out = dust_rules(df, min_support=1).collect()
    # rules aggregate ACROSS digests; rebuild per-rule support
    support = {}
    for r in out:
        support[(r["rule_from"], r["rule_to"])] = r["support"]
    want = {}
    for rule in expected.values():
        if rule is not None:
            want[rule] = want.get(rule, 0) + 1
    assert support == want
