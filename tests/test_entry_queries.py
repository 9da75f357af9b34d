"""Oracle-parity tests mirroring the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin on DuckDB at sf0.001 (fast) — the same compare
(row count, column names, order-insensitive values) the driver applies
at sf0.01.

Two tiers (pytest.ini): the 11 bench-headline queries run in the
default suite so every test run exercises the driver contract; the
full 205-query sweep is the ``oracle_sweep`` mark
(``pytest -m oracle_sweep``) — split out per the r4 verdict so the
default tier stays under 10 minutes.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
import bench
from tests.conftest import SF_SMALL, compare_query

NAMES = sorted(entry_mod.queries())
HEADLINE = set(bench.HEADLINE)


@pytest.mark.parametrize("name", sorted(HEADLINE))
def test_headline_matches_oracle(spark, name):
    compare_query(spark, name, SF_SMALL)


@pytest.mark.oracle_sweep
@pytest.mark.parametrize("name", [n for n in NAMES if n not in HEADLINE])
def test_query_matches_oracle(spark, name):
    compare_query(spark, name, SF_SMALL)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["host", "url", "priority", "host_rank"]


def test_oracle_keys_subset():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle-only keys: {o - q}"
