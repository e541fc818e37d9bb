"""Mimics the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01; compare row count, column names,
and order-insensitive values."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_ORACLE, duck_con, rows_of_duck, rows_of_spark

QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_ORACLE)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check
        return
    got = rows_of_spark(df, ndigits=9)
    con = duck_con(SF_ORACLE)
    want = rows_of_duck(con, oracles[name], ndigits=9)
    assert sorted(c.lower() for c in df.columns) == sorted(
        c.lower() for c in con.sql(oracles[name]).columns
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    if got != want:
        diff_a = [r for r in got if r not in set(want)][:5]
        diff_b = [r for r in want if r not in set(got)][:5]
        raise AssertionError(f"{name}: value mismatch\n spark-only={diff_a}\n duck-only={diff_b}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"url", "entity", "lat", "lon", "region_id"}
