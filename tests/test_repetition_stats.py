"""repetition_stats (Gopher-style top token / top bigram share) — exact
DuckDB parity on the documents table, same compare as the driver's gate."""

from __future__ import annotations

from geospatial_spark.operators import textstats as ts

from .conftest import SF_SMOKE, duck_con, rows_of_duck, rows_of_spark


def test_repetition_stats_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = rows_of_spark(ts.repetition_stats(docs))
    con = duck_con(SF_SMOKE)
    want = rows_of_duck(con, ts.repetition_stats_sql())
    assert got, "no documents with >= 2 tokens — vacuous"
    assert got == want
