"""Smoke tests for the driver contract in __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable, named schema


def test_queries_and_oracles_align(spark):
    q = e.queries()
    o = e.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle key must have a query
    assert set(o) <= set(q)


def test_all_queries_execute_at_smoke_scale(spark, sf_smoke):
    for name, fn in e.queries().items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name
