"""Every registered query with an oracle must match DuckDB bit-for-bit
(after each query's own rounding) at the driver's correctness scale.

This is the local twin of the driver's CORRECTNESS_r{N}.json gate.
"""

from __future__ import annotations

import pytest

from similarity_analysis_big_data_spark.plans import registry

from .oracle import compare, duckdb_conn

# Two-tier invocation (VERDICT r6 item 4): this module is the bulk of
# the suite's wall time (~260 params). Per-commit fast tier skips it
# with `pytest tests/ -m "not parity"`; the default/CI run keeps it.
pytestmark = pytest.mark.parity

registry._load_all()
_ORACLE_QUERIES = sorted(n for n, s in registry.QUERIES.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in registry.QUERIES.items() if s.oracle is None)


@pytest.fixture(scope="module")
def conn(sf_oracle):
    c = duckdb_conn(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, sf_oracle, conn, name):
    spec = registry.QUERIES[name]
    spark_df = spec.fn(spark, sf_oracle)
    oracle_pdf = conn.execute(spec.oracle).fetchdf()
    ok, msg = compare(spark_df, oracle_pdf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_oracle, name):
    spec = registry.QUERIES[name]
    assert spec.fn(spark, sf_oracle).count() >= 0
