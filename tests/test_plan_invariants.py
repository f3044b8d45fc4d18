"""Registry-wide physical-plan invariants.

The targeted plan tests in test_plans.py pin specific shapes (broadcast
dims, partial aggs, bucket-partitioned windows, TakeOrderedAndProject).
This module sweeps EVERY registered query's executed plan for the
defects that are never acceptable at 100 TB regardless of the query:

- ``CartesianProduct``: an unconstrained all-pairs join. Range/theta
  joins in the repo compile to BroadcastNestedLoopJoin with a bounded
  broadcast side, never to a shuffle cartesian; anything that reaches
  CartesianProduct is a missing join key or a dropped broadcast hint.

Plans are built at the smoke scale (plan shape is size-independent; the
driver-side collects some plans perform — percentile bounds, vocab
artifacts — are bounded there by construction).
"""

from __future__ import annotations

from similarity_analysis_big_data_spark.plans import registry

registry._load_all()

# Queries allowed to contain a node, with the reason — empty today; add
# entries ONLY with a docstring-level justification in the query itself.
CARTESIAN_ALLOWED: dict[str, str] = {}


def test_no_query_compiles_to_cartesian_product(spark, sf_smoke):
    offenders = {}
    for name, spec in registry.QUERIES.items():
        plan = (
            spec.fn(spark, sf_smoke)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan and name not in CARTESIAN_ALLOWED:
            offenders[name] = [
                line.strip()[:120]
                for line in plan.splitlines()
                if "CartesianProduct" in line
            ]
    assert not offenders, f"cartesian joins crept in: {offenders}"


def test_every_query_survives_empty_tables(spark, tmp_path_factory):
    """Robustness sweep: every registered query must execute (not
    necessarily return rows) against schema-identical EMPTY tables — the
    first-day-of-ingest / filtered-to-nothing production edge. r5 fixed
    7 crashers (ANSI zero divisions, None-typed empty aggregates,
    0-d numpy stats, 1/|V| seeds); this pins all of them."""
    import glob
    import os

    import duckdb

    empty_dir = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        name = os.path.basename(p)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{p}') LIMIT 0) "
            f"TO '{empty_dir}/{name}' (FORMAT PARQUET)"
        )
    con.close()

    failures = {}
    for name, spec in registry.QUERIES.items():
        try:
            spec.fn(spark, empty_dir).collect()
        except Exception as e:  # noqa: BLE001 - we want the full inventory
            failures[name] = f"{type(e).__name__}: {e}"[:160]
    assert not failures, f"queries crashing on empty input: {failures}"
