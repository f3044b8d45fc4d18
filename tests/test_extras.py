"""Tests for milestone-5 surfaces: skew helpers, stateful streaming, heatmap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from similarity_analysis_big_data_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from similarity_analysis_big_data_spark.sources.readers import load_table
from similarity_analysis_big_data_spark.streaming.events import read_event_stream
from similarity_analysis_big_data_spark.streaming.stateful import running_user_totals


def test_salted_aggregate_equals_plain(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = salted_aggregate(
        ev,
        ["event_type"],
        partial_aggs=[F.count("*").alias("n"), F.sum("value").alias("s")],
        merge_aggs=[F.sum("n").alias("n"), F.sum("s").alias("s")],
    )
    got = {
        r["event_type"]: (r["n"], round(r["s"], 6)) for r in salted.collect()
    }
    assert got == plain


def test_salted_join_equals_plain(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_smoke, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        "k",
        n_salts=8,
    ).count()
    assert salted == plain


def test_stateful_running_totals_matches_batch(spark, sf_smoke):
    stream = read_event_stream(spark, sf_smoke)
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM stateful_totals"
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # single availableNow batch -> one update row per user, equal to batch agg
    assert got == batch


def test_heatmap_render_or_clean_gate(spark, sf_smoke, tmp_path_factory):
    from similarity_analysis_big_data_spark.plans.heatmap import render_heatmap
    from similarity_analysis_big_data_spark.plans.registry import QUERIES, _load_all

    _load_all()
    pivot = QUERIES["category_matrix_pivot"].fn(spark, sf_smoke)
    out = tmp_path_factory.mktemp("viz") / "heatmap.png"
    try:
        path = render_heatmap(pivot, str(out))
    except NotImplementedError:
        # The skip is legitimate ONLY when the dependency is truly absent
        # (no pip install allowed in this environment); if matplotlib is
        # importable the gate must not fire and this test must render.
        with pytest.raises(ImportError):
            import matplotlib  # noqa: F401
        pytest.skip("matplotlib not provisioned — gate raised cleanly")
    import os

    assert os.path.getsize(path) > 1000


def test_connected_components_and_survivors(spark):
    from similarity_analysis_big_data_spark.operators.components import (
        connected_components,
        dedup_survivors,
    )

    # two components {1,2,3,9} (chain) and {5,6}; 7, 8 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6)], ["id_l", "id_r"]
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame([(i, f"doc{i}") for i in [1, 2, 3, 5, 6, 7, 8, 9]], ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in dedup_survivors(docs, pairs, "doc_id").collect())
    assert kept == [1, 5, 7, 8]  # component minima + isolated docs


def test_connected_components_distributed_path_matches_driver_finish(spark, monkeypatch):
    """Both CC finishes — the distributed contraction rounds and the
    small-remainder driver union-find — must produce identical labels.
    A long chain (worst case for contraction depth) plus a clique, run
    with the driver finish disabled (threshold 0) and enabled."""
    import similarity_analysis_big_data_spark.operators.components as C

    chain = [(i, i + 1) for i in range(40)]  # 0-1-2-...-40
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    pairs = spark.createDataFrame(chain + clique, ["id_l", "id_r"])

    with_finish = {
        r["id"]: r["component"] for r in C.connected_components(pairs).collect()
    }
    monkeypatch.setattr(C, "_DRIVER_FINISH_MAX_EDGES", 0)
    distributed = {
        r["id"]: r["component"] for r in C.connected_components(pairs).collect()
    }
    expected = {i: 0 for i in range(41)} | {100 + i: 100 for i in range(6)}
    assert with_finish == expected
    assert distributed == expected


def test_connected_components_string_ids_propagation_path(spark, monkeypatch):
    """String-id graphs through the PROPAGATION loop (driver finish
    disabled): the label-sum fixpoint witness must use the overflow-safe
    decimal hash sum — summing raw xxhash64 values as bigint overflows
    under Spark 4's ANSI default almost surely past a handful of labels
    (ADVICE r5: components.py _label_sum)."""
    import similarity_analysis_big_data_spark.operators.components as C

    # 50+ distinct string labels in play: a 50-node chain plus a clique
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(50)]
    clique = [
        (f"z{i}", f"z{j}") for i in range(5) for j in range(i + 1, 5)
    ]
    pairs = spark.createDataFrame(chain + clique, ["id_l", "id_r"])
    monkeypatch.setattr(C, "_DRIVER_FINISH_MAX_EDGES", 0)
    got = {
        r["id"]: r["component"]
        for r in C.connected_components(pairs).collect()
    }
    expected = {f"n{i:03d}": "n000" for i in range(51)} | {
        f"z{i}": "z0" for i in range(5)
    }
    assert got == expected


def test_streaming_dedup_drops_duplicates(spark, sf_smoke):
    from similarity_analysis_big_data_spark.streaming.dedup import dedup_event_stream

    stream = read_event_stream(spark, sf_smoke)
    q = (
        dedup_event_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT digest) AS d FROM dedup_stream").collect()[0]
    assert got["n"] == got["d"]  # no duplicate digests survive
    assert 0 < got["n"] <= 1000
