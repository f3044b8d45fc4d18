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
        pytest.skip("matplotlib not provisioned — gate raised cleanly")
    import os

    assert os.path.getsize(path) > 1000
