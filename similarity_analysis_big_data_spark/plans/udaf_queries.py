"""Registered queries exercising the custom-UDAF surface (SURVEY §2.10 U2).

The geometric mean has a closed SQL form (exp(avg(ln x))) — so even the
pandas-UDF aggregation path gets a real DuckDB oracle: the UDF must agree
with the identity to 6 decimals, per group, on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udaf import geometric_mean
from ..sources.readers import load_table
from .registry import register


@register(
    "geometric_mean_by_type",
    oracle="""
        SELECT event_type,
               round(exp(avg(ln(value))), 6) AS geo_mean_value
        FROM events WHERE value > 0
        GROUP BY event_type
    """,
    doc="[ext] §2.10 U2: custom aggregation as an Arrow GROUPED_AGG pandas UDF "
    "(geometric mean), oracle-checked via the exp(avg(ln)) identity.",
)
def geometric_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: GROUPED_AGG pandas UDFs get partial aggregation per Arrow batch
    only when the planner can split them — this one ships whole groups, so
    at 100 TB pre-aggregate per partition first or use the SQL identity;
    the UDF form exists for statistics with no closed form."""
    # note: GROUPED_AGG pandas UDFs cannot mix with built-in aggregates in
    # one agg() — keep the UDF alone (INVALID_PANDAS_UDF_PLACEMENT otherwise)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geometric_mean("value"), 6).alias("geo_mean_value"),
    )
