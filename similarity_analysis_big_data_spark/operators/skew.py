"""Skew mitigation helpers (SURVEY §4.2 / scale notes).

AQE's skew-join split handles most runtime skew; these helpers cover the
cases AQE can't re-plan:

- ``salted_aggregate``: two-phase aggregation for a hot-key groupBy —
  phase 1 aggregates on (key, salt) spreading a hot key over N reducers,
  phase 2 merges the partials. Correct for any algebraic aggregate
  expressed as (partial_exprs, merge_exprs).
- ``salted_join``: replicate the small side N ways and salt the big side
  so one hot key fans across N tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — used only as a partitioning
    aid; never appears in results."""
    return df.withColumn(col_name, (F.rand(seed=42) * n_salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase hot-key aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs`` combine
    the partials per key. Example for a sum+count (mean):
        partial: [sum(x).alias("s"), count(*).alias("c")]
        merge:   [sum("s").alias("s"), sum("c").alias("c")]
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side, explode the
    small side across all salt values, join on (key, salt).

    The small side grows n_salts×, the hot key's rows spread across
    n_salts tasks. Prefer broadcast when small fits; this is for the
    mid-size dimension that is too big to broadcast but joins a skewed fact.
    """
    big_salted = with_salt(big, n_salts)
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")
