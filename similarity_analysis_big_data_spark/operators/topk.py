"""Distributed global top-N with ranks — no unbounded single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the ENTIRE
relation to one partition before ranking (Spark warns ``WindowExec: No
Partition Defined``) — fine on 500 rows, fatal on a web-scale term or
bigram table. When only the top N survive the rank filter, the right plan
is ``ORDER BY ... LIMIT N``, which Spark compiles to
``TakeOrderedAndProject``: each task keeps a local N-row heap, the driver
merges per-task heaps — O(N) memory per task, no full shuffle, no global
sort. Ranks are then a window over the already-N-bounded result, where a
single partition of N = O(constant) rows is exactly right.

Mirrors the reference's top-k result presentation (lab2.py Task 1/2 final
ordering) re-expressed for distributed execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_top_n(
    df: DataFrame,
    order: list[Column],
    n: int,
    rank_name: str | None = "rnk",
) -> DataFrame:
    """Top ``n`` rows of ``df`` under ``order`` (must be a total order for
    a deterministic result), optionally with a 1-based ``rank_name`` column.

    Compiles to TakeOrderedAndProject (distributed partial top-k); the rank
    window runs on at most ``n`` rows.
    """
    top = df.orderBy(*order).limit(n)
    if rank_name is None:
        return top
    rnk = F.row_number().over(Window.orderBy(*order)).cast("long")
    return top.withColumn(rank_name, rnk)
