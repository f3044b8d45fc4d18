"""Pipeline observability via ``DataFrame.observe`` (north-star [ext]).

A 100 TB curation job needs row-level health metrics (rows seen, nulls,
filter pass-rates) — but a separate ``count()`` per metric re-reads the
input. ``observe`` attaches aggregate metrics to the EXISTING plan: they
are computed inline by the same tasks that run the query and surface after
any action, costing zero extra passes. This is the distributed twin of the
reference's driver-side counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_corpus_health(
    df: DataFrame, content_col: str, name: str = "corpus_health"
) -> tuple[DataFrame, Observation]:
    """Attach corpus-health metrics to a document relation.

    Returns (df, observation); after the caller runs ANY action on a plan
    containing ``df``, ``observation.get`` yields::

        rows_seen    — documents that flowed through this point
        null_content — rows whose content column is NULL/empty
        total_chars  — summed content length (size-accounting / cost model)

    The metrics ride the action's own tasks — no second pass, no extra job.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(
            F.when(
                F.col(content_col).isNull() | (F.length(content_col) == 0), 1
            ).otherwise(0)
        ).alias("null_content"),
        F.sum(F.coalesce(F.length(content_col), F.lit(0))).alias("total_chars"),
    )
    return observed, obs
