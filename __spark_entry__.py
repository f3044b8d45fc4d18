"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 as a named
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each SQL-expressible query. All three are
thin views over ``similarity_analysis_big_data_spark.plans.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from similarity_analysis_big_data_spark.plans import registry  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
# The reference's own domain: Task-1 retrieval (TF-IDF + sparse cosine join
# + deterministic arg-max) over the documents corpus.
_FLAGSHIP = "title_best_abstract"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.query_map()[_FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omissions get a rows-only check."""
    return registry.oracle_sql_map()
