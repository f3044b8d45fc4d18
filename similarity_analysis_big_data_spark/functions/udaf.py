"""Grouped-aggregate pandas UDF surface (SURVEY §2.10 U2 [ext]).

The engine's stance is built-in aggregates first; this module is the
sanctioned escape hatch for aggregations Catalyst can't express — one
Arrow-vectorized GROUPED_AGG pandas UDF per custom statistic, never
row-at-a-time Python.

``geometric_mean`` is the worked example: no built-in equivalent, but the
log-space formulation means it COULD be exp(avg(ln x)) — the unit test
pins the UDF against exactly that identity, which is also how the
rows-only registered query stays honest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def geometric_mean_udf(v: pd.Series) -> float:
    """GROUPED_AGG: geometric mean of positive values (NaN if none)."""
    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


def geometric_mean(col: Column | str) -> Column:
    return geometric_mean_udf(F.col(col) if isinstance(col, str) else col)
