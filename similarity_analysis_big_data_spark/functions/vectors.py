"""Dense-vector column math over ``array<float>`` (north-star [ext]).

All built-in higher-order functions (``zip_with``/``aggregate``) — JVM-side,
no UDF, no MLlib Vector conversion. Elements are cast to double *before*
multiplication so results are reproducible against any double-math oracle
(float32 intermediate products would diverge in the last bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i in double precision, folded in index order."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); NULL when either vector has zero norm (never NaN/Inf)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


# DuckDB oracle renderings of the same math (double casts mirror the Spark
# side exactly).
DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)


def dot_sql(a: str, b: str) -> str:
    return DOT_SQL.format(a=a, b=b)


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
    )
