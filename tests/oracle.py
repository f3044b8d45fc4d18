"""Local mirror of the driver's DuckDB correctness gate.

Runs a registered Spark query and its oracle SQL side by side and compares
row count, column names, **pandas dtypes** (the driver records schema — an
int32/int64 skew between Spark and DuckDB is a real mismatch even when the
values print identically), and exact values after sorting columns by name
and rows by value.
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return conn


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols]
    if len(out):
        out = out.sort_values(cols, na_position="last", kind="mergesort")
    return out.reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, (
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = _norm(spark_pdf), _norm(oracle_pdf)
    dt_a, dt_b = [str(t) for t in a.dtypes], [str(t) for t in b.dtypes]
    if dt_a != dt_b:
        diff = [
            f"{c}: spark={x} oracle={y}"
            for c, x, y in zip(a.columns, dt_a, dt_b)
            if x != y
        ]
        return False, f"dtype mismatch: {diff}"
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        sample = []
        for idx in a.index[bad][:5]:
            sample.append((tuple(a.loc[idx]), tuple(b.loc[idx])))
        return False, f"value mismatch, first diffs (spark, oracle): {sample}"
    return True, "ok"
