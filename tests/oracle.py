"""Local mirror of the driver's DuckDB correctness gate.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and values after the same normalization
the driver applies (columns sorted by name, rows order-insensitive). Used
by test_oracle_parity.py so hash mismatches are caught before the driver
runs.
"""

from __future__ import annotations

import math

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


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    # floats in query outputs are pre-rounded by the queries
                    # themselves; repr() makes residual representation
                    # differences visible instead of hiding them
                    canon_row.append(repr(float(v)))
            elif v is None or v is pd.NaT:
                canon_row.append("NULL")
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, f"schema mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs (spark, oracle): {diffs}"
    return True, "ok"
