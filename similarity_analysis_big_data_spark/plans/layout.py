"""Z-order data layout (north-star [ext]): multi-dimensional clustering
for scan pruning.

Parquet scans prune files and row groups by column min/max statistics. A
sort on one column makes ONE column's stats tight; interleaving the bits
of two quantized key columns (Morton / Z-order curve) makes BOTH columns'
stats tight at once, so predicates on either key — or both — skip most of
a 100 TB table. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, expressed here as plain Catalyst bit arithmetic + a
range-partitioned, sorted parquet write. No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register

Z_BITS = 8  # bits kept per dimension (16-bit z-value)


def zorder_key(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: Morton code.

    Pure integer arithmetic — codegen'd JVM-side, no UDF: bit i of x lands
    at position 2i, bit i of y at 2i+1.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_key_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB rendering of :func:`zorder_key` for oracle construction."""
    terms = [
        f"(({x} >> {i}) & 1) * {1 << (2 * i)} + (({y} >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(
    df: DataFrame, x_col: str, y_col: str, path: str, n_files: int = 8
) -> None:
    """Write ``df`` parquet, Z-order-clustered on (x_col, y_col).

    ``repartitionByRange`` on the z-value splits the curve into contiguous
    segments (one per output file) and ``sortWithinPartitions`` orders rows
    along the curve inside each, so every file covers a small rectangle of
    (x, y) space — min/max stats on BOTH columns stay tight and predicates
    on either prune files. The z column itself is dropped before write; it
    is layout, not data.
    """
    keyed = df.withColumn("_z", zorder_key(F.col(x_col), F.col(y_col)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "zorder_key_events",
    oracle=f"""
        SELECT event_id, user_id,
               {zorder_key_sql(f"user_id % {1 << Z_BITS}",
                               f"CAST(floor(value * 10) AS BIGINT) % {1 << Z_BITS}")} AS zval
        FROM events
    """,
    doc="[ext] Z-order (Morton) clustering key over (user_id, value): bit "
    "interleaving of two quantized dimensions as pure Catalyst integer "
    "arithmetic — the multi-dimensional sort key behind ZORDER table "
    "layout; the full key assignment is oracle-checked bit-for-bit.",
)
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the key is a narrow map (no shuffle here); the layout write
    (write_zordered, tested in tests/test_sources.py) adds ONE range
    shuffle at write time and repays it on every subsequent scan that
    filters either dimension — same amortization argument as bucketing,
    but for range predicates on two axes at once."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % (1 << Z_BITS)).cast("integer")
    # floor (not cast) before quantizing: double->int casts truncate in
    # Spark but round in DuckDB; floor agrees everywhere for value >= 0
    y = (F.floor(F.col("value") * 10).cast("integer") % (1 << Z_BITS)).cast(
        "integer"
    )
    return ev.select(
        "event_id", "user_id", zorder_key(x, y).alias("zval")
    )
