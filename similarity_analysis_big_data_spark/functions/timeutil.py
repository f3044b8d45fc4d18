"""Wall-clock-safe timestamp arithmetic.

The fixture parquet stores ``TIMESTAMP(NANOS, isAdjustedToUTC=false)``;
Spark 4.1+ reads that natively as ``TIMESTAMP_NTZ`` (µs-truncated), and the
DuckDB oracle reads the same files as naive timestamps. ``unix_micros``/
``unix_timestamp`` reject or TZ-shift NTZ values, so epoch math here is
expressed as ``timestampdiff`` against an NTZ epoch literal — pure
wall-clock arithmetic, identical on any session time zone, and exactly
DuckDB's ``epoch_us(ts)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros_between(start: Column | str, end: Column | str) -> Column:
    """Microseconds from ``start`` to ``end`` (both TIMESTAMP or
    TIMESTAMP_NTZ), time-zone independent."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.timestamp_diff("MICROSECOND", s, e)


def epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds of an NTZ (or TZ) timestamp as wall-clock-UTC —
    the Spark twin of DuckDB ``epoch_us(ts)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), c)
