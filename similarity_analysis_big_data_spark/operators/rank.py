"""Exact distributed ranking — row_number/ntile without a global window.

``row_number() OVER (ORDER BY k)`` (no PARTITION BY) funnels the whole
relation through one partition. The exact distributed equivalent used
across the repo (stable_doc_reindex, quantile normalize, gini, RFM):

1. B approximate percentile boundaries of the order key (GK sketch —
   mergeable, cardinality-bounded state) — one aggregate, broadcast as
   an array literal;
2. bucket id per row = #boundaries strictly below the key — a map-only
   JVM-side column, monotone in the key, so bucket order IS key order
   and equal keys share a bucket;
3. per-bucket counts -> exclusive cumulative offsets, computed on the
   DRIVER from the collected ``|partitions| * B``-row count relation
   (bounded by construction — same posture as operators/reindex.py; the
   machinery is only ever needed when partition_cols are few or absent,
   since high-cardinality partitions already parallelize a plain
   partitioned window) and broadcast back;
4. ``row_number`` windows PARTITIONED by bucket, plus the broadcast
   offset -> the exact global rank. No unpartitioned window exists at
   any size.

Equal-key runs share a bucket (bounded skew: a single massively-repeated
key value degrades one bucket — the documented trade for exactness of
the RANKS, which never depend on where the boundaries land).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def percentile_bounds(
    df: DataFrame, key: str, n_buckets: int, accuracy: int = 10_000
) -> list[float]:
    """Approximate percentile boundaries of ``key`` via the mergeable
    Greenwald-Khanna sketch (``approx_percentile``). Boundaries set only
    the bucket LOAD BALANCE — rank/running-sum values come from the
    per-bucket windows plus exact per-bucket offsets — so approximation
    can never change an output value (property-tested:
    tests/test_operators.py asserts rank equality between exact- and
    approx-boundary runs). Unlike exact ``percentile``, whose final
    buffer is a per-distinct-value counts map merged on one reducer
    (O(|distinct|) driver-adjacent state on a high-cardinality double
    key), the GK sketch is bounded by ``accuracy`` regardless of
    cardinality. Returns [] on an empty input — callers degrade to a
    single bucket."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    if not qs:
        return []
    row = df.agg(
        F.expr(
            f"approx_percentile(cast({key} as double), "
            f"array({', '.join(str(q) for q in qs)}), {accuracy})"
        ).alias("bs")
    ).collect()[0]
    if row["bs"] is None:
        return []
    return sorted(set(float(b) for b in row["bs"]))


def bucket_of(key: str, bounds: list[float]) -> Column:
    """#bounds strictly below the key — broadcast-literal fold, map-only."""
    if not bounds:  # empty input / n_buckets=1 → single bucket
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.aggregate(
        F.filter(arr, lambda b: b < F.col(key)),
        F.lit(0),
        lambda acc, _: acc + 1,
    )


def _join_offsets(d: DataFrame, off: DataFrame, keys: list[str]) -> DataFrame:
    """Broadcast-join the bounded per-(group, bucket) offset relation back
    onto the data on null-safe equality. ``groupBy`` keeps a NULL
    partition value as a real group, so a plain equi-join here would
    silently drop every row of that group (the window-form equivalent
    keeps them) — ``eqNullSafe`` matches the NULL group back up while
    still planning as a BroadcastHashJoin (ADVICE r5)."""
    o = off
    for k in keys:
        o = o.withColumnRenamed(k, f"_o_{k}")
    cond = d["_bkt"] == o["_o__bkt"]
    for k in keys:
        if k != "_bkt":
            cond = cond & d[k].eqNullSafe(o[f"_o_{k}"])
    return d.join(F.broadcast(o), cond).drop(*[f"_o_{k}" for k in keys])


def bucketed_row_number(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    rank_name: str = "rnk",
    n_name: str | None = None,
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = 32,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Adds ``rank_name`` = the exact 1-based row_number under
    ``ORDER BY key, *tiebreaks`` within each ``partition_cols`` group
    (global when empty), and optionally ``n_name`` = the group's total
    row count — no unpartitioned window ever touches ``df``-sized data.

    ``key`` must be numeric and ascending; rank a descending numeric key
    by negating it into a helper column. ``(key, *tiebreaks)`` must be a
    total order within each group for a deterministic result.
    """
    if bounds is None:
        bounds = percentile_bounds(df, key, n_buckets)
    d = df.withColumn("_bkt", bucket_of(key, bounds))

    pcols = list(partition_cols)
    cnt = d.groupBy(*pcols, "_bkt").agg(F.count("*").alias("_n"))
    off = _exclusive_offsets(cnt, pcols, "_n", "_off", "_tot")
    w_rn = W.partitionBy(*pcols, "_bkt").orderBy(key, *tiebreaks)
    out = _join_offsets(
        d.withColumn("_rb", F.row_number().over(w_rn)), off, [*pcols, "_bkt"]
    ).withColumn(rank_name, F.col("_off") + F.col("_rb"))
    if n_name is not None:
        out = out.withColumn(n_name, F.col("_tot"))
    return out.drop("_bkt", "_rb", "_off", "_tot")


def _exclusive_offsets(cnt, pcols, val: str, off_name: str, tot_name: str):
    """Collect the bounded per-(group, bucket) subtotal relation and
    rebuild it with exclusive-cumulative offsets and group totals —
    driver-side arithmetic over <= |groups| * B rows, re-entering the
    plan as a broadcast literal relation (zero window nodes)."""
    rows = cnt.collect()
    rows.sort(key=lambda r: (tuple(str(r[c]) for c in pcols), r["_bkt"]))
    # Seed the accumulator with a zero of the VALUE column's Python type:
    # createDataFrame rejects int 0 for a DoubleType/DecimalType offset
    # column (running sums over float/decimal values).
    val_dt = dict((f.name, f.dataType) for f in cnt.schema.fields)[val]
    kind = val_dt.simpleString()
    if kind in ("double", "float"):
        zero: object = 0.0
    elif kind.startswith("decimal"):
        from decimal import Decimal

        zero = Decimal(0)
    else:
        zero = 0
    acc: dict = {}
    totals: dict = {}
    out_rows = []
    for r in rows:
        g = tuple(r[c] for c in pcols)
        out_rows.append((*g, r["_bkt"], acc.get(g, zero)))
        acc[g] = acc.get(g, zero) + r[val]
        totals[g] = acc[g]
    out_rows = [
        (*row[:-1], row[-1], totals[row[: len(pcols)]]) for row in out_rows
    ]
    schema = cnt.select(*pcols, "_bkt").schema
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    val_type = dict(
        (f.name, f.dataType.simpleString()) for f in cnt.schema.fields
    )[val]
    spark = cnt.sparkSession
    return spark.createDataFrame(
        out_rows, f"{fields}, {off_name} {val_type}, {tot_name} {val_type}"
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """The SQL-standard NTILE(k) bucket from an exact 1-based rank and the
    partition row count: the first ``n % k`` buckets get ``n div k + 1``
    rows, the rest ``n div k`` — identical in Spark and DuckDB, restated
    arithmetically so no global window is needed."""
    q = F.floor(n / k)
    r = n - q * k
    size1 = q + 1
    in_big = rank <= size1 * r
    # ceil(a/b) for positive ints = floor((a-1)/b) + 1; greatest() guards
    # the (unreachable when q=0) small-bucket branch against div-by-zero
    big = F.floor((rank - 1) / size1) + 1
    small = r + F.floor((rank - size1 * r - 1) / F.greatest(q, F.lit(1))) + 1
    return F.when(in_big, big).otherwise(small).cast("long")


def bucketed_running_sum(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    value: str,
    sum_name: str = "running_sum",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = 32,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Adds ``sum_name`` = the running sum of ``value`` under
    ``ORDER BY key, *tiebreaks`` within each ``partition_cols`` group
    (global when empty) — the cumulative-total twin of
    ``bucketed_row_number``: per-bucket value sums cumulative-summed into
    offsets (windows over the bounded count relation), within-bucket
    running sums partitioned by bucket. Use an exact-sum type (decimal /
    integer) for ``value`` when cross-run bit-equality matters: bucket
    subtotals aggregate in partition order, which for floats can differ
    from a sequential scan in the last ulp.
    """
    if bounds is None:
        bounds = percentile_bounds(df, key, n_buckets)
    d = df.withColumn("_bkt", bucket_of(key, bounds))

    pcols = list(partition_cols)
    bsum = d.groupBy(*pcols, "_bkt").agg(F.sum(value).alias("_bs"))
    off = _exclusive_offsets(bsum, pcols, "_bs", "_voff", "_vtot").drop("_vtot")
    w_run = (
        W.partitionBy(*pcols, "_bkt")
        .orderBy(key, *tiebreaks)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _join_offsets(
            d.withColumn("_rs", F.sum(value).over(w_run)), off, [*pcols, "_bkt"]
        )
        .withColumn(sum_name, F.col("_voff") + F.col("_rs"))
        .drop("_bkt", "_rs", "_voff")
    )


def bucketed_running_max(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    value: str,
    max_name: str = "running_max",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = 32,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Adds ``max_name`` = the running maximum of ``value`` under
    ``ORDER BY key, *tiebreaks`` within each ``partition_cols`` group
    (global when empty) — the max twin of ``bucketed_running_sum``:
    per-bucket maxima become exclusive PREFIX maxima on the driver
    (bounded relation), broadcast back, and greatest()-merged with the
    within-bucket running max. Exact for any orderable value type; max
    is order-insensitive so there is no float-ulp caveat here.
    """
    if bounds is None:
        bounds = percentile_bounds(df, key, n_buckets)
    d = df.withColumn("_bkt", bucket_of(key, bounds))

    pcols = list(partition_cols)
    bmax = d.groupBy(*pcols, "_bkt").agg(F.max(value).alias("_bm"))
    rows = bmax.collect()
    rows.sort(key=lambda r: (tuple(str(r[c]) for c in pcols), r["_bkt"]))
    acc: dict = {}
    out_rows = []
    for r in rows:
        g = tuple(r[c] for c in pcols)
        out_rows.append((*g, r["_bkt"], acc.get(g)))  # None = no prior bucket
        prev = acc.get(g)
        # a bucket whose values are all NULL aggregates to a NULL max —
        # it must not clobber (or crash against) the carried prefix
        if r["_bm"] is not None and (prev is None or r["_bm"] > prev):
            acc[g] = r["_bm"]
    schema = bmax.select(*pcols, "_bkt").schema
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    val_type = dict(
        (f.name, f.dataType.simpleString()) for f in bmax.schema.fields
    )["_bm"]
    spark = bmax.sparkSession
    off = spark.createDataFrame(out_rows, f"{fields}, _pmax {val_type}")

    w_run = (
        W.partitionBy(*pcols, "_bkt")
        .orderBy(key, *tiebreaks)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _join_offsets(
            d.withColumn("_rm", F.max(value).over(w_run)), off, [*pcols, "_bkt"]
        )
        .withColumn(max_name, F.greatest(F.col("_rm"), F.col("_pmax")))
        .drop("_bkt", "_rm", "_pmax")
    )
