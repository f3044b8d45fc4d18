"""Output connectors (SURVEY.md §2.1 S3-S5).

The reference forces single-file output via ``coalesce(1, shuffle=True)`` /
``repartition(1)`` (``lab2.py:307, 312-313``) — a single-writer bottleneck
at scale. Here ``single_file`` is an explicit opt-in reserved for provably
tiny results; the default keeps the writer parallel and lets the caller
partition output tables by natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _maybe_coalesce(df: DataFrame, single_file: bool) -> DataFrame:
    return df.coalesce(1) if single_file else df


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    single_file: bool = False,
) -> None:
    """Parquet sink (S4). ``partition_by`` enables partition pruning for readers."""
    writer = _maybe_coalesce(df, single_file).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink (S5) — replaces the reference's driver-side pandas.to_csv (lab2.py:331-332)."""
    _maybe_coalesce(df, single_file).write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """Line-delimited JSON sink."""
    _maybe_coalesce(df, single_file).write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    single_file: bool = False,
) -> None:
    """ORC sink ([ext]) — the second columnar format; same pushdown/pruning
    contract as parquet for warehouses standardized on ORC."""
    writer = _maybe_coalesce(df, single_file).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    *bucket_cols: str,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed parquet table ([ext] — the co-located-join scale path).

    Both sides of a recurring large⋈large join written with the same
    ``bucketBy(n, key)`` (+ ``sortBy`` for merge-join readiness) join with
    ZERO exchanges: the shuffle is paid once at write time and amortized
    over every subsequent join/aggregate on the key — at 100 TB that is the
    difference between one shuffle per query and none. Registered through
    the session catalog (``saveAsTable``) because bucket metadata lives in
    the catalog, not in the parquet files.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)  # external table: data outside the warehouse
    writer.saveAsTable(table)


def write_text(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = True) -> None:
    """Text sink (S3) — replaces rdd.saveAsTextFile (lab2.py:307).

    Expects a single string column named ``value``; defaults to one file
    because the reference used it only for a one-row accuracy tuple.
    """
    _maybe_coalesce(df, single_file).write.mode(mode).text(path)


def compact_parquet(spark, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` part files and return the file count before rewrite.

    Scale: small files are the silent killer of 100 TB scans (one task +
    one footer fetch per file); periodic compaction to ~128-512 MB targets
    restores scan locality. ``coalesce`` (no shuffle) merges partitions
    for the write; the atomic swap is write-new + move, so a failed
    rewrite never harms the live data.
    """
    import glob
    import os
    import shutil

    before = len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "._compact_bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return before


def read_with_schema_evolution(spark, *paths: str):
    """Union parquet directories written under EVOLVED schemas (columns
    added over time) into one DataFrame: ``mergeSchema`` unifies the
    footer schemas and fills missing columns with NULL.

    Scale: schema merging reads every file footer up front — fine per
    ingest batch, pathological across a million historical files; at
    100 TB pin the merged schema in a catalog and pass it explicitly
    (``.schema(...)``), keeping this reader for schema DISCOVERY jobs.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """XML sink ([ext]) — Spark 4's built-in StAX XML source (the former
    spark-xml package, upstreamed); the interchange format feeds/archives
    still arrive in."""
    _maybe_coalesce(df, single_file).write.mode(mode).format("xml").option(
        "rowTag", row_tag
    ).save(path)
