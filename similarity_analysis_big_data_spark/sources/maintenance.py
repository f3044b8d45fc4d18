"""Table maintenance: small-file compaction for parquet directories.

Streaming sinks, incremental appends, and over-parallel writes all leave
parquet directories with many tiny files; at scale that means scan tasks
dominated by open/footer overhead and pressure on the file listing. This
is the standard offline fix: rewrite the directory as ~target-sized files
and swap it in.

Local-filesystem semantics (the test/dev environment): the swap is two
renames (old -> trash, new -> live), not atomic for concurrent readers —
run it in a maintenance window, same single-writer contract as the
jsonl_dir sink. On an object store you would write the compacted snapshot
to a new prefix and flip a pointer (manifest / metastore location) — the
planning math here is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid


def plan_compaction(path: str, target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Inventory a parquet directory: file count, bytes, and the
    partition count a compacted rewrite should use (>=1)."""
    files = [
        os.path.join(dp, f)
        for dp, _dns, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_partitions": max(1, -(-total // target_bytes)),
    }


def compact_parquet_dir(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` as ~``target_bytes`` parquet files; returns the
    before/after inventory. A directory already at or below the target
    file count is left untouched (no-op dict returned) — compaction that
    rewrites everything to save nothing is pure write amplification.
    """
    before = plan_compaction(path, target_bytes)
    if before["n_files"] <= max(before["target_partitions"], min_files_to_compact - 1):
        return {**before, "compacted": False}

    # A hive-partitioned layout (part=.../ dirs) would be silently
    # flattened by a plain rewrite — partition dirs become inferred data
    # columns with re-inferred types. Refuse rather than corrupt; the
    # partition-preserving rewrite is per-partition compaction, which the
    # caller should drive over the leaf directories (ADVICE r5).
    part_dirs = [
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if part_dirs:
        raise ValueError(
            f"compact_parquet_dir: {path} is hive-partitioned "
            f"({part_dirs[0]}, ...); compact each leaf partition "
            f"directory instead — a flat rewrite would demote partition "
            f"dirs to inferred data columns"
        )

    df = spark.read.parquet(path)
    n_before = df.count()
    tmp = f"{path.rstrip('/')}._compact-{uuid.uuid4().hex[:8]}"
    # repartition (round-robin) gives evenly sized output files; the
    # rewrite preserves rows exactly — schema and values untouched
    df.repartition(before["target_partitions"]).write.mode(
        "overwrite"
    ).parquet(tmp)

    # verify the rewrite BEFORE the destructive swap: a row-count mismatch
    # (partial write, concurrent append) aborts with the original intact
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compact_parquet_dir: rewrite row count {n_after} != "
            f"original {n_before}; original left untouched at {path}"
        )

    trash = f"{path.rstrip('/')}._pre-compact-{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    after = plan_compaction(path, target_bytes)
    return {
        **after,
        "compacted": True,
        "files_before": before["n_files"],
        "rows": n_after,
    }
