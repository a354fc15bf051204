"""Warehouse layout maintenance (SURVEY.md §4.3).

Two layout levers a 100 TB warehouse lives or dies by:

- ``write_partitioned``: hive-style partition directories so date/key
  predicates prune entire directories at planning time (PartitionFilters
  in the scan — zero I/O for untouched partitions).
- ``compact``: small-file compaction. Streaming/incremental ingest leaves
  many ~KB files; scans then pay per-file open cost and lose row-group
  statistics. Rewriting a partition into ~target-size files restores scan
  efficiency. Idempotent per run (rewrite-then-swap within one call).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout parquet write; partition columns become directories."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ⌈size/target⌉ files.

    Returns (files_before, files_after). The rewrite goes through a temp
    directory then swaps, so a crash mid-compaction leaves the original
    data intact. At real scale this runs per-partition (compact only the
    partitions whose small-file count crossed a threshold), driven by the
    same directory listing used here.
    """

    def parquet_files(p: str) -> list[str]:
        return [
            os.path.join(root, f)
            for root, _d, files in os.walk(p)
            for f in files
            if f.endswith(".parquet") or f.startswith("part-")
        ]

    before = parquet_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, -(-total_bytes // target_file_bytes))

    # Temp dir ADJACENT to the target (same parent → same filesystem), so
    # the final os.rename is atomic and can't raise EXDEV the way a /tmp
    # staging dir would when the warehouse lives on another mount.
    parent = os.path.dirname(os.path.abspath(path.rstrip("/"))) or "."
    tmp = tempfile.mkdtemp(prefix="compact_", dir=parent)
    swap = path.rstrip("/") + ".old"
    try:
        (
            spark.read.parquet(path)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(path, swap)
        try:
            os.rename(tmp, path)
        except BaseException:
            # Restore the original so the data path is never left missing.
            os.rename(swap, path)
            raise
        shutil.rmtree(swap)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return len(before), len(parquet_files(path))


def export_sorted_shards(
    df: DataFrame, path: str, sort_col: str, n_shards: int
) -> None:
    """Training-data export: ``n_shards`` parquet files, globally range-
    partitioned and sorted on ``sort_col`` — shard i holds a contiguous,
    internally-sorted key range strictly below shard i+1's.

    ``repartitionByRange`` samples the key distribution (RangePartitioning
    exchange) so shards are balanced even under key skew, unlike a
    hash-modulo split; ``sortWithinPartitions`` then sorts each shard
    without any global merge. At 100 TB this is the layout that lets a
    training loader stream shards independently in key order and lets
    min/max row-group statistics prune point lookups — and it's exactly
    the plan shape of Spark's own global ``orderBy``, minus the
    final single-reader merge.
    """
    (
        df.repartitionByRange(n_shards, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
