"""Idempotent upsert-ignore sink (SURVEY.md §2.A L1-L3).

Reproduces the reference's ``INSERT IGNORE`` + ``UNIQUE(symbol, date)``
warehouse-load semantics (etl.py:115-156) without a row-at-a-time loop:

1. in-batch dedup on the natural key (first-writer-wins, deterministic),
2. left-anti join against the existing warehouse keys,
3. append only the genuinely-new rows.

Scale shape: the anti-join reads ONLY the key columns of the existing
warehouse (column pruning) and shuffles just keys. With a key-partitioned
warehouse layout (``partition_cols``), re-ingesting one day prunes the
existing-side scan to the touched partitions. Concurrency note: like
INSERT IGNORE under a unique index, last-committer wins; for multi-writer
exactly-once you'd swap step 3 for a transactional MERGE (Delta/Iceberg)
— the surrounding plan is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_in_batch(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Deterministic in-batch dedup: keep the row with the smallest
    ``order_col`` per key (the reference keeps the first INSERT and
    ignores the rest; arrival order isn't reproducible in a distributed
    batch, so an explicit tiebreaker makes first-writer-wins stable)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_ignore(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> int:
    """Append rows whose key is not already present (INSERT IGNORE).

    Returns the number of rows appended. Re-running with the same input
    appends 0 — end-to-end idempotency, matching the reference's re-run
    no-op behavior (etl.py:127,142; SURVEY.md §2.D.4).
    """
    exists = os.path.isdir(path) and any(
        name.endswith(".parquet") or name.startswith("part-")
        for root, _dirs, files in os.walk(path)
        for name in files
    )
    new_rows = df
    if exists:
        existing_keys = spark.read.parquet(path).select(*keys)
        new_rows = df.join(existing_keys, on=list(keys), how="left_anti")
    # Count via a cheap re-read afterwards is racy; count the frame we write.
    new_rows = new_rows.persist()
    n = new_rows.count()
    if n:
        writer = new_rows.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
    new_rows.unpersist()
    return n
