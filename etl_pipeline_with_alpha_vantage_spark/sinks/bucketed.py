"""Bucketed warehouse layout: co-located joins without a shuffle
(SURVEY.md §4.3: "repartition/bucketing for co-located joins").

Writing both sides of a hot join bucketed (and optionally sorted) on the
join key lets every subsequent join between them skip the exchange
entirely — the scan *is* hash-partitioned. At 100 TB this converts the
biggest recurring shuffle (fact⨝fact on orderkey/custkey) into a local
zip of pre-sorted buckets. The cost is paid once at write time.

Bucket-count sizing: buckets ≈ table_size / target_task_input (128-256 MiB)
rounded to a power of two, and the SAME count on both join sides (Spark
only removes the exchange when partitionings match).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *keys
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def cobucket_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    left_key: str,
    right_key: str,
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Write both join sides bucketed on their join keys with the same
    bucket count and return the re-read (bucket-aware) tables."""
    write_bucketed(left, left_name, [left_key], n_buckets, sort_cols=[left_key])
    write_bucketed(right, right_name, [right_key], n_buckets, sort_cols=[right_key])
    return spark.table(left_name), spark.table(right_name)
