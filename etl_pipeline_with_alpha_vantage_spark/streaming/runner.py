"""True Structured Streaming execution (SURVEY.md X18-X19, O1).

Batch queries in ``windows.py`` define the semantics; this module runs the
same expressions as real streams:

- file source over the events parquet (schema-pinned — streaming reads
  require an explicit schema),
- event-time watermark bounding state,
- streaming dedup on event_id inside the watermark,
- ``Trigger.AvailableNow`` for catch-up runs — the Spark-native version of
  the reference's daily ``schedule`` loop (etl.py:227-235): each
  invocation processes exactly the files not yet seen, tracked by the
  checkpoint, then stops.

Tests assert stream output == the batch twin (`stream_dedup_window`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ts is parquet TIMESTAMP(NANOS) → long under nanosAsLong (see session.py);
# converted to a micros timestamp right after the scan.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events*.parquet"
) -> DataFrame:
    """File-source stream over the events table (one file per micro-batch
    by default; at production scale this is a directory new files land in)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def dedup_hourly_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """X19: watermark → exactly-once dedup on event_id → hourly counts.

    The watermark bounds both the dedup state and the window state: keys
    older than (max event time − watermark) are dropped from state, which
    is what makes this runnable forever on an unbounded stream.
    """
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.col("win.start").alias("window_start"),
            "n_events",
        )
    )


def run_available_now(
    transformed: DataFrame,
    table_name: str,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 120,
    output_mode: str = "complete",
) -> None:
    """Execute a streaming DataFrame to a memory sink with
    Trigger.AvailableNow (process-everything-pending, then stop) —
    the catch-up trigger that replaces the reference's cron loop."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_")
    q = (
        transformed.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint, table_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
