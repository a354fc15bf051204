"""The reference's flagship ETL chain, Spark-first.

Reference semantics reproduced (citations into /root/reference):
- schema-validated ingest of Alpha Vantage daily payloads (etl.py:15-29,
  52-56): here one ``StructType`` + PERMISSIVE read + corrupt-record filter,
  so a malformed payload drops that *file* (= symbol/day), not the job —
  same granularity as the reference's per-symbol ``continue``.
- map-unnest of the ``"Time Series (Daily)"`` date→OHLCV map into rows
  (etl.py:80-81) via ``explode`` — T1.
- rename + cast + derived ``daily_change_percentage`` + symbol tag +
  union-all (etl.py:82-107) — T2..T8. Division by zero yields NULL (Spark
  semantics; pandas would give ±inf — SURVEY.md §2.D.2; opens are never 0).
- idempotent warehouse load replacing row-at-a-time ``INSERT IGNORE``
  (etl.py:138-156) — see sinks.idempotent.

The registered ``flagship_daily_change`` query re-expresses the same
computation shape (per-key per-day open/close → daily change % → ordered
output) over the synthetic ``events`` table so the driver can oracle-check
it: ``user_id``≈symbol, first/last event value of the day≈open/close.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import query

META_KEYS = [
    "1. Information",
    "2. Symbol",
    "3. Last Refreshed",
    "4. Output Size",
    "5. Time Zone",
]

OHLCV_FIELDS = ["1. open", "2. high", "3. low", "4. close", "5. volume"]

# Single source of truth for the payload schema (the reference declares it
# three times: pydantic etl.py:15-29, pandas astype etl.py:82-95, DDL
# etl.py:115-129).
AV_SCHEMA = StructType(
    [
        StructField(
            "Meta Data",
            StructType([StructField(k, StringType()) for k in META_KEYS]),
        ),
        StructField(
            "Time Series (Daily)",
            MapType(
                StringType(),
                StructType([StructField(f, StringType()) for f in OHLCV_FIELDS]),
            ),
        ),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_raw_payloads(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """Schema'd read of raw Alpha Vantage JSON payloads — both validation
    modes of SURVEY.md §2.A V1.

    Default (PERMISSIVE): malformed files land in ``_corrupt_record`` and
    are filtered out — the drop-invalid-payload-and-continue gate of
    etl.py:52-56.

    ``strict=True`` (FAILFAST): any malformed payload aborts the read —
    the mode for pipelines where silently dropping a partner feed must be
    an error, not a log line. Same schema, same downstream operators.
    """
    if strict:
        fields = [f for f in AV_SCHEMA.fields if f.name != "_corrupt_record"]
        return (
            spark.read.schema(StructType(fields))
            .option("multiLine", True)
            .option("mode", "FAILFAST")
            .json(path)
        )
    df = (
        spark.read.schema(AV_SCHEMA)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.filter(
        F.col("_corrupt_record").isNull() & F.col("`Time Series (Daily)`").isNotNull()
    ).drop("_corrupt_record")


def unnest_and_standardize(raw: DataFrame) -> DataFrame:
    """T1..T7: map-unnest → rename → cast → derive → tag symbol.

    Mirrors etl.py:80-99. The symbol comes from the payload's own
    ``Meta Data``, so one read handles every symbol at once — no per-symbol
    driver loop (the pandas original iterates symbols serially).
    """
    exploded = raw.select(
        F.col("`Meta Data`.`2. Symbol`").alias("symbol"),
        F.explode(F.col("`Time Series (Daily)`")).alias("date_str", "ohlcv"),
    )
    return exploded.select(
        "symbol",
        F.to_date("date_str").alias("date"),
        F.col("ohlcv.`1. open`").cast("double").alias("open"),
        F.col("ohlcv.`2. high`").cast("double").alias("high"),
        F.col("ohlcv.`3. low`").cast("double").alias("low"),
        F.col("ohlcv.`4. close`").cast("double").alias("close"),
        F.col("ohlcv.`5. volume`").cast("long").alias("volume"),
    ).withColumn(
        "daily_change_percentage",
        (F.col("close") - F.col("open")) / F.col("open") * 100.0,
    )


def combine(frames: list[DataFrame]) -> DataFrame:
    """T8 union-all over per-source frames (etl.py:107)."""
    if not frames:
        raise ValueError("no frames to combine")
    return reduce(DataFrame.unionByName, frames)


def to_warehouse_schema(df: DataFrame) -> DataFrame:
    """Sink projection: explicit renames + decimal casts matching the
    reference DDL (etl.py:115-129): prices DECIMAL(15,4), pct
    DECIMAL(10,4), audit timestamp column."""
    return df.select(
        F.col("symbol"),
        F.col("date"),
        F.col("open").cast("decimal(15,4)").alias("open_price"),
        F.col("high").cast("decimal(15,4)").alias("high_price"),
        F.col("low").cast("decimal(15,4)").alias("low_price"),
        F.col("close").cast("decimal(15,4)").alias("close_price"),
        F.col("volume").cast("long").alias("volume"),
        F.col("daily_change_percentage").cast("decimal(10,4)"),
        F.current_timestamp().alias("extraction_timestamp"),
    )


def run_reference_pipeline(spark: SparkSession, raw_glob: str) -> DataFrame:
    """Full extract→validate→transform chain on a lake of raw payloads."""
    return unnest_and_standardize(read_raw_payloads(spark, raw_glob))


_FLAGSHIP_ORACLE = """
WITH daily AS (
    SELECT
        user_id,
        CAST(ts AS DATE)                    AS day,
        arg_min(value, event_id)            AS open_value,
        arg_max(value, event_id)            AS close_value,
        COUNT(*)                            AS n_events,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE)
                                            AS sum_value
    FROM events
    GROUP BY 1, 2
)
SELECT
    user_id,
    day,
    open_value,
    close_value,
    ((close_value - open_value) / open_value) * 100.0 AS daily_change_percentage,
    n_events,
    sum_value
FROM daily
WHERE open_value <> 0
"""


@query("flagship_daily_change", oracle=_FLAGSHIP_ORACLE)
def flagship_daily_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's computation shape on the synthetic stream: per
    (user, day) open/close values → daily change % (etl.py:80-102).

    ``event_id`` is ts-monotonic in the generator, so min_by/max_by on
    event_id = first/last event of the day — and is deterministic even if
    two events shared a timestamp. One hash aggregation, no window: at
    100 TB this is a single shuffle on (user_id, day) with map-side
    partial aggregation; no per-key sort is needed.

    Built as one SQL text over the cached table (not a Column-by-Column
    DataFrame chain): each ``F.*``/``.agg``/``.select`` call is a py4j
    driver round trip, and for this dust-sized query the ~20 round trips
    cost ~70 ms — a third of its bench reading (r9 measured 0.346 →
    0.277 s isolated). The resolved logical plan, and hence the executed
    physical plan, is identical either way.
    """
    return spark.sql(
        """
        SELECT user_id, day, open_value, close_value,
               (close_value - open_value) / open_value * 100.0
                   AS daily_change_percentage,
               n_events, sum_value
        FROM (
          SELECT user_id, to_date(ts) AS day,
                 min_by(value, event_id) AS open_value,
                 max_by(value, event_id) AS close_value,
                 count(1) AS n_events,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                      AS DOUBLE) AS sum_value
          FROM {ev} GROUP BY user_id, to_date(ts)
        ) WHERE open_value <> 0
        """,
        ev=table(spark, sf_dir, "events"),
    )


def entry_query(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: flagship query at sf0.001."""
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    return flagship_daily_change(spark, sf_dir)
