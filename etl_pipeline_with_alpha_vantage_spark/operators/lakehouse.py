"""Lakehouse storage behaviors: schema evolution across write epochs.

The reference's warehouse loads assume a frozen schema (`etl.py`'s fixed
DDL); real lakes accrete columns over time. Spark's parquet reader
handles this natively with `mergeSchema` — old files project the unioned
schema with nulls — and this operator proves the semantics end-to-end
by writing two epochs with DIFFERENT columns and reading them back as
one relation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

_E1_ROWS = 1000  # epoch 1: (id, qty)
_E2_ROWS = 1000  # epoch 2: (id, price) — qty dropped, price added

_EVOLVE_ORACLE = f"""
WITH e1 AS (
    SELECT i AS id, CAST(i % 7 AS BIGINT) AS qty,
           CAST(NULL AS DOUBLE) AS price
    FROM generate_series(0, {_E1_ROWS - 1}) t(i)
),
e2 AS (
    SELECT i AS id, CAST(NULL AS BIGINT) AS qty,
           CAST((i * 31) % 500 AS DOUBLE) / 100.0 AS price
    FROM generate_series({_E1_ROWS}, {_E1_ROWS + _E2_ROWS - 1}) t(i)
),
merged AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
SELECT CAST(COUNT(*) AS BIGINT)              AS n_rows,
       CAST(COUNT(*) - COUNT(qty) AS BIGINT) AS null_qty,
       CAST(COUNT(*) - COUNT(price) AS BIGINT) AS null_price,
       CAST(SUM(qty) AS BIGINT)              AS qty_total,
       CAST(SUM(CAST(round(price * 100) AS BIGINT)) / 100.0 AS DOUBLE)
           AS price_total
FROM merged
"""


# The two-epoch fixture is deterministic, so write it ONCE per Spark
# session (keyed by applicationId) instead of a fresh mkdtemp + rewrite
# per invocation — repeated bench/parity sweeps were leaking temp dirs
# and redundant write jobs. atexit reclaims the directories.
_EVOLVE_CACHE: dict[str, str] = {}


def _cleanup_evolve_fixtures() -> None:
    for path in _EVOLVE_CACHE.values():
        shutil.rmtree(path, ignore_errors=True)
    _EVOLVE_CACHE.clear()


atexit.register(_cleanup_evolve_fixtures)


def _evolve_fixture(spark: SparkSession) -> str:
    app_id = spark.sparkContext.applicationId
    base = _EVOLVE_CACHE.get(app_id)
    if base is not None and os.path.isdir(base):
        return base
    base = tempfile.mkdtemp(prefix="spark_graft_evolve_")
    e1 = spark.range(0, _E1_ROWS).select(
        F.col("id"), (F.col("id") % 7).alias("qty")
    )
    e1.write.mode("overwrite").parquet(os.path.join(base, "epoch=1"))
    e2 = spark.range(_E1_ROWS, _E1_ROWS + _E2_ROWS).select(
        F.col("id"),
        (((F.col("id") * 31) % 500).cast("double") / 100.0).alias("price"),
    )
    e2.write.mode("overwrite").parquet(os.path.join(base, "epoch=2"))
    _EVOLVE_CACHE[app_id] = base
    return base


@query("schema_evolution_merge", oracle=_EVOLVE_ORACLE)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet write epochs, read back as ONE
    relation via `mergeSchema`: epoch 1 carries (id, qty), epoch 2
    drops qty and adds price; the merged scan projects the unioned
    schema and old files surface nulls for columns they predate. The
    aggregate audits exactly that contract — row counts, null counts
    per evolved column, and exact totals.

    Scale shape: mergeSchema reconciles FOOTERS (schema metadata), not
    data — at 100 TB the read cost is unchanged and column pruning
    still applies per-file; the write here is a dust-sized fixture into
    a session temp dir to make the behavior testable hermetically.
    sf_dir is unused: the epochs are deterministic integer derivations
    so the generate_series oracle replays them exactly.
    """
    merged = spark.read.option("mergeSchema", "true").parquet(
        _evolve_fixture(spark)
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("qty")).alias("null_qty"),
        (F.count(F.lit(1)) - F.count("price")).alias("null_price"),
        F.sum("qty").alias("qty_total"),
        (F.sum(F.round(F.col("price") * 100).cast("long")) / 100.0)
        .cast("double")
        .alias("price_total"),
    )
