"""SparkSession factory.

Defaults are chosen for the 100 TB design point (AQE on, skew-join
handling, partition coalescing, Arrow for the few pandas-UDF paths) while
remaining correct on ``local[*]`` test runs. Shuffle partitions default to
the local core count; on a real cluster set ``spark.sql.shuffle.partitions``
to ~2-3× total executor cores (AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import _py4j_cache

# Cache py4j reflection results (classes/packages/static methods) —
# every F.* call otherwise pays 2 reflection RPCs on top of its 1
# invocation RPC; see _py4j_cache's module docstring for the safety
# argument. Installed at import so every session in this process
# benefits, including foreign-built ones passed into the query API.
_py4j_cache.install()

_DEFAULTS: dict[str, str] = {
    # In local mode the driver JVM IS every executor: 32 task threads,
    # all shuffle/aggregate execution memory, every broadcast build, and
    # all localCheckpoint storage share this one heap. Spark's 1g default
    # starves HashAggregate/ShuffledHashJoin at the 5M-row volume tier
    # (UNABLE_TO_ACQUIRE_MEMORY) and makes near-threshold broadcasts
    # flaky. Applied at JVM launch; ignored (harmlessly) by getOrCreate
    # when a JVM already runs, and irrelevant on a real cluster where
    # spark-submit sizes executors explicitly.
    "spark.driver.memory": "8g",
    # Adaptive execution: runtime re-planning, skew-join splitting, and
    # post-shuffle partition coalescing are the main levers that keep a
    # static plan viable at 100-1000x the tested data volume.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for the pandas-UDF paths (similarity / multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dim tables (region/nation/supplier/part at TPC-H ratios) stay well
    # under this; Catalyst auto-broadcasts without explicit hints.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side split sizing: 128 MiB keeps one task per parquet rowgroup
    # at warehouse file sizes.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Engine-wide error semantics (SURVEY.md §2.D.2): x/0 and invalid
    # casts yield NULL, never an exception — the drop-don't-crash policy
    # of the reference's validation gate, and exactly DuckDB's behavior,
    # so oracle parity holds on edge data too. Spark 4 defaults ANSI on
    # (raise); pin it off. Strict per-field validation stays available
    # explicitly via try_cast/raise_error where a query wants it.
    "spark.sql.ansi.enabled": "false",
    # Catalog tables (bucketed layouts) land outside the repo tree.
    "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
    # The synthetic events table stores timestamp[ns]; Spark has no nanos
    # timestamp type, so read as long and convert in catalog.table()
    # (truncation to micros matches DuckDB's own ns→µs cast).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet scans stay vectorized + predicate-pushdown stays on (defaults,
    # pinned here so a misconfigured environment can't silently regress).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # PySpark's per-call error-context capture (default on) wraps every
    # DataFrame API call in a Python stack walk plus THREE extra py4j
    # round trips (conf.get + PySparkCurrentOrigin.set/clear). Measured
    # on this engine's 213-query build pass (in-process ABAB, same
    # session): 43-44.5 s with it on vs 27-29 s off — ~37% of all
    # DataFrame-construction time for an error-message nicety (the
    # user-code file:line in error contexts). A query engine issuing
    # millions of API calls should not pay it; exceptions still carry
    # the full JVM-side context. Guide §5: the driver does almost no
    # data work — this keeps it from doing busywork either.
    # Interactive users who want PySpark's file:line error decoration
    # back can opt out via SPARK_GRAFT_DEBUG_CONTEXT=1 (r12 ADVICE) —
    # see the env override just below this dict.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Status-store retention: the live UI/status listeners keep per-job,
    # per-stage and per-SQL-execution state for 1000 entries each by
    # default. A bench/ETL session that executes hundreds of queries
    # accumulates tens of MB of driver metadata and constant listener
    # churn (guide §5 driver metadata, §7.1 the store feeds the UI).
    # Bounded retention keeps the driver heap flat; raise it when
    # interactively debugging a specific job.
    "spark.ui.retainedJobs": "200",
    "spark.ui.retainedStages": "200",
    "spark.sql.ui.retainedExecutions": "64",
}

if os.environ.get("SPARK_GRAFT_DEBUG_CONTEXT") == "1":
    _DEFAULTS["spark.python.sql.dataFrameDebugging.enabled"] = "true"


def get_spark(
    app_name: str = "etl-pipeline-alpha-vantage-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — tests and bench run single-JVM,
    but nothing here assumes local mode.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        # local[N]: match shuffle width to cores; AQE coalesces small stages.
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        conf["spark.sql.shuffle.partitions"] = cpus if cpus.isdigit() else "32"
    else:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
