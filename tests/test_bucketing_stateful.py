"""Bucketed co-located join (no shuffle) + custom stateful streaming."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_pipeline_with_alpha_vantage_spark.catalog import table
from etl_pipeline_with_alpha_vantage_spark.sinks.bucketed import (
    cobucket_for_join,
)
from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
    read_events_stream,
    run_available_now,
)
from etl_pipeline_with_alpha_vantage_spark.streaming.stateful import (
    running_user_totals,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key with equal bucket counts →
    the join plan contains no hash-partitioning exchange: the scan itself
    satisfies the distribution requirement."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cb, ob = cobucket_for_join(
        spark, c, o, "cust_bkt", "ord_bkt", "c_custkey", "o_custkey", n_buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cb.join(ob, cb.c_custkey == ob.o_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        # result parity with the unbucketed join
        bucketed = {(r.c_mktsegment, r.n) for r in joined.collect()}
        plain = {
            (r.c_mktsegment, r.n)
            for r in c.join(o, c.c_custkey == o.o_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert bucketed == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cust_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_stateful_running_totals_equals_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState totals after draining the stream == batch
    groupBy totals (exact cents state)."""
    stream = read_events_stream(spark, sf_dir)
    out = running_user_totals(stream)
    run_available_now(
        out, "user_totals", checkpoint_dir=str(tmp_path), output_mode="update"
    )
    streamed = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.table("user_totals").collect()
    }
    batch = {
        (r.user_id, r.n_events, r.total_value)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    # update-mode memory sink keeps every emitted row; the final totals
    # per user must match the batch result (single availableNow batch →
    # one emission per user)
    assert streamed == batch


def test_stateful_ewma_equals_batch(spark, sf_dir, tmp_path):
    """Streaming EWMA state after draining the stream equals the batch
    ewma_smoothing operator's final per-user row, bit-for-bit — the two
    implementations share one integer recurrence."""
    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        ewma_smoothing,
    )
    from etl_pipeline_with_alpha_vantage_spark.streaming.stateful import (
        running_user_ewma,
    )

    stream = read_events_stream(spark, sf_dir)
    out = running_user_ewma(stream)
    run_available_now(
        out, "user_ewma", checkpoint_dir=str(tmp_path), output_mode="update"
    )
    streamed = {
        (r.user_id, r.n_events, r.ewma)
        for r in spark.table("user_ewma").collect()
    }

    batch_rows = ewma_smoothing(spark, sf_dir).collect()
    final: dict[int, tuple[int, float]] = {}
    for r in batch_rows:
        if r.user_id not in final or r.rn > final[r.user_id][0]:
            final[r.user_id] = (r.rn, r.ewma)
    batch = {(u, rn, ew) for u, (rn, ew) in final.items()}
    assert streamed == batch


def test_tws_ewma_equals_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas port of the EWMA processor: drained
    stream equals the batch operator's final per-user row, exactly as
    the applyInPandasWithState twin does. Skips (with the reason
    printed) where the protobuf runtime is absent — the API imports but
    its state-server protocol cannot run; tools/tws_probe.py documents
    that environment defect."""
    import pytest

    from etl_pipeline_with_alpha_vantage_spark.streaming.stateful import (
        running_user_ewma_tws,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        pytest.skip(
            "transformWithStateInPandas needs the google.protobuf runtime, "
            "absent in this environment (see tools/tws_probe.py)"
        )

    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        ewma_smoothing,
    )

    stream = read_events_stream(spark, sf_dir)
    out = running_user_ewma_tws(stream)
    run_available_now(
        out, "user_ewma_tws", checkpoint_dir=str(tmp_path), output_mode="update"
    )
    streamed = {
        (r.user_id, r.n_events, r.ewma)
        for r in spark.table("user_ewma_tws").collect()
    }

    batch_rows = ewma_smoothing(spark, sf_dir).collect()
    final: dict[int, tuple[int, float]] = {}
    for r in batch_rows:
        if r.user_id not in final or r.rn > final[r.user_id][0]:
            final[r.user_id] = (r.rn, r.ewma)
    batch = {(u, rn, ew) for u, (rn, ew) in final.items()}
    assert streamed == batch
