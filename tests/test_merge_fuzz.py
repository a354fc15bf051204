"""Randomized (hypothesis) replays for the row-level MERGE and the
streaming CDC apply: tiny random change universes are applied through
the real Spark operators and compared against a plain-Python dict
replay of the contract. Complements the fixed-fixture tests — these
walk the edge cases (duplicate keys across batches, delete-then-upsert,
out-of-order timestamps, empty batches) that hand-written fixtures
miss."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import merge_into
from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
    cdc_apply_batch,
    read_cdc_state,
)

_CHANGE = st.tuples(
    st.integers(min_value=0, max_value=4),     # key
    st.integers(min_value=0, max_value=20),    # ts seconds
    st.booleans(),                             # is_delete
    st.integers(min_value=0, max_value=99),    # value payload
)

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SLOW
@given(changes=st.lists(_CHANGE, min_size=1, max_size=18), cut=st.integers(1, 17))
def test_cdc_apply_random_batches_converge_to_dict_replay(
    spark, changes, cut
):
    """Any change sequence, split into two batches applied in BOTH
    orders, must converge to the per-key latest-change state a dict
    replay produces — the associativity/commutativity contract of the
    tombstone arbitration, fuzzed."""
    rows = [
        (k, ts, i, float(v), "error" if is_del else "purchase")
        for i, (k, ts, is_del, v) in enumerate(changes)
    ]
    # Dict replay: per key, the (ts, event_id)-max change wins.
    best: dict[int, tuple] = {}
    for k, ts, eid, v, op in rows:
        if k not in best or (ts, eid) > (best[k][0], best[k][1]):
            best[k] = (ts, eid, v, op)
    want = {
        (k, eid) for k, (ts, eid, v, op) in best.items() if op != "error"
    }

    cut = min(cut, len(rows))
    schema = (
        "user_id long, ts_sec long, event_id long, value double, "
        "event_type string"
    )

    def df_of(part):
        return spark.createDataFrame(part, schema).select(
            "user_id",
            F.timestamp_seconds("ts_sec").alias("ts"),
            "event_id",
            "value",
            "event_type",
        )

    batches = [rows[:cut], rows[cut:]]
    dirs = []
    try:
        for order in (batches, batches[::-1]):
            d = tempfile.mkdtemp(prefix="cdc_fuzz_")
            dirs.append(d)
            for part in order:
                if part:
                    cdc_apply_batch(spark, d, df_of(part), n_buckets=4)
            got = {
                (r.user_id, r.event_id)
                for r in read_cdc_state(spark, d)
                .select("user_id", "event_id")
                .collect()
            }
            assert got == want, (got, want, rows, cut)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


_MERGE_ROW = st.tuples(
    st.integers(min_value=0, max_value=6),    # key
    st.integers(min_value=0, max_value=99),   # value
)


@_SLOW
@given(
    base=st.lists(_MERGE_ROW, min_size=1, max_size=10, unique_by=lambda r: r[0]),
    ups=st.lists(_MERGE_ROW, min_size=1, max_size=8, unique_by=lambda r: r[0]),
    del_mask=st.lists(st.booleans(), min_size=8, max_size=8),
)
def test_merge_into_random_changes_match_dict_replay(
    spark, base, ups, del_mask
):
    """MERGE with random upserts + deletes over a random base equals
    the dict replay of WHEN MATCHED UPDATE / NOT MATCHED INSERT /
    MATCHED AND del THEN DELETE — including delete-of-absent-key
    no-ops, full-partition deletion, and untouched partitions."""
    target = tempfile.mkdtemp(prefix="merge_fuzz_")
    try:
        spark.createDataFrame(
            [(k, v, f"p{k % 3}") for k, v in base],
            "k long, v long, part string",
        ).write.mode("overwrite").partitionBy("part").parquet(target)

        source = [
            (k, v, f"p{k % 3}", bool(del_mask[i]))
            for i, (k, v) in enumerate(ups)
        ]
        merge_into(
            spark,
            target,
            spark.createDataFrame(
                source, "k long, v long, part string, is_del boolean"
            ),
            key_cols=["k"],
            partition_col="part",
            delete_col="is_del",
        )

        state = {k: v for k, v in base}
        for k, v, _p, is_del in source:
            if is_del:
                state.pop(k, None)
            else:
                state[k] = v
        if not state:
            # A merge that empties the table leaves no parquet files —
            # plain parquet cannot represent a schema'd empty table
            # (same documented limit as the snapshot log's empty
            # commit); assert every partition directory is gone.
            import os

            assert not any(
                f.startswith("part=") for f in os.listdir(target)
            ), os.listdir(target)
            return
        got = {
            (r.k, r.v)
            for r in spark.read.parquet(target).select("k", "v").collect()
        }
        assert got == set(state.items()), (got, state, base, source)
    finally:
        shutil.rmtree(target, ignore_errors=True)
