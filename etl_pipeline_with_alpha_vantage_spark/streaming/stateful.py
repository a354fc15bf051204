"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md X19 / driver mandate: "applyInPandasWithState for custom
stateful operators").

Built-in windowed aggregation covers time-bucketed state; this is the
escape hatch for state machines Spark has no operator for (running
per-key accumulators, custom session logic, model-state updates). The
example operator keeps an exact running (count, cents-sum) per user and
emits the updated totals each micro-batch.

State is a tuple of bigints (exact, order-insensitive), so the streamed
result equals the batch groupBy — the test asserts it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("sum_c", LongType())]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, sum_c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact cents accumulation — no float summation in state
        sum_c += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, sum_c))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [sum_c / 100.0],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    State shape is two bigints per user — bounded by the user population,
    not the event volume; per micro-batch each key's rows arrive as Arrow
    batches in one Python worker.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
