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


# --------------------------------------------------------------------------
# Streaming EWMA — the stateful-stream twin of operators.timeseries.
# ewma_smoothing (alpha = 1/2, integer-cents floor recurrence)
# --------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("ewma_cents", LongType())]
)


def _update_user_ewma(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, acc = state.get if state.exists else (0, None)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # Replay in event-time order within the micro-batch; across batches
    # the recurrence is exact as long as a key's events arrive
    # batch-monotonically (true for availableNow catch-up and for any
    # source partitioned by key), matching the batch twin bit-for-bit.
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    cents = (rows["value"] * 100).round().astype("int64")
    for c in cents:
        c = int(c)
        acc = c if acc is None else (acc + c) // 2
        n += 1
    state.update((n, acc if acc is not None else 0))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "ewma": [(acc if acc is not None else 0) / 100.0],
        }
    )


def running_user_ewma(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user EWMA (alpha=1/2) with explicit integer state.

    Identical recurrence to the batch ewma_smoothing operator —
    s_t = floor((s_{t-1} + cents_t) / 2) — so after draining a stream the
    final per-user value equals the batch operator's last row exactly
    (asserted in tests). State per key is two bigints: bounded by the
    user population regardless of stream length.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas port (Spark 4 arbitrary-state API v2)
# --------------------------------------------------------------------------

try:  # API import needs only pyspark; RUNNING it needs google.protobuf
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS_API = True
except ImportError:  # pragma: no cover — pyspark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    _HAS_TWS_API = False


def tws_runtime_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually RUN here.

    The API ships with PySpark 4.x, but its state-server wire protocol
    is protobuf-generated (`pyspark/sql/streaming/proto/
    StateMessage_pb2.py` imports `google.protobuf.descriptor` at first
    state access), so a container without the protobuf runtime can
    IMPORT everything yet fails inside the first micro-batch. Gate
    tests and callers on this probe; `tools/tws_probe.py` prints the
    same diagnosis standalone.
    """
    if not _HAS_TWS_API:
        return False
    try:
        import importlib

        importlib.import_module("google.protobuf.descriptor")
        return True
    except ImportError:
        return False


class EwmaStatefulProcessor(StatefulProcessor):
    """TWS twin of ``running_user_ewma``: per-user EWMA (alpha=1/2) on
    the SAME integer floor recurrence — s_t = (s_{t-1} + cents_t) // 2 —
    so a drained stream equals the batch ewma_smoothing operator's
    final per-user row exactly (same drained-equality test, gated on
    ``tws_runtime_available``).

    vs the applyInPandasWithState form: state lives in named, typed,
    per-key variables on the NEW state store client (value/list/map
    state, TTL, timers) instead of one opaque tuple; the handle is
    created once per partition in ``init`` and the store round-trips
    Arrow batches, so per-key cost stays O(rows in batch) with two
    bigints of state per user — identical scale envelope.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "ewma", "n BIGINT, ewma_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        existing = self._state.get()
        if existing is None:
            n, acc = 0, None
        else:
            n, acc = int(existing[0]), int(existing[1])
            if n == 0:
                acc = None
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        cents = (batch["value"] * 100).round().astype("int64")
        for c in cents:
            c = int(c)
            acc = c if acc is None else (acc + c) // 2
            n += 1
        self._state.update((n, acc if acc is not None else 0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma": [(acc if acc is not None else 0) / 100.0],
            }
        )

    def close(self) -> None:
        pass


def running_user_ewma_tws(events_stream: DataFrame) -> DataFrame:
    """``running_user_ewma`` on the transformWithStateInPandas API.

    Requires the protobuf runtime at execution time — call
    ``tws_runtime_available()`` first; the applyInPandasWithState form
    remains the portable fallback with identical semantics.
    """
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EwmaStatefulProcessor(),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
