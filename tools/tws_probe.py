"""Standalone probe: can transformWithStateInPandas run in this env?

The API is part of PySpark 4.x, but executing it needs the
google.protobuf runtime (the state-server protocol is protobuf over a
local socket: `pyspark/sql/streaming/proto/StateMessage_pb2.py` imports
`google.protobuf.descriptor` on first state access). This tool proves
whether a failure is environmental (missing protobuf — outside this
repo) or a repo defect, and runs an end-to-end TWS smoke when it can.

Exit codes: 0 = TWS ran end-to-end; 2 = API present but protobuf
runtime missing (environment defect, repo code is ready); 3 = no TWS
API (pyspark < 4).

Findings in THIS container (recorded 2026-08-14, round 5):
- `import pyspark.sql.streaming.StatefulProcessor` works (API present);
- `import google.protobuf` → ModuleNotFoundError: no protobuf
  distribution in site-packages at all (not a broken install);
- `pip download protobuf` → "No matching distribution found" (no
  package index reachable), so vendoring is impossible offline.
Everything repo-side is in place: `streaming/stateful.py` defines
`EwmaStatefulProcessor` + `running_user_ewma_tws`, and
`tests/test_bucketing_stateful.py::test_tws_ewma_equals_batch` runs the
drained-equality proof wherever `tws_runtime_available()` is true.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from etl_pipeline_with_alpha_vantage_spark.streaming.stateful import (
        _HAS_TWS_API,
        tws_runtime_available,
    )

    if not _HAS_TWS_API:
        print("TWS API missing (pyspark < 4) — nothing to probe")
        return 3
    if not tws_runtime_available():
        try:
            import google.protobuf  # noqa: F401

            detail = "google.protobuf imports but descriptor is broken"
        except ImportError as exc:
            detail = f"google.protobuf not importable: {exc}"
        print(
            "TWS API present but the protobuf runtime is missing — "
            f"environment defect, not a repo defect ({detail}). "
            "The TWS operator (streaming/stateful.py:running_user_ewma_tws) "
            "is ready and its test auto-enables once protobuf exists."
        )
        return 2

    # protobuf exists: run the real thing end-to-end
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )
    from etl_pipeline_with_alpha_vantage_spark.streaming.stateful import (
        running_user_ewma_tws,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tws-probe")
    stream = read_events_stream(spark, sf_dir)
    out = running_user_ewma_tws(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(
            out, "tws_ewma_probe", checkpoint_dir=ckpt, output_mode="update"
        )
        n = spark.table("tws_ewma_probe").count()
    print(f"TWS ran end-to-end: {n} per-user EWMA rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
