"""Scheduled catch-up runner — the reference's cron loop, Spark-first.

The reference schedules `job()` daily and appends one line to a run log
(etl.py:219-235: `schedule.every().day.at("09:00").do(job)` around a
sleep loop). The Spark replacement needs no residency between runs:
each tick is an AvailableNow catch-up (process everything pending, then
stop — streaming/runner.py:run_available_now) with the run-log listener
attached for its duration (run_with_log = O1+O2 composed). A second
tick against the same checkpoint finds nothing pending and is a no-op —
idempotence comes from the checkpoint, not from remembering state in
the scheduler process.

Usage:
    python tools/run_daily.py --once            # one catch-up tick now
    python tools/run_daily.py --interval-sec 86400   # resident loop
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tick(spark, sf_dir: str, checkpoint_dir: str, log_path: str) -> None:
    """One scheduled run: stream whatever landed since the last tick
    through the dedup→hourly-rollup pipeline, log start/progress/end."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        dedup_hourly_counts,
        read_events_stream,
        run_with_log,
    )

    stream = dedup_hourly_counts(read_events_stream(spark, sf_dir))
    run_with_log(
        spark, stream, "daily_hourly_counts", log_path, checkpoint_dir
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--checkpoint-dir", default="/tmp/run_daily_ckpt")
    ap.add_argument("--log-path", default="/tmp/run_daily_etl_log.txt")
    ap.add_argument("--interval-sec", type=int, default=86_400)
    ap.add_argument("--once", action="store_true",
                    help="single tick, then exit (cron/systemd-timer mode)")
    args = ap.parse_args()

    from etl_pipeline_with_alpha_vantage_spark.session import get_spark

    spark = get_spark(app_name="run-daily")
    while True:
        tick(spark, args.sf_dir, args.checkpoint_dir, args.log_path)
        if args.once:
            return 0
        time.sleep(args.interval_sec)


if __name__ == "__main__":
    sys.exit(main())
