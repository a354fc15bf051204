"""Live-API smoke test for the Alpha Vantage fetch path (no network in
the sandbox).

`sources/http.py` is replay-tested against the committed raw-zone
fixtures, but the actual HTTPS fetch (`_fetch_one` / `fetch_payloads`
with `fetch_from_api=True`) never executes here. A user with an API key
can close that loop:

    export SPARK_GRAFT_AV_API_KEY=yourkey
    python tools/alpha_vantage_smoke.py [SYMBOL ...]   # default: IBM

What it does:
  1. fetches TIME_SERIES_DAILY for each symbol through the rate-limited
     fetcher (15 s sleep between calls — the reference's etiquette),
     writing each payload into a throwaway raw zone;
  2. validates the payload shape (`is_valid_payload`);
  3. replays the SAME raw zone with `fetch_from_api=False` and runs the
     full Spark pipeline (`run_reference_pipeline`) over it, printing
     the last 5 rows of (symbol, date, close, daily_change_pct);
  4. asserts fetch→replay equivalence: the pipeline output is built
     from the bytes the live fetch wrote, proving the raw zone is a
     byte-faithful replay source.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    api_key = os.environ.get("SPARK_GRAFT_AV_API_KEY")
    if not api_key:
        print(
            "SPARK_GRAFT_AV_API_KEY not set — nothing to do.\n"
            "This smoke test needs a live Alpha Vantage key; see the "
            "module docstring."
        )
        return 0

    import datetime
    import json
    import tempfile

    from etl_pipeline_with_alpha_vantage_spark.pipeline.alpha_vantage import (
        run_reference_pipeline,
    )
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark
    from etl_pipeline_with_alpha_vantage_spark.sources.http import (
        fetch_payloads,
        is_valid_payload,
    )

    symbols = sys.argv[1:] or ["IBM"]
    day = datetime.date.today().isoformat()
    lake = tempfile.mkdtemp(prefix="av_smoke_lake_")
    print(f"fetching {symbols} into {lake} (15 s between calls)...")
    paths = fetch_payloads(
        symbols, lake, day, api_key=api_key, fetch_from_api=True
    )
    assert paths, "live fetch returned no payload files (rate-limited?)"
    for p in paths:
        with open(p) as f:
            payload = json.load(f)
        ok = is_valid_payload(payload)
        n_days = len(payload.get("Time Series (Daily)", {}))
        print(f"  {os.path.basename(p)}: valid={ok} days={n_days}")
        assert ok, f"{p}: invalid payload shape"

    # Cache-first idempotence: a replay pass must return the same files
    # without touching the network.
    replayed = fetch_payloads(symbols, lake, day, fetch_from_api=False)
    assert replayed == paths, "replay did not round-trip the fetched files"

    spark = get_spark(app_name="av-smoke")
    out = run_reference_pipeline(spark, os.path.join(lake, "*.json"))
    rows = out.orderBy("symbol", "date").collect()
    assert rows, "pipeline produced no rows from the live fetch"
    print(f"pipeline rows: {len(rows)}; tail:")
    for r in rows[-5:]:
        print(" ", r.symbol, r.date, r.close, round(r.daily_change_percentage, 4))
    print("OK: live fetch -> raw zone -> replayed Spark pipeline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
