"""Measured head-to-head: the reference's single-thread pandas transform
vs this repo's Spark pipeline on IDENTICAL raw payload lakes.

BASELINE.md records that the reference publishes no benchmarks, so this
harness manufactures the comparison the rubric asks for ("matches or
beats the reference's single-node throughput at the same data scale"):

- generate N synthetic symbols' raw payloads in the reference's exact
  JSON shape (100 trading days of OHLCV strings per symbol, ~21 KB
  pretty-printed files — BASELINE.md "Raw payload size");
- path A replays the reference's transform semantics faithfully in
  pandas (per-file json.load → DataFrame → rename/cast/derive →
  concat → sort; etl.py:73-107 behavior, REIMPLEMENTED from the
  published behavior, not copied);
- path B runs the repo's `run_reference_pipeline` (schema'd PERMISSIVE
  multiline JSON read → explode → cast/derive) on the same glob;
- both outputs are compared row-for-row (sorted, values rounded to 9 dp)
  before any timing is trusted, then each path is timed min-of-3.

At the reference's own scale (3 symbols) pandas wins on fixed overhead
— recorded honestly. The interesting numbers are the scaled lakes
(hundreds/thousands of symbols): the Spark path parallelizes the JSON
parse and the transform across cores while the reference's loop is
single-thread by design (BASELINE.md "Parallelism: none").

Usage:
    python tools/reference_race.py            # N = 3, 300, 3000
    python tools/reference_race.py 3 100      # custom symbol counts
Writes RACE_r9.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DAYS = 100


def gen_lake(out_dir: str, n_symbols: int) -> None:
    """Reference-shaped payloads: deterministic OHLCV strings, 100 days."""
    os.makedirs(out_dir, exist_ok=True)
    for s in range(n_symbols):
        symbol = f"SYM{s:05d}"
        series = {}
        for d in range(N_DAYS):
            day = f"2025-{1 + d // 28:02d}-{1 + d % 28:02d}"
            base = 100.0 + ((s * 31 + d * 7) % 900) / 10.0
            series[day] = {
                "1. open": f"{base:.4f}",
                "2. high": f"{base + 2.5:.4f}",
                "3. low": f"{base - 1.25:.4f}",
                "4. close": f"{base + ((s + d) % 11 - 5) / 10.0:.4f}",
                "5. volume": str(1_000_000 + (s * 17 + d * 131) % 500_000),
            }
        payload = {
            "Meta Data": {
                "1. Information": "Daily Prices (open, high, low, close) and Volumes",
                "2. Symbol": symbol,
                "3. Last Refreshed": "2025-10-05",
                "4. Output Size": "Compact",
                "5. Time Zone": "US/Eastern",
            },
            "Time Series (Daily)": series,
        }
        with open(os.path.join(out_dir, f"{symbol}_2025-10-05.json"), "w") as f:
            json.dump(payload, f, indent=4)


def pandas_pipeline(lake_dir: str):
    """The reference's transform, re-expressed: one DataFrame per file,
    rename/cast, derive daily change %, concat, sort (etl.py:73-107)."""
    import pandas as pd

    frames = []
    for name in sorted(os.listdir(lake_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(lake_dir, name)) as f:
            payload = json.load(f)
        series = payload.get("Time Series (Daily)")
        if not isinstance(series, dict) or not series:
            continue  # the reference's per-symbol validation `continue`
        df = pd.DataFrame.from_dict(series, orient="index")
        df.index.name = "date"
        df = df.rename(
            columns={
                "1. open": "open",
                "2. high": "high",
                "3. low": "low",
                "4. close": "close",
                "5. volume": "volume",
            }
        ).reset_index()
        for c in ("open", "high", "low", "close"):
            df[c] = df[c].astype(float)
        df["volume"] = df["volume"].astype("int64")
        df["daily_change_percentage"] = (
            (df["close"] - df["open"]) / df["open"] * 100.0
        )
        df["symbol"] = payload["Meta Data"]["2. Symbol"]
        frames.append(df)
    out = __import__("pandas").concat(frames, ignore_index=True)
    return out.sort_values(["symbol", "date"]).reset_index(drop=True)


def canonical(df) -> list[tuple]:
    cols = [
        "symbol", "date", "open", "high", "low", "close", "volume",
        "daily_change_percentage",
    ]
    return sorted(
        tuple(
            round(v, 9) if isinstance(v, float) else str(v)
            for v in row
        )
        for row in df[cols].itertuples(index=False, name=None)
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [3, 300, 3000]
    from etl_pipeline_with_alpha_vantage_spark.pipeline.alpha_vantage import (
        run_reference_pipeline,
    )
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark

    spark = get_spark(app_name="reference-race")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        lake = f"/tmp/race_lake_{n}"
        if not os.path.isdir(lake) or len(os.listdir(lake)) != n:
            gen_lake(lake, n)
        glob = os.path.join(lake, "*.json")

        # equivalence gate first: timings of divergent pipelines are noise
        pd_out = pandas_pipeline(lake)
        sp_df = run_reference_pipeline(spark, glob)
        sp_out = sp_df.toPandas()
        sp_out["date"] = sp_out["date"].astype(str)
        assert canonical(pd_out) == canonical(sp_out), f"outputs diverge at N={n}"

        t_pandas = min(
            _timed(lambda: pandas_pipeline(lake)) for _ in range(3)
        )
        # Spark timing includes the full plan build + execution, like the
        # pandas side includes its full loop; count() forces the pipeline
        # without toPandas's arrow transfer (the reference loads to MySQL,
        # not to the driver, so neither side should pay a result transfer).
        t_spark = min(
            _timed(
                lambda: run_reference_pipeline(spark, glob)
                .write.format("noop").mode("overwrite").save()
            )
            for _ in range(3)
        )
        results[str(n)] = {
            "rows": len(pd_out),
            "pandas_sec": round(t_pandas, 3),
            "spark_sec": round(t_spark, 3),
            "speedup_spark_over_pandas": round(t_pandas / t_spark, 2),
        }
        print(n, results[str(n)])
    out = {
        "metric": "reference_transform_race",
        "shape": "N symbols x 100 days, reference-exact payload JSON",
        "pandas": "reference semantics reimplemented (etl.py:73-107)",
        "spark": "run_reference_pipeline (PERMISSIVE multiline JSON read)",
        "equivalence": "row-identical at 9dp before timing, every N",
        "results": results,
    }
    with open(os.path.join(REPO, "RACE_r9.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote RACE_r9.json")
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
