"""Reference-parity tests for the flagship ETL chain (SURVEY.md §5.2).

Golden inputs are the reference's own committed API snapshots
(/root/reference/raw_data, read-only) replayed through the Spark
pipeline; expected values are computed from the published payload shape
(AAPL 2025-10-03: open 254.665, close 258.02 → +1.3174%).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.pipeline.alpha_vantage import (
    read_raw_payloads,
    run_reference_pipeline,
    to_warehouse_schema,
    unnest_and_standardize,
)
from etl_pipeline_with_alpha_vantage_spark.sinks.idempotent import (
    dedup_in_batch,
    upsert_ignore,
)
from etl_pipeline_with_alpha_vantage_spark.sources.http import fetch_payloads

RAW_DIR = "/root/reference/raw_data"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(RAW_DIR), reason="reference raw_data not available"
)


@needs_fixtures
def test_golden_three_symbols(spark):
    """3 symbols × 100 trading days → 300 rows with spot-checked values."""
    df = run_reference_pipeline(spark, os.path.join(RAW_DIR, "*_2025-10-05.json"))
    rows = df.collect()
    assert len(rows) == 300
    assert {r.symbol for r in rows} == {"AAPL", "GOOG", "MSFT"}

    aapl = df.filter(
        (F.col("symbol") == "AAPL") & (F.col("date") == "2025-10-03")
    ).collect()
    assert len(aapl) == 1
    r = aapl[0]
    assert r.open == pytest.approx(254.665)
    assert r.close == pytest.approx(258.02)
    assert r.daily_change_percentage == pytest.approx(1.317417, abs=1e-5)
    assert r.volume > 0


@needs_fixtures
def test_chronological_order_matches_reference(spark):
    """The reference sorts by ISO date string (etl.py:97); DateType order
    must agree (lexicographic ISO == chronological — SURVEY.md §2.D.1)."""
    df = run_reference_pipeline(spark, os.path.join(RAW_DIR, "AAPL_2025-10-05.json"))
    dates = [r.date.isoformat() for r in df.orderBy("date").collect()]
    assert dates == sorted(dates)
    assert len(dates) == 100


def test_malformed_payload_dropped_not_fatal(spark, tmp_path):
    """One corrupt file drops that symbol only (etl.py:52-56 semantics)."""
    good = {
        "Meta Data": {
            "1. Information": "Daily Prices",
            "2. Symbol": "GOOD",
            "3. Last Refreshed": "2025-10-05",
            "4. Output Size": "Compact",
            "5. Time Zone": "US/Eastern",
        },
        "Time Series (Daily)": {
            "2025-10-03": {
                "1. open": "100.0",
                "2. high": "110.0",
                "3. low": "95.0",
                "4. close": "105.0",
                "5. volume": "12345",
            }
        },
    }
    (tmp_path / "GOOD_2025-10-05.json").write_text(json.dumps(good))
    (tmp_path / "BAD_2025-10-05.json").write_text("{this is not json]")
    # wrong-shape-but-valid JSON: no time series key → also dropped
    (tmp_path / "EMPTY_2025-10-05.json").write_text(
        json.dumps({"Note": "rate limit exceeded"})
    )

    df = run_reference_pipeline(spark, str(tmp_path / "*.json"))
    rows = df.collect()
    assert [r.symbol for r in rows] == ["GOOD"]
    assert rows[0].daily_change_percentage == pytest.approx(5.0)


@needs_fixtures
def test_upsert_ignore_idempotent(spark, tmp_path):
    """Re-running the load is a no-op (etl.py:127,142; SURVEY.md §2.D.4)."""
    wh = str(tmp_path / "warehouse")
    df = to_warehouse_schema(
        run_reference_pipeline(spark, os.path.join(RAW_DIR, "*_2025-10-05.json"))
    )
    n1 = upsert_ignore(spark, df, wh, keys=["symbol", "date"])
    n2 = upsert_ignore(spark, df, wh, keys=["symbol", "date"])
    assert n1 == 300
    assert n2 == 0
    assert spark.read.parquet(wh).count() == 300

    # byte-identical next-day snapshot (AAPL_2025-10-06 == AAPL_2025-10-05)
    df2 = to_warehouse_schema(
        run_reference_pipeline(spark, os.path.join(RAW_DIR, "AAPL_2025-10-06.json"))
    )
    n3 = upsert_ignore(spark, df2, wh, keys=["symbol", "date"])
    assert n3 == 0


def test_dedup_in_batch_first_writer_wins(spark):
    df = spark.createDataFrame(
        [("A", "2025-01-01", 1, 10.0), ("A", "2025-01-01", 2, 20.0),
         ("B", "2025-01-01", 3, 30.0)],
        "symbol string, date string, seq int, price double",
    )
    out = dedup_in_batch(df, keys=["symbol", "date"], order_col="seq").collect()
    assert sorted((r.symbol, r.price) for r in out) == [("A", 10.0), ("B", 30.0)]


@needs_fixtures
def test_replay_source_skips_missing(tmp_path):
    """Replay mode (fetch_from_api=False) returns only cached files —
    the etl.py:64-70 local-only branch — and never touches the network."""
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    shutil.copy(
        os.path.join(RAW_DIR, "AAPL_2025-10-05.json"),
        os.path.join(lake, "AAPL_2025-10-05.json"),
    )
    paths = fetch_payloads(
        ["AAPL", "MISSING"], lake, "2025-10-05", fetch_from_api=False
    )
    assert [os.path.basename(p) for p in paths] == ["AAPL_2025-10-05.json"]


@needs_fixtures
def test_warehouse_schema_decimal_parity(spark):
    """Sink casts to DECIMAL(15,4)/(10,4) per the reference DDL
    (etl.py:119-126) with renamed price columns."""
    df = to_warehouse_schema(
        run_reference_pipeline(spark, os.path.join(RAW_DIR, "AAPL_2025-10-05.json"))
    )
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields["open_price"] == "decimal(15,4)"
    assert fields["daily_change_percentage"] == "decimal(10,4)"
    assert fields["extraction_timestamp"] == "timestamp"
    assert "open" not in fields  # renamed at the sink (SURVEY.md §2.D.6)


@needs_fixtures
def test_validation_gate_permissive_read(spark):
    """PERMISSIVE read keeps valid files when a corrupt one is present in
    the same glob (file-granularity validation)."""
    raw = read_raw_payloads(spark, os.path.join(RAW_DIR, "*_2025-10-05.json"))
    assert raw.count() == 3
    std = unnest_and_standardize(raw)
    assert std.filter(F.col("open").isNull()).count() == 0


def test_zero_division_yields_null_policy(spark):
    """SURVEY §2.D.2: the engine's declared semantics are NULL on x/0 and
    NULL on invalid cast (drop-don't-crash), matching the DuckDB oracle —
    never pandas inf, never an ANSI exception."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            (F.lit(1.0) / F.lit(0.0)).alias("fdiv"),
            (F.lit(5) / F.lit(0)).alias("idiv"),
            F.lit("not_a_number").cast("long").alias("badcast"),
        )
        .collect()[0]
    )
    assert row.fdiv is None and row.idiv is None and row.badcast is None


def test_validation_gate_failfast_mode(spark, tmp_path):
    """V1 strict variant: FAILFAST aborts the read on any malformed
    payload (vs PERMISSIVE's drop-and-continue), and reads identically to
    PERMISSIVE when every payload is clean — both declared modes of the
    validation gate, documented side by side."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from etl_pipeline_with_alpha_vantage_spark.pipeline.alpha_vantage import (
        read_raw_payloads,
        unnest_and_standardize,
    )

    good = {
        "Meta Data": {
            "1. Information": "Daily Prices",
            "2. Symbol": "GOOD",
            "3. Last Refreshed": "2025-10-05",
            "4. Output Size": "Compact",
            "5. Time Zone": "US/Eastern",
        },
        "Time Series (Daily)": {
            "2025-10-03": {
                "1. open": "100.0",
                "2. high": "110.0",
                "3. low": "95.0",
                "4. close": "105.0",
                "5. volume": "12345",
            }
        },
    }
    clean = tmp_path / "clean"
    clean.mkdir()
    (clean / "GOOD_2025-10-05.json").write_text(json.dumps(good))

    strict = unnest_and_standardize(
        read_raw_payloads(spark, str(clean / "*.json"), strict=True)
    ).collect()
    assert [r.symbol for r in strict] == ["GOOD"]

    dirty = tmp_path / "dirty"
    dirty.mkdir()
    (dirty / "GOOD_2025-10-05.json").write_text(json.dumps(good))
    (dirty / "BAD_2025-10-05.json").write_text("{this is not json]")
    # Deliberately NOT a bare Exception catch-all: the abort must come
    # from the FAILFAST parse path, not some unrelated setup error.
    with pytest.raises((Py4JJavaError, PySparkException)) as excinfo:
        read_raw_payloads(spark, str(dirty / "*.json"), strict=True).collect()
    assert "FAILFAST" in str(excinfo.value) or "Malformed" in str(excinfo.value)
