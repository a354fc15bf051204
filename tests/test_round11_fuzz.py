"""Round-11 fuzz/degenerate pins (ADVICE items + wedge-fix regressions)."""

from __future__ import annotations

import duckdb
import pytest

from etl_pipeline_with_alpha_vantage_spark.operators.dq import (
    _TCLOSE_ORACLE,
    privacy_t_closeness,
)


def test_tclose_one_band_degenerate_nulls_in_both_engines(spark, tmp_path):
    """m_bands = 1 (every balance in one band): the EMD normalizer
    n_g·N·(m_bands−1) is 0 and 0/0 = NaN. Spark's CAST(NaN AS BIGINT)
    yields 0 while DuckDB's raises — so both engines must guard the
    pole to NULL (the _WELCH_F_EXPR pattern), keeping the oracle
    runnable and the engines agreed."""
    rows = [
        (0, "AUTOMOBILE", 123.45),
        (0, "BUILDING", 456.78),
        (1, "AUTOMOBILE", 999.99),
    ]  # all acctbal < 1000 -> single band 0
    cust = spark.createDataFrame(
        rows, "c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    sf_dir = str(tmp_path)
    cust.coalesce(1).write.parquet(f"{sf_dir}/customer.parquet")
    got = privacy_t_closeness(spark, sf_dir).collect()
    assert len(got) == 3
    for r in got:
        assert r["emd_micro"] is None and r["t_close"] is None, r

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE customer (c_nationkey BIGINT, c_mktsegment VARCHAR,"
        " c_acctbal DOUBLE)"
    )
    con.executemany("INSERT INTO customer VALUES (?, ?, ?)", rows)
    for o in con.sql(_TCLOSE_ORACLE).fetchall():
        assert o[-2] is None and o[-1] is None, o


def test_welch_a_pin_domain_bound_holds_on_fixture(sf_dir):
    """ADVICE r10: _WELCH_A_PIN overflows int64 once the max-weight
    group's |mean − weighted mean| exceeds √(2⁶³/1e6) ≈ 3.0e6 cents
    (~$30k). Replay the weight table on the fixture and assert every
    group — in particular the pinned max-weight one — sits far inside
    that pole, so the exact-bigint pin is safe on this corpus."""
    import os

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events.parquet')}'"
    )
    rows = con.sql(
        """
        WITH g AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS s,
                   SUM(CAST(round(value * 100) AS BIGINT)
                       * CAST(round(value * 100) AS BIGINT)) AS q
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT *,
                   CASE WHEN n <= 1 OR q - CAST(round(CAST(s AS DOUBLE)
                        / n * s) AS BIGINT) <= 0 THEN NULL
                        ELSE CAST(n AS DOUBLE) * (n - 1)
                             / (q - CAST(round(CAST(s AS DOUBLE) / n * s)
                                AS BIGINT)) END AS w_raw
            FROM g
        )
        SELECT event_type, CAST(s AS DOUBLE) / n AS mean_cents,
               w_raw / MAX(w_raw) OVER () AS w_rel,
               SUM(w_raw * s / n) OVER () / SUM(w_raw) OVER ()
                   AS wmean_cents
        FROM w
        """
    ).fetchall()
    assert rows
    for et, mean_c, w_rel, wmean_c in rows:
        dm = abs(mean_c - wmean_c)
        assert dm < 3.0e6, (et, dm)  # the documented A_pin pole
        # and the binding case — the max-weight group — with margin:
        if w_rel is not None and w_rel > 0.999:
            assert dm < 3.0e5, (et, dm)


def test_brier_int64_headroom_holds_on_fixture(sf_dir):
    """ADVICE r10: eval_model_brier sums per-doc squared error (≤1e12
    each) as Spark int64 while DuckDB promotes to HUGEINT — Spark wraps
    silently past ~9.2e6 docs per source. Tripwire: assert the fixture
    stays an order of magnitude inside the documented headroom."""
    import os

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    for src, n in con.sql(
        "SELECT source, COUNT(*) FROM documents GROUP BY 1"
    ).fetchall():
        assert n < 9_200_000 / 10, (src, n)
