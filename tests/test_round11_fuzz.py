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
    """ADVICE r10: eval_model_brier summed per-doc squared error (≤1e12
    each) as Spark int64 while DuckDB promotes to HUGEINT — wrapping
    silently past ~9.2e6 docs per source. Since r12 the kernel sums in
    DECIMAL(38,0) (exact to 1e38, matching HUGEINT at any corpus —
    pole removed; tests/test_round12.py proves the accumulator past
    the old bound); this tripwire remains as a record of fixture
    scale."""
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


def test_interval_overlap_candidate_volume_observed_on_kernel(spark):
    """interval_overlap_pairs' bucket-block volume, measured ON the
    executed kernel via an Observation between the (user, bucket)
    equi-join and the exact-overlap verify: candidates == Σ over
    (user, bucket) groups of C(c, 2). The fixture makes the pre/post
    gap real: per user and hour, two DISJOINT 10-minute intervals share
    the hour bucket but never overlap (pruned by the verify), plus one
    all-day interval overlapping everything."""
    import datetime as dt

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.operators.asof import (
        interval_overlap_pairs,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(20):
        for h in range(24):
            s1 = base + dt.timedelta(hours=h, minutes=5)
            s2 = base + dt.timedelta(hours=h, minutes=30)
            rows.append((u, u * 100 + 2 * h, s1, s1 + dt.timedelta(minutes=10)))
            rows.append((u, u * 100 + 2 * h + 1, s2, s2 + dt.timedelta(minutes=10)))
        rows.append((u, u * 100 + 90, base, base + dt.timedelta(hours=24)))
    iv = spark.createDataFrame(
        rows, "user_id long, event_id long, s timestamp, e timestamp"
    )
    hour = 3600 * 1_000_000
    bucketed = iv.select(
        "user_id",
        "event_id",
        F.explode(
            F.sequence(
                (F.unix_micros("s") / hour).cast("long"),
                (F.unix_micros("e") / hour).cast("long"),
            )
        ).alias("bucket"),
    )
    expected_cand = (
        bucketed.groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).cast("long"))
        .collect()[0][0]
    )
    obs = Observation()
    got = interval_overlap_pairs(iv, candidate_observation=obs).count()
    assert obs.get["candidates"] == expected_cand, (
        obs.get,
        expected_cand,
    )
    # verify prunes: only the all-day interval truly overlaps the
    # 10-min slots (48 pairs per user); the same-bucket disjoint slot
    # pairs are discarded by the exact predicate.
    assert got == 20 * 48
    assert expected_cand > got  # the observe point is genuinely pre-verify


def test_ppr_sweeps_matches_pure_python_replay(spark):
    """ppr_sweeps' all-integer recurrence replayed in arbitrary-
    precision Python on a random bipartite graph. Ids are chosen so the
    hardcoded seed predicate (even node_id with (id DIV 2) % 7 == 0)
    selects a known non-empty subset, and the final assertion checks
    mass genuinely propagated beyond the seeds."""
    import random

    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _PPR_INIT,
        _PPR_RESTART,
        ppr_sweeps,
    )

    rng = random.Random(1107)
    pairs = {
        (rng.randrange(40) * 2, rng.randrange(40) * 2 + 1)
        for _ in range(160)
    }
    und = [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs]
    outdeg = {}
    for s, _ in und:
        outdeg[s] = outdeg.get(s, 0) + 1
    rows = [(s, d, outdeg[s]) for s, d in und]
    df = spark.createDataFrame(rows, "src long, dst long, outdeg long")

    def is_src(n):
        return n % 2 == 0 and (n // 2) % 7 == 0

    ranks = {n: (_PPR_INIT if is_src(n) else 0) for n in outdeg}
    for _ in range(3):
        inflow = {n: 0 for n in outdeg}
        for s, d in und:
            inflow[d] += ranks[s] // outdeg[s]
        ranks = {
            n: (_PPR_RESTART if is_src(n) else 0)
            + (850 * inflow[n]) // 1000
            for n in outdeg
        }
    got = {r.node_id: r.rank_units for r in ppr_sweeps(df, 3).collect()}
    assert got == ranks
    assert any(is_src(n) for n in outdeg)  # seed set non-empty
    assert any(v > 0 and not is_src(n) for n, v in got.items())


def test_hits_sweeps_matches_pure_python_replay(spark):
    """hits_sweeps' integer max-rescaled recurrence replayed in
    arbitrary-precision Python on a random bipartite graph, plus the
    star pole: a catalog where one part is stocked by every supplier
    must give that part authority exactly 1e6 (the max)."""
    import random

    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _HITS_SCALE,
        hits_sweeps,
    )

    rng = random.Random(2211)
    pairs = {(rng.randrange(30), rng.randrange(40)) for _ in range(150)}
    pairs |= {(s, 999) for s in range(30)}  # the universal part
    df = spark.createDataFrame(sorted(pairs), "supp long, part long")

    h = {s: _HITS_SCALE for s, _ in pairs}
    a = {}
    for _ in range(2):
        a_raw = {}
        for s, p in pairs:
            a_raw[p] = a_raw.get(p, 0) + h[s]
        mx = max(a_raw.values())
        a = {p: (v * _HITS_SCALE) // mx for p, v in a_raw.items()}
        h_raw = {}
        for s, p in pairs:
            h_raw[s] = h_raw.get(s, 0) + a[p]
        mx = max(h_raw.values())
        h = {s: (v * _HITS_SCALE) // mx for s, v in h_raw.items()}

    got_h, got_a = {}, {}
    for r in hits_sweeps(df, 2).collect():
        (got_h if r.node_type == "supplier" else got_a)[
            r.entity_key
        ] = r.score_units
    assert got_h == h
    assert got_a == a
    assert got_a[999] == _HITS_SCALE  # the universal part IS the max
