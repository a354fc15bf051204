"""Fixture tests for the round-4 stats/sequence operators: crafted inputs
with known answers, exercising exactly the tie/duplicate branches a
random TPC-H sample may never hit (the round-3 interval_overlap_join
lesson: a parity pass on convenient data proves less than a fixture that
pins the adversarial cases)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
    pareto_frontier,
)


def test_pareto_frontier_ties_and_duplicates(spark):
    # (cost, gain): duplicates at (1.0, 5), a same-cost loser (1.0, 3),
    # an equal-gain-worse-cost loser (3.0, 7), and a low-gain cheap
    # point (0.5, 1) that survives because nothing is both cheaper and
    # at-least-as-good.
    rows = [
        (1, 0.5, 1),
        (2, 1.0, 5),
        (3, 1.0, 5),
        (4, 1.0, 3),
        (5, 2.0, 7),
        (6, 3.0, 7),
        (7, 2.5, 6),
    ]
    df = spark.createDataFrame(rows, "id long, cost double, gain long")
    got = sorted(r.id for r in pareto_frontier(df, "cost", "gain").collect())
    # frontier: (0.5,1), both copies of (1.0,5), (2.0,7)
    assert got == [1, 2, 3, 5]


def test_pareto_frontier_cross_bucket_domination(spark):
    # Points far apart in cost land in different prefix-max segments;
    # domination must still propagate across bucket boundaries.
    rows = [
        (1, 10.0, 100),
        (2, 500.0, 90),    # dominated by id=1 from a distant bucket
        (3, 500.0, 150),   # survives
        (4, 9000.0, 150),  # dominated by id=3 (equal gain, worse cost)
        (5, 9000.0, 151),  # survives
    ]
    df = spark.createDataFrame(rows, "id long, cost double, gain long")
    got = sorted(r.id for r in pareto_frontier(df, "cost", "gain").collect())
    assert got == [1, 3, 5]


def test_dedup_span_coverage_exact(spark, tmp_path):
    """Two docs sharing one verbatim 8-token span, plus a doc with no
    duplicated content — coverage must count the UNION of covered
    positions, not double-count overlapping spans."""
    span = "a b c d e f g h"  # the shared 8-gram
    texts = [
        span + " x y z",                       # doc 1: positions 0-7
        "p q " + span,                          # doc 2: positions 2-9
        "u v w unique tokens only here now",    # doc 3: nothing
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")

    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        dedup_span_ngrams,
    )

    out = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in dedup_span_ngrams(spark, str(tmp_path)).collect()
    }
    assert out[1] == (11, 8)
    assert out[2] == (10, 8)
    assert out[3] == (8, 0)


def test_ewma_recurrence_exact(spark, tmp_path):
    """EWMA floor recurrence replayed by hand on one user."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=i) for i in range(4)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7] * 4, pa.int64()),
            "event_type": pa.array(["view"] * 4, pa.string()),
            "value": pa.array([1.00, 2.00, 10.00, 0.01], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/events.parquet")

    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        ewma_smoothing,
    )

    rows = {
        r.rn: r.ewma for r in ewma_smoothing(spark, str(tmp_path)).collect()
    }
    # cents: 100, 200, 1000, 1 →
    # s1=100; s2=(100+200)//2=150; s3=(150+1000)//2=575; s4=(575+1)//2=288
    assert rows == {1: 1.00, 2: 1.50, 3: 5.75, 4: 2.88}


def test_pareto_frontier_randomized_vs_brute(spark):
    """300 random points on a small grid (heavy cost/gain ties) — the
    segmented sweep must equal the O(n²) dominance definition."""
    import numpy as np

    rng = np.random.RandomState(42)
    cost = rng.randint(0, 40, 300) * 7.5   # collisions across buckets
    gain = rng.randint(0, 25, 300)
    rows = [(i, float(c), int(g)) for i, (c, g) in enumerate(zip(cost, gain))]
    df = spark.createDataFrame(rows, "id long, cost double, gain long")
    got = sorted(r.id for r in pareto_frontier(df, "cost", "gain").collect())

    def dominated(i):
        ci, gi = rows[i][1], rows[i][2]
        return any(
            (c <= ci and g >= gi and (c < ci or g > gi))
            for _, c, g in rows
        )

    want = sorted(i for i in range(len(rows)) if not dominated(i))
    assert got == want


def test_rolling_median_randomized_vs_pandas(spark, tmp_path):
    """Random cents series per user — the collect_list frame median must
    equal pandas' rolling(20, min_periods=1).median() exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n = 400
    base = dt.datetime(2024, 5, 1)
    users = rng.randint(0, 5, n)
    vals = rng.randint(0, 10_000, n) / 100.0
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(seconds=int(i)) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/events.parquet")

    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        window_rolling_median,
    )

    got = {
        r.event_id: r.rolling_median
        for r in window_rolling_median(spark, str(tmp_path)).collect()
    }
    pdf = pd.DataFrame(
        {"event_id": range(n), "user_id": users,
         "cents": (vals * 100).round().astype("int64")}
    )
    want = (
        pdf.groupby("user_id")["cents"]
        .rolling(20, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
        / 100.0
    )
    # after the groupby the series is group-ordered; its index still
    # holds the original row position == event_id, so align through it
    for eid, w in want.items():
        assert got[eid] == w, (eid, got[eid], w)


def test_logistic_gd_matches_numpy_replay(spark, sf_dir):
    """Third-implementation agreement for ml_logistic_gd: replay the
    3-iteration micro-rounded GD recurrence in numpy from the same
    per-(user, day) features and require the SAME final weights to the
    micro-unit — Spark, DuckDB (oracle), and numpy must all land on
    identical integers, which pins both the feature derivation and the
    round-before-sum gradient discipline."""
    import numpy as np

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    registry.load_all()
    ev = table(spark, sf_dir, "events")
    other = F.col("event_type") != "purchase"
    rows = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(other.cast("long")).alias("n_other"),
            F.sum(
                F.when(other, F.round(F.col("value") * 100).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("cents_other"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "y"
            ),
        )
        .collect()
    )
    y = np.array([r.y for r in rows], dtype=np.float64)
    x1 = np.array([r.n_other for r in rows], dtype=np.float64) / 10.0
    x2 = np.array([r.cents_other for r in rows], dtype=np.float64) / 1e4
    n = len(rows)
    b = w1 = w2 = 0.0
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(b + w1 * x1 + w2 * x2)))
        resid = p - y
        gb = int(np.rint(resid * 1e6).sum())
        g1 = int(np.rint(resid * x1 * 1e6).sum())
        g2 = int(np.rint(resid * x2 * 1e6).sum())
        b -= round(gb / n) / 1e6
        w1 -= round(g1 / n) / 1e6
        w2 -= round(g2 / n) / 1e6
    got = registry.QUERIES["ml_logistic_gd"](spark, sf_dir).collect()[0]
    assert got.n_rows == n
    assert got.b_micro == round(b * 1e6)
    assert got.w1_micro == round(w1 * 1e6)
    assert got.w2_micro == round(w2 * 1e6)
