"""Fixture test for interval_overlap_join: known overlaps, exact durations.

The parity suite proves the bucket-blocking decomposition equals the
brute-force theta oracle on real data (162 pairs at sf0.01); this test
pins the *semantics* on a hand-built fixture where every expected pair
and overlap duration is derived by hand — including the boundary cases
(touching intervals don't overlap; the 1440-minute clamp excludes
oversized intervals; non-multiple-of-5 users are filtered).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_with_alpha_vantage_spark.operators.asof import (
    interval_overlap_join,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m, 0)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """A tiny events.parquet with hand-computed overlap structure.

    value is interpreted as MINUTES by interval_overlap_join.
      e1 user5 [10:00, 12:00)  (120 min)
      e2 user5 [11:00, 11:30)  (30 min)   -> overlaps e1 by 30 min
      e3 user5 [13:00, 14:00)  (60 min)   -> disjoint
      e4 user5 [12:00, 12:30)  (30 min)   -> touches e1 end: NOT an overlap
      e5 user5 [09:00, ...)    (2000 min) -> clamped out (> 1440)
      e6 user7 [10:30, 11:30)  (60 min)   -> user 7 % 5 != 0: filtered
      e7 user10 [10:00, 11:00) (60 min)   -> alone for its user: no pair
    """
    d = tmp_path_factory.mktemp("overlap_fixture")
    rows = [
        (1, _ts(10), 5, "a", 120.0),
        (2, _ts(11), 5, "a", 30.0),
        (3, _ts(13), 5, "a", 60.0),
        (4, _ts(12), 5, "a", 30.0),
        (5, _ts(9), 5, "a", 2000.0),
        (6, _ts(10, 30), 7, "a", 60.0),
        (7, _ts(10), 10, "a", 60.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_known_overlap_pairs(spark, fixture_dir):
    got = {
        (r.user_id, r.event_a, r.event_b): r.overlap_us
        for r in interval_overlap_join(spark, fixture_dir).collect()
    }
    # exactly one pair: e1 x e2, overlap 11:00-11:30 = 30 min in micros
    assert got == {(5, 1, 2): 30 * 60 * 1_000_000}


def test_touching_intervals_excluded(spark, fixture_dir):
    rows = interval_overlap_join(spark, fixture_dir).collect()
    pairs = {(r.event_a, r.event_b) for r in rows}
    assert (1, 4) not in pairs  # [10:00,12:00) and [12:00,12:30) touch only


def test_parity_sample_not_vacuous(spark, sf_dir):
    """Regression guard for the round-3 finding: the query must produce
    rows on the real test data, or its oracle pass proves nothing."""
    assert interval_overlap_join(spark, sf_dir).count() > 0
